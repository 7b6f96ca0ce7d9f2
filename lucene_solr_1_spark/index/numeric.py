"""Numeric trie terms — the NumericRangeQuery / NumericUtils analog
(ref: lucene/core/src/java/org/apache/lucene/search/NumericRangeQuery.java
:62-121, util/NumericUtils.java splitLongRange/longToPrefixCoded).

Lucene indexes each numeric value at several precisions: at shift s the
term is the value's top (64-s) bits, so one term at a coarse shift
covers a whole aligned block of values. A range query then decomposes
into O(levels · 2^step) TERM RANGES — the unaligned edges at fine
shifts, the aligned middle at coarse shifts — instead of one term per
value. Here:

* term encoding: ``"%02d|%016x" % (shift, (v XOR 2^63) >> shift)`` —
  the sign-bit flip maps signed longs to order-preserving unsigned, so
  WITHIN a shift level lexicographic term order == numeric order and a
  decomposed sub-range is one ``BETWEEN lo_term AND hi_term`` predicate
  that parquet min/max stats prune (the engine's analog of the
  BlockTree term-dictionary seek).
* index shape: ``(term, docids array<long>)`` parquet sorted by term —
  built with ONE shuffle (explode → groupBy), the same plan family as
  the text index merge, so it holds at 10^12 docs.
* query shape: O(levels) range predicates pushed into the term scan,
  explode + distinct docids → a ConstantScore docid set that composes
  with scored BooleanQueries via ``IndexSearcher.search(...,
  docid_filter=...)`` (FilteredQuery.java:44 composition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

SIGN_BIT = -0x8000000000000000     # 1<<63 as a signed 64-bit literal
_BITS = 64


def split_range(lo: int, hi: int, precision_step: int = 8,
                bits: int = _BITS) -> list[tuple[int, int, int]]:
    """Decompose [lo, hi] (unsigned, after the sign flip) into aligned
    trie sub-ranges: returns [(shift, min_prefix, max_prefix)] where
    every value v in [lo, hi] has exactly one (shift, v >> shift) hit
    (the NumericUtils.splitLongRange recursion, iterative form). The
    result has at most 2·(bits/step) entries."""
    if lo > hi:
        return []
    out: list[tuple[int, int, int]] = []
    shift = 0
    while True:
        diff = 1 << (shift + precision_step)
        mask = ((1 << precision_step) - 1) << shift
        has_lower = (lo & mask) != 0
        has_upper = (hi & mask) != mask
        next_lo = ((lo + diff) if has_lower else lo) & ~mask
        next_hi = ((hi - diff) if has_upper else hi) & ~mask
        lower_wrapped = next_lo < lo
        upper_wrapped = next_hi > hi
        if (shift + precision_step >= bits or next_lo > next_hi
                or lower_wrapped or upper_wrapped):
            out.append((shift, lo >> shift, hi >> shift))
            return out
        if has_lower:
            out.append((shift, lo >> shift, (lo | mask) >> shift))
        if has_upper:
            out.append((shift, (hi & ~mask) >> shift, hi >> shift))
        lo, hi = next_lo, next_hi
        shift += precision_step

# ----------------------------------------------------------- term encoding

def encode_term_py(value: int, shift: int) -> str:
    """Prefix-coded term for a signed 64-bit value at `shift` (python
    twin of the Column form; longToPrefixCoded analog)."""
    u = (value ^ (1 << 63)) & 0xFFFFFFFFFFFFFFFF
    return "%02d|%016x" % (shift, u >> shift)


def trie_terms_py(value: int, precision_step: int = 8) -> list[str]:
    return [encode_term_py(value, s)
            for s in range(0, _BITS, precision_step)]


def _unsigned(col: Column) -> Column:
    """Signed long -> order-preserving unsigned (sign-bit flip). Java's
    %016x formats the two's-complement bits as unsigned hex, which is
    exactly the reinterpretation we need after the XOR."""
    return col.cast("long").bitwiseXOR(F.lit(SIGN_BIT))


def encode_term_expr(col: Column | str, shift: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string(f"{shift:02d}|%016x",
                           F.shiftrightunsigned(_unsigned(c), shift))


def trie_terms_expr(col: Column | str, precision_step: int = 8) -> Column:
    """array<string> of the value's terms at every shift level — the
    indexing-side fan-out (64/step terms per value)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[encode_term_expr(c, s)
                     for s in range(0, _BITS, precision_step)])


def range_term_bounds(lo: int, hi: int, precision_step: int = 8
                      ) -> list[tuple[str, str]]:
    """[lo, hi] (signed, inclusive) -> [(lo_term, hi_term)] inclusive
    string-range predicates, one per trie sub-range."""
    ulo = (lo ^ (1 << 63)) & 0xFFFFFFFFFFFFFFFF
    uhi = (hi ^ (1 << 63)) & 0xFFFFFFFFFFFFFFFF
    return [("%02d|%016x" % (s, a), "%02d|%016x" % (s, b))
            for s, a, b in split_range(ulo, uhi, precision_step)]


# -------------------------------------------------------------- index side

def build_numeric_index(spark: SparkSession, docs: DataFrame, value_col: str,
                        out_path: str, precision_step: int = 8,
                        id_col: str = "docid", out_partitions: int = 32,
                        bucket_bits: int = 20) -> None:
    """Materialize the trie-term index: (term, bucket, docids
    array<long>) parquet, term-sorted within files so range predicates
    prune via min/max stats. One explode + one groupBy shuffle — the
    same scale shape as the text-index merge. ``bucket`` = docid >>
    bucket_bits caps any single row's array at 2^bucket_bits entries,
    so a degenerate value distribution (every doc sharing one value —
    the coarse-shift terms ALWAYS do at large N) can't produce a
    mega-row; it's the text index's (term, bucket) layout."""
    (docs.select(F.col(id_col).cast("long").alias("docid"),
                 F.explode(trie_terms_expr(value_col, precision_step))
                 .alias("term"))
         .withColumn("bucket", F.shiftrightunsigned(F.col("docid"),
                                                    bucket_bits))
         .groupBy("term", "bucket")
         .agg(F.sort_array(F.collect_list("docid")).alias("docids"))
         .repartitionByRange(out_partitions, "term", "bucket")
         .sortWithinPartitions("term", "bucket")
         .write.mode("overwrite").parquet(out_path))


def numeric_range_docids(spark: SparkSession, index_path: str,
                         lo: int, hi: int, precision_step: int = 8
                         ) -> DataFrame:
    """ConstantScore docid set for value in [lo, hi]: O(levels) term
    BETWEENs pushed into the parquet scan (each sub-range covers every
    matching value exactly once, so no distinct is needed — a docid
    appears at most once across the union)."""
    bounds = range_term_bounds(lo, hi, precision_step)
    if not bounds:
        return spark.range(0).select(F.col("id").alias("docid"))
    pred = None
    for a, b in bounds:
        c = F.col("term").between(a, b)
        pred = c if pred is None else (pred | c)
    return (spark.read.parquet(index_path)
            .filter(pred)
            .select(F.explode("docids").alias("docid")))


def numeric_range_count(spark: SparkSession, index_path: str,
                        lo: int, hi: int, precision_step: int = 8) -> int:
    """Hit count without the explode: Σ size(docids) over matching
    rows (exactly-once cover makes the sum exact)."""
    bounds = range_term_bounds(lo, hi, precision_step)
    if not bounds:
        return 0
    pred = None
    for a, b in bounds:
        c = F.col("term").between(a, b)
        pred = c if pred is None else (pred | c)
    row = (spark.read.parquet(index_path).filter(pred)
           .agg(F.sum(F.size("docids"))).collect()[0][0])
    return int(row or 0)
