"""Early-terminating sorted collection over a sorted index (ref:
lucene/misc/src/java/org/apache/lucene/index/sorter/
SortingMergePolicy.java:57, EarlyTerminatingSortingCollector.java:43):
when the index sort equals the query sort, a per-segment collector can
stop after k docs — the rest of the segment can only be worse.

Spark twin: a sort-built index (build_index(sort_by=...)) assigns
per-bucket docids in ascending sort order, so "the first k docs of
every segment" is the docid range [bucket<<44, bucket<<44 + k) —
expressed as an OR of per-bucket docid ranges the parquet scan prunes
with row-group min/max stats (docs files hold whole buckets in docid
order). The scan therefore touches ≤ num_segments × k rows regardless
of corpus size — the distributed version of "terminate after k"."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..index.build import BUCKET_SHIFT


def early_terminating_sorted_topk(searcher, k: int,
                                  cols: tuple[str, ...] = ("url",)
                                  ) -> DataFrame:
    """Global top-k by the index sort (ascending), match-all — the
    TopFieldCollector + EarlyTerminatingSortingCollector pairing.
    Requires an index built with sort_by=...; raises otherwise."""
    sort_col = searcher.stats.get("index_sort")
    if not sort_col:
        raise ValueError("index was not built with sort_by=...; "
                         "early termination needs the segment-sort "
                         "property (SortingMergePolicy)")
    n_seg = int(searcher.stats.get("num_segments", 0))
    docs = searcher.spark.read.parquet(searcher.paths.docs)
    if n_seg:
        cond = F.lit(False)
        for b in range(n_seg):
            base = b << BUCKET_SHIFT
            cond = cond | ((F.col("docid") >= base)
                           & (F.col("docid") < base + int(k)))
    else:  # legacy index without the bucket count: mask arithmetic
        cond = (F.col("docid").bitwiseAND((1 << BUCKET_SHIFT) - 1)
                < int(k))
    cand = docs.filter(cond)
    return (cand.select("docid", "sort_key", *cols)
            .orderBy(F.asc("sort_key"), F.asc("docid"))
            .limit(int(k)))


def duplicate_filter(hits: DataFrame, keyed_docs: DataFrame,
                     field: str, keep: str = "last") -> DataFrame:
    """DuplicateFilter analog (ref: lucene/sandbox/.../queries/
    DuplicateFilter.java:38): keep exactly one hit per value of
    `field` — KM_USE_FIRST_OCCURRENCE (lowest docid) or
    KM_USE_LAST_OCCURRENCE (highest, the reference default).
    `keyed_docs` maps docid -> field; the winner pick is one map-side-
    combinable groupBy + a semi-join, both on the field value."""
    if keep not in ("first", "last"):
        raise ValueError("keep must be 'first' or 'last'")
    agg = F.min("docid") if keep == "first" else F.max("docid")
    joined = hits.join(keyed_docs.select("docid", field), "docid")
    winners = joined.groupBy(field).agg(agg.alias("docid"))
    return hits.join(winners.select("docid"), "docid", "left_semi")
