"""Block-max WAND top-k for OR queries — exact, distributed, skip-capable.

Lucene 4.4 has block+skip substrate but no WAND (SURVEY.md §2.E); this
adds the block-max pruning of the BMW literature on top of our per-block
metadata (first_docid, n, max_tf, min_len — the skip-list analog,
ref: codecs/lucene41/Lucene41SkipWriter.java:46), re-shaped for Spark's
execution model:

Phase A (θ probe, one tiny job): for each query term pick the block
with the highest upper bound (distributed max_by over the exploded block
grid), decode & score just those blocks; θ0 = the k-th largest per-doc
partial sum observed. θ0 is a valid lower bound of the final k-th score
because partial sums are lower bounds of total scores.

Phase B (pruned scan): DOCID-ALIGNED block bounds — the defining move
of Block-Max WAND (Ding & Suel 2011). Postings blocks are docid-range
ordered, so for a block B of term t covering docid range [s, e) the
bound on any doc in B is
    ub_t(B) + Σ_{u≠t} max{ ub_u(B') : B' of u overlaps [s, e) }   (0 if
none overlaps). This is far tighter than a per-term GLOBAL max, which a
single outlier doc inflates corpus-wide.

DISTRIBUTED alignment (no full-metadata driver collect): the per-term
block grids (first_docid, ub) live in a DataFrame of one row per block
(|df|/128 rows), partitioned by docid CHUNK (chunk = docid >> 44 — the
doc-bucket, so chunk population is bounded by the routing scheme at any
corpus scale). A per-chunk applyInPandas kernel computes the overlap
maxima with a vectorized sparse-table sliding-window max. Cross-chunk
state is carried through a tiny per-(term, chunk) summary table
(first/last block fd, last-block ub, chunk-max ub — O(terms × chunks)
rows, broadcast): a window that extends past its chunk takes the exact
in-chunk maximum plus the summary chunk-maxima of the spanned chunks —
an OVERestimate only for the final partial chunk, which keeps extra
blocks but can never skip a needed one (exactness is one-sided). Keep
decisions flow back to the scan as a (term, bucket) -> dropped-blocks
join (auto-broadcast when small), never a driver-side dict.

Exactness proof (the TestBoolean2-style equivalence tests enforce it):
a doc d in a skipped block B lies in [s, e), so for every other term u
its u-score is bounded by the max ub over u's blocks overlapping
[s, e) (d lies in exactly one such block), hence d's true total
  <= ub_t(B) + Σ_{u≠t} aligned_max_u(B) < θ0,
while ≥ k docs — the θ-probe's top-k — have true totals >= θ0 and every
block containing such a doc fails the skip test, so their scores are
fully computed. Partially-scored docs are strictly below θ0 and cannot
enter or tie into the top-k. Upper bounds are computed in float64 and
widened by 1e-5 so float32 rounding in the scoring kernel can never
exceed them; the chunked others-maxima are exact within a chunk and
conservative (≥ the two-pointer value) across chunk boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..index.codec import decode_block, unpack_postings
from .bm25 import B as B_PARAM
from .bm25 import K1, score_postings

# docid chunk for grid partitioning = the doc-bucket of the routing
# scheme (index/build.py BUCKET_SHIFT): chunks are uniformly doc-dense,
# so per-chunk grid size is bounded by bucket doc count / 128
CHUNK_SHIFT = 44

_END_SENTINEL = 1 << 62


def _block_upper_bounds(weights: dict, avgdl: float, term: str,
                        max_tf: np.ndarray, min_len: np.ndarray) -> np.ndarray:
    """Per-block score upper bound, float64 + safety margin."""
    _, tw = weights[term]
    wv = np.float64(tw.weight_value)
    c = np.float64(K1) * ((1 - B_PARAM) + B_PARAM * min_len.astype(np.float64) / np.float64(avgdl))
    mtf = max_tf.astype(np.float64)
    return (wv * mtf / (mtf + c)) * (1.0 + 1e-5)


def _window_max(vals: np.ndarray, los: np.ndarray, his: np.ndarray) -> np.ndarray:
    """Max of vals[lo:hi] per window; 0.0 for empty windows. Vectorized
    sparse-table RMQ: O(n log n) table build (np.maximum over strided
    views), O(1) per query — no per-element Python loop."""
    n = len(vals)
    m = len(los)
    out = np.zeros(m, dtype=np.float64)
    if n == 0 or m == 0:
        return out
    lengths = np.maximum(his - los, 0)
    nonempty = lengths > 0
    if not nonempty.any():
        return out
    # table[j][i] = max(vals[i : i + 2^j])
    nlev = max(1, int(np.floor(np.log2(n))) + 1)
    table = [np.asarray(vals, dtype=np.float64)]
    for j in range(1, nlev):
        prev = table[-1]
        half = 1 << (j - 1)
        if len(prev) <= half:
            break
        table.append(np.maximum(prev[:-half], prev[half:]))
    lo = los[nonempty].astype(np.int64)
    ln = lengths[nonempty].astype(np.int64)
    j = np.floor(np.log2(ln)).astype(np.int64)
    j = np.minimum(j, len(table) - 1)
    left = np.empty(len(lo), dtype=np.float64)
    right = np.empty(len(lo), dtype=np.float64)
    for jj in np.unique(j):
        sel = j == jj
        tj = table[jj]
        width = 1 << int(jj)
        left[sel] = tj[lo[sel]]
        right[sel] = tj[np.minimum(lo[sel] + ln[sel] - width, len(tj) - 1)]
    out[nonempty] = np.maximum(left, right)
    return out


_GRID_SCHEMA = ("term string, bucket int, bidx int, fd long, ub double, "
                "chunk long")


def _make_explode_blocks(weights: dict, avgdls: dict):
    """mapInPandas kernel: postings meta rows -> one row per block
    (term, bucket, bidx, first_docid, upper bound, docid chunk)."""

    def explode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                bfd = np.asarray(r.block_first_docid, np.int64)
                ubs = _block_upper_bounds(weights, avgdls[r.term], r.term,
                                          np.asarray(r.block_max_tf, np.int64),
                                          np.asarray(r.block_min_len, np.float32))
                outs.append(pd.DataFrame({
                    "term": r.term, "bucket": np.int32(r.bucket),
                    "bidx": np.arange(len(bfd), dtype=np.int32),
                    "fd": bfd, "ub": ubs,
                    "chunk": bfd >> CHUNK_SHIFT}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return explode


def _chunk_tables(summ: pd.DataFrame):
    """Driver-side cross-chunk state from the tiny per-(term, chunk)
    summary (O(terms × chunks) rows — NOT the block grid):

      carry_in[(t, c)]  = (fd, ub) of t's last block strictly before
                          chunk c (the block covering c's start),
      next_first[(t, c)] = first fd of t after chunk c (window close),
      chunk_max[t]       = (chunks asc, per-chunk max ub) for the
                          cross-chunk tail maxima."""
    carry_in: dict = {}
    next_first: dict = {}
    chunk_max: dict = {}
    all_chunks = np.sort(summ["chunk"].unique())
    for t, g in summ.groupby("term"):
        g = g.sort_values("chunk")
        chunks = g["chunk"].to_numpy(np.int64)
        chunk_max[t] = (chunks, g["max_ub"].to_numpy(np.float64))
        last_fd = g["max_fd"].to_numpy(np.int64)
        last_ub = g["last_ub"].to_numpy(np.float64)
        first_fd = g["min_fd"].to_numpy(np.int64)
        for ci, c in enumerate(all_chunks):
            # last of t's chunks strictly before c
            j = int(np.searchsorted(chunks, c, side="left")) - 1
            if j >= 0:
                carry_in[(t, int(c))] = (int(last_fd[j]), float(last_ub[j]))
            # first of t's chunks strictly after c
            j2 = int(np.searchsorted(chunks, c, side="right"))
            if j2 < len(chunks):
                next_first[(t, int(c))] = int(first_fd[j2])
    return carry_in, next_first, chunk_max


def _range_max(chunk_max_t, c_lo: int, c_hi: int) -> float:
    """Max per-chunk ub of a term over chunks in [c_lo, c_hi]."""
    chunks, maxes = chunk_max_t
    i = int(np.searchsorted(chunks, c_lo, side="left"))
    j = int(np.searchsorted(chunks, c_hi, side="right"))
    return float(maxes[i:j].max()) if j > i else 0.0


def _make_keep_kernel(theta0: float, terms: list[str], bc_tables):
    """applyInPandas kernel (one docid chunk): emit the DROPPED
    (term, bucket, bidx) rows — absence means keep."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        carry_in, next_first, chunk_max = bc_tables.value
        c = int(pdf["chunk"].iloc[0])
        chunk_end = (c + 1) << CHUNK_SHIFT
        grids = {}
        for t, g in pdf.groupby("term"):
            g = g.sort_values("fd", kind="mergesort")
            grids[t] = (g["fd"].to_numpy(np.int64),
                        g["ub"].to_numpy(np.float64),
                        g["bucket"].to_numpy(np.int32),
                        g["bidx"].to_numpy(np.int32))
        out_t, out_b, out_i = [], [], []
        for t, (fd, ub, bkt, bidx) in grids.items():
            end = np.append(fd[1:], next_first.get((t, c), _END_SENTINEL))
            crossing = end > chunk_end   # windows extending past this chunk
            others = np.zeros(len(fd), dtype=np.float64)
            for u in terms:
                if u == t:
                    continue
                if u in grids:
                    gfd, gub = grids[u][0], grids[u][1]
                    ci = carry_in.get((u, c))
                    if ci is not None:
                        # prepend the block covering the chunk start
                        gfd = np.concatenate(([ci[0]], gfd))
                        gub = np.concatenate(([ci[1]], gub))
                    los = np.maximum(
                        np.searchsorted(gfd, fd, side="right") - 1, 0)
                    his = np.searchsorted(gfd, end, side="left")
                    contrib = _window_max(gub, los, his)
                else:
                    # u absent from this chunk: its carry-in block covers
                    # every docid here
                    ci = carry_in.get((u, c))
                    contrib = np.full(len(fd), ci[1] if ci else 0.0)
                if crossing.any() and u in chunk_max:
                    # conservative tail for windows spanning later chunks:
                    # exact in-chunk part above + the spanned chunks' maxima
                    for i in np.flatnonzero(crossing):
                        ec = int(min(end[i], _END_SENTINEL - 1) >> CHUNK_SHIFT)
                        tail = _range_max(chunk_max[u], c + 1, ec)
                        if tail > contrib[i]:
                            contrib[i] = tail
                others += contrib
            drop = np.flatnonzero(ub + others < theta0)
            if len(drop):
                out_t.append(np.full(len(drop), t, dtype=object))
                out_b.append(bkt[drop])
                out_i.append(bidx[drop])
        if not out_t:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "bucket": pd.Series(dtype=np.int32),
                                 "bidx": pd.Series(dtype=np.int32)})
        return pd.DataFrame({"term": np.concatenate(out_t),
                             "bucket": np.concatenate(out_b),
                             "bidx": np.concatenate(out_i)})

    return kernel


def search_wand(searcher, terms: list[str], k: int = 10, dtype=np.float32,
                stats: dict | None = None) -> DataFrame:
    """Exact OR top-k with block skipping. Returns (docid, score, rank).

    Pass ``stats={}`` to receive skip accounting: after an action on the
    result, stats["blocks_total"].value / stats["blocks_kept"].value
    report block pruning. NOTE: the accumulators are added inside a
    transformation evaluated by more than one Spark job (top-k limit +
    rank), and task retries re-add — only the kept/total RATIO is
    meaningful, not the absolute counts."""

    spark = searcher.spark
    if stats is not None:
        stats["blocks_total"] = spark.sparkContext.accumulator(0)
        stats["blocks_kept"] = spark.sparkContext.accumulator(0)
    weights = searcher._weights(terms, dtype=dtype)
    terms = [t for t in terms if t in weights]
    spark_t = T.FloatType() if dtype == np.float32 else T.DoubleType()
    empty_schema = T.StructType([
        T.StructField("docid", T.LongType()),
        T.StructField("score", spark_t),
        T.StructField("rank", T.LongType()),
    ])
    if not terms:
        return spark.createDataFrame([], empty_schema)
    # per-term avgdl: per-field CollectionStatistics on multi-field indexes
    avgdls = {t: float(searcher._avgdl_for(t, dtype=dtype)) for t in terms}

    # ---- block grid: one row per postings block, computed distributed
    # from column-pruned meta (blobs never read here) and kept distributed
    grid = (spark.read.parquet(searcher.paths.postings)
            .filter(F.col("term").isin(terms))
            .select("term", "bucket", "block_first_docid",
                    "block_max_tf", "block_min_len")
            .mapInPandas(_make_explode_blocks(weights, avgdls),
                         schema=_GRID_SCHEMA))
    grid = grid.persist()

    # ---- ONE distributed aggregation produces both the per-(term, chunk)
    # cross-chunk summaries (phase B) and the per-term argmax block
    # (phase A probe): O(terms × chunks) rows to the driver, never the grid
    summ = (grid.groupBy("term", "chunk")
            .agg(F.min("fd").alias("min_fd"), F.max("fd").alias("max_fd"),
                 F.max_by("ub", "fd").alias("last_ub"),
                 F.max("ub").alias("max_ub"),
                 F.max_by(F.struct("bucket", "bidx"), "ub").alias("best"))
            .toPandas())
    probe_keys: set[tuple[str, int, int]] = set()
    for t, g in summ.groupby("term"):
        i = int(g["max_ub"].to_numpy().argmax())
        best = g["best"].iloc[i]
        probe_keys.add((t, int(best["bucket"]), int(best["bidx"])))

    def decode_probe(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                key_base = (r.term, int(r.bucket))
                for (t, b, bi) in probe_keys:
                    if (t, b) != key_base:
                        continue
                    buf = np.frombuffer(r.blob, np.uint8)
                    d, tf, nb = decode_block(
                        buf, int(r.block_offset[bi]), int(r.block_first_docid[bi]),
                        int(r.block_n[bi]))
                    s = score_postings(weights[t][1], tf, nb, dtype=dtype)
                    outs.append(pd.DataFrame({"docid": d, "score": s.astype(np.float64)}))
            yield (pd.concat(outs, ignore_index=True) if outs
                   else pd.DataFrame({"docid": pd.Series(dtype=np.int64),
                                      "score": pd.Series(dtype=np.float64)}))

    # pushdown the exact (term, bucket) probe rows — reads ~|terms| rows'
    # blobs instead of every matching blob (parquet min/max prunes both)
    if probe_keys:
        probe_filter = None
        for (t, b, _) in probe_keys:
            cond = (F.col("term") == t) & (F.col("bucket") == b)
            probe_filter = cond if probe_filter is None else (probe_filter | cond)
        probe_df = (spark.read.parquet(searcher.paths.postings)
                    .filter(probe_filter)
                    .mapInPandas(decode_probe, schema="docid long, score double"))
        # θ0 = k-th best per-DOC partial sum over the probed blocks: a doc
        # appearing in several terms' best blocks combines (hub docs), which
        # tightens θ0 well above any single-term score. Still a valid lower
        # bound of the true k-th total (partial sum ≤ total per doc), so the
        # result stays exact.
        probe_pdf = probe_df.toPandas()
    else:
        # terms in termstats but no postings meta rows: skip phase A
        probe_pdf = pd.DataFrame()
    if len(probe_pdf):
        per_doc = probe_pdf.groupby("docid")["score"].sum().to_numpy()
        per_doc.sort()
        theta0 = float(per_doc[-k]) if len(per_doc) >= k else 0.0
    else:
        theta0 = 0.0

    # ---- phase B: distributed docid-aligned keep sets ----
    dropped = None
    if theta0 > 0.0:
        bc_tables = spark.sparkContext.broadcast(_chunk_tables(summ))
        kernel = _make_keep_kernel(theta0, terms, bc_tables)
        drop_df = (grid.groupBy("chunk")
                   .applyInPandas(lambda pdf: kernel(pdf),
                                  schema="term string, bucket int, bidx int"))
        dropped = (drop_df.groupBy("term", "bucket")
                   .agg(F.collect_list("bidx").alias("dropped"))
                   .persist())
        # materialize (small: one row per pruned (term, bucket)) so the
        # grid scan isn't re-run by the main job; a zero count means no
        # block anywhere fell below θ — skip the join entirely
        if dropped.count() == 0:
            dropped.unpersist()
            dropped = None
    grid.unpersist()

    def score_pruned(batches):
        for pdf in batches:
            outs = []
            has_drop = "dropped" in pdf.columns
            for r in pdf.itertuples(index=False):
                t = r.term
                nblocks = len(r.block_offset)
                drop = getattr(r, "dropped", None) if has_drop else None
                if drop is None or (isinstance(drop, float) and pd.isna(drop)):
                    keep = None
                else:
                    drop_set = set(int(x) for x in drop)
                    keep = np.array([i for i in range(nblocks)
                                     if i not in drop_set], dtype=np.int64)
                if stats is not None:
                    stats["blocks_total"].add(nblocks)
                    stats["blocks_kept"].add(nblocks if keep is None
                                             else len(keep))
                if keep is not None and not len(keep):
                    continue
                buf = np.frombuffer(r.blob, np.uint8)
                tidx, tw = weights[t]
                if keep is None:
                    # nothing to skip in this row: whole-blob vectorized
                    # decode (the exact path's kernel) beats per-block calls
                    d, tf, nb = unpack_postings(
                        buf, np.asarray(r.block_offset, np.int64),
                        np.asarray(r.block_first_docid, np.int64),
                        np.asarray(r.block_n, np.int64))
                    s = score_postings(tw, tf, nb, dtype=dtype)
                    outs.append(pd.DataFrame({"docid": d, "tidx": np.int32(tidx),
                                              "score": s}))
                    continue
                for bi in keep:
                    d, tf, nb = decode_block(
                        buf, int(r.block_offset[bi]), int(r.block_first_docid[bi]),
                        int(r.block_n[bi]))
                    s = score_postings(tw, tf, nb, dtype=dtype)
                    outs.append(pd.DataFrame({"docid": d, "tidx": np.int32(tidx),
                                              "score": s}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = T.StructType([
        T.StructField("docid", T.LongType()),
        T.StructField("tidx", T.IntegerType()),
        T.StructField("score", spark_t),
    ])
    matched = (spark.read.parquet(searcher.paths.postings)
               .filter(F.col("term").isin(terms)))
    if dropped is not None:
        # keep decisions flow in as data (left join, auto-broadcast when
        # small) — never a driver-side dict of the whole grid
        matched = matched.join(dropped, ["term", "bucket"], "left")
    cands = matched.mapInPandas(score_pruned, schema=schema)

    from .engine import topk_with_rank
    pivoted = (cands.groupBy("docid")
               .pivot("tidx", [weights[t][0] for t in terms])
               .agg(F.first("score")))
    zero = F.lit(0.0).cast("float" if dtype == np.float32 else "double")
    total = None
    for t in terms:
        c = F.coalesce(F.col(str(weights[t][0])), zero)
        total = c if total is None else total + c
    return topk_with_rank(pivoted.withColumn("score", total), k)
