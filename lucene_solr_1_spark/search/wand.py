"""Block-max WAND top-k for OR queries — exact, distributed, skip-capable.

Lucene 4.4 has block+skip substrate but no WAND (SURVEY.md §2.E); this
adds the block-max pruning of the BMW literature on top of our per-block
metadata (first_docid, n, max_tf, min_len — the skip-list analog,
ref: codecs/lucene41/Lucene41SkipWriter.java:46), re-shaped for Spark's
execution model:

Phase A (θ probe, one tiny job): for each query term pick the block
with the highest upper bound, decode & score just that block; θ0 = the
k-th largest single-term score observed. θ0 is a valid lower bound of
the final k-th score because single-term scores are lower bounds of
total scores.

Phase B (pruned scan): DOCID-ALIGNED block bounds — the defining move
of Block-Max WAND (Ding & Suel 2011). Postings blocks are docid-range
ordered, so for a block B of term t covering docid range [s, e) the
bound on any doc in B is
    ub_t(B) + Σ_{u≠t} max{ ub_u(B') : B' of u overlaps [s, e) }   (0 if
none overlaps). This is far tighter than a per-term GLOBAL max, which a
single outlier doc inflates corpus-wide. The per-term block grids
(first_docid, ub) are assembled driver-side from column-pruned
metadata; the overlap maxima are a two-pointer sliding-window maximum
(windows advance monotonically in docid), and the resulting keep-sets
are broadcast into the pruned-scan kernel. At 10^12-doc scale the same
alignment is expressible distributedly (a range join of each row's
docid span against the other terms' grids); grids are |df|/128 entries.

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
exceed them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..index.codec import decode_block, unpack_postings
from .bm25 import B as B_PARAM
from .bm25 import K1, score_postings


def _block_upper_bounds(weights: dict, avgdl: float, term: str,
                        max_tf: np.ndarray, min_len: np.ndarray) -> np.ndarray:
    """Per-block score upper bound, float64 + safety margin."""
    _, tw = weights[term]
    wv = np.float64(tw.weight_value)
    c = np.float64(K1) * ((1 - B_PARAM) + B_PARAM * min_len.astype(np.float64) / np.float64(avgdl))
    mtf = max_tf.astype(np.float64)
    return (wv * mtf / (mtf + c)) * (1.0 + 1e-5)


_END_SENTINEL = 1 << 62


def _window_max(vals: np.ndarray, los: np.ndarray, his: np.ndarray) -> np.ndarray:
    """Max of vals[lo:hi] per window; 0.0 for empty windows. Windows'
    endpoints are non-decreasing (docid-sorted grids) — monotone-deque
    sliding maximum, O(n + m)."""
    from collections import deque
    out = np.zeros(len(los), dtype=np.float64)
    dq: deque[int] = deque()
    j = 0
    for i in range(len(los)):
        lo, hi = int(los[i]), int(his[i])
        while j < hi:
            while dq and vals[dq[-1]] <= vals[j]:
                dq.pop()
            dq.append(j)
            j += 1
        while dq and dq[0] < lo:
            dq.popleft()
        if lo < hi and dq:
            out[i] = vals[dq[0]]
    return out


def _aligned_keep_sets(meta: pd.DataFrame, weights: dict, avgdls: dict,
                       terms: list[str], theta0: float,
                       ) -> dict[tuple[str, int], np.ndarray]:
    """Docid-aligned BMW keep decision per (term, bucket) row.

    Builds each term's global block grid (first_docid asc; rows of a
    term hold disjoint docid ranges, so concatenation in row-first_docid
    order is globally sorted), computes the aligned other-term maxima
    with sliding-window max, and returns {row key: kept block indices}.
    Rows absent from the map keep every block."""
    grids: dict[str, dict] = {}
    for t in terms:
        rows = meta[meta["term"] == t]
        if not len(rows):
            continue
        rows = rows.assign(_fd=[int(r[0]) for r in rows["block_first_docid"]])
        rows = rows.sort_values("_fd")
        fd_parts, ub_parts, keys, sizes = [], [], [], []
        for r in rows.itertuples(index=False):
            bfd = np.asarray(r.block_first_docid, np.int64)
            ubs = _block_upper_bounds(weights, avgdls[t], t,
                                      np.asarray(r.block_max_tf, np.int64),
                                      np.asarray(r.block_min_len, np.float32))
            fd_parts.append(bfd)
            ub_parts.append(ubs)
            keys.append((t, int(r.bucket)))
            sizes.append(len(bfd))
        fd = np.concatenate(fd_parts)
        ub = np.concatenate(ub_parts)
        end = np.append(fd[1:], _END_SENTINEL)
        grids[t] = {"fd": fd, "ub": ub, "end": end,
                    "keys": keys, "sizes": np.asarray(sizes)}

    keep_map: dict[tuple[str, int], np.ndarray] = {}
    for t, g in grids.items():
        others = np.zeros(len(g["fd"]), dtype=np.float64)
        for u, gu in grids.items():
            if u == t:
                continue
            los = np.maximum(
                np.searchsorted(gu["fd"], g["fd"], side="right") - 1, 0)
            his = np.searchsorted(gu["fd"], g["end"], side="left")
            others += _window_max(gu["ub"], los, his)
        keep_global = np.flatnonzero(g["ub"] + others >= theta0)
        bounds = np.concatenate(([0], np.cumsum(g["sizes"])))
        for ri, key in enumerate(g["keys"]):
            lo, hi = bounds[ri], bounds[ri + 1]
            local = keep_global[(keep_global >= lo) & (keep_global < hi)] - lo
            if len(local) < (hi - lo):
                keep_map[key] = local.astype(np.int64)
    return keep_map


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

    # ---- phase A: probe best block per term (column-pruned meta read) ----
    meta = (spark.read.parquet(searcher.paths.postings)
            .filter(F.col("term").isin(terms))
            .select("term", "bucket", "block_first_docid",
                    "block_max_tf", "block_min_len")
            .toPandas())
    probe_keys: set[tuple[str, int, int]] = set()
    for t in terms:
        rows = meta[meta["term"] == t]
        best = (None, -1.0)
        for r in rows.itertuples(index=False):
            ubs = _block_upper_bounds(weights, avgdls[t], t,
                                      np.asarray(r.block_max_tf, np.int64),
                                      np.asarray(r.block_min_len, np.float32))
            bi = int(np.argmax(ubs))
            if ubs[bi] > best[1]:
                best = ((t, int(r.bucket), bi), float(ubs[bi]))
        if best[0] is not None:
            probe_keys.add(best[0])

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

    # ---- phase B: docid-aligned keep sets, then pruned decode + score ----
    keep_map = _aligned_keep_sets(meta, weights, avgdls, terms, theta0)
    bc_keep = spark.sparkContext.broadcast(keep_map)

    def score_pruned(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                t = r.term
                nblocks = len(r.block_offset)
                keep = bc_keep.value.get((t, int(r.bucket)))
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
    cands = (spark.read.parquet(searcher.paths.postings)
             .filter(F.col("term").isin(terms))
             .mapInPandas(score_pruned, schema=schema))

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
