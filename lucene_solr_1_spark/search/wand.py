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

Phase B (pruned scan): over the matching postings rows, keep only
blocks with  ub_t(B) + Σ_{s≠t} gmax_s  >=  θ0   (gmax = global
per-term score bound from termstats max_tf). Decode/score kept blocks
only, then combine + top-k exactly like the exact path.

Exactness proof (the TestBoolean2-style equivalence tests enforce it):
if a doc's block was skipped then its true total
  <= ub_t(B) + Σ_{s≠t} gmax_s < θ0,
while ≥ k docs — the probed term's top-k — keep ALL their blocks (any
block containing a doc with true total >= θ0 fails the skip test) and
therefore get fully-computed scores >= θ0. Docs with partially-computed
scores are strictly below θ0 and cannot enter or tie into the top-k.
Upper bounds are computed in float64 and widened by 1e-5 so float32
rounding in the scoring kernel can never exceed them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..index.codec import decode_block, unpack_postings
from .bm25 import B as B_PARAM
from .bm25 import K1, avg_field_length, score_postings


def _block_upper_bounds(weights: dict, avgdl: float, term: str,
                        max_tf: np.ndarray, min_len: np.ndarray) -> np.ndarray:
    """Per-block score upper bound, float64 + safety margin."""
    _, tw = weights[term]
    wv = np.float64(tw.weight_value)
    c = np.float64(K1) * ((1 - B_PARAM) + B_PARAM * min_len.astype(np.float64) / np.float64(avgdl))
    mtf = max_tf.astype(np.float64)
    return (wv * mtf / (mtf + c)) * (1.0 + 1e-5)


def search_wand(searcher, terms: list[str], k: int = 10, dtype=np.float32,
                stats: dict | None = None) -> DataFrame:
    """Exact OR top-k with block skipping. Returns (docid, score, rank).

    Pass ``stats={}`` to receive skip accounting: after an action on the
    result, stats["blocks_total"].value / stats["blocks_kept"].value
    hold the postings-block counts seen vs actually decoded."""
    from pyspark.sql.window import Window

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
    avgdl = float(avg_field_length(searcher.sum_ttf, searcher.max_doc, dtype=dtype))
    gmax = {t: float(weights[t][1].max_score) for t in terms}

    # ---- phase A: probe best block per term (column-pruned meta read) ----
    meta = (spark.read.parquet(searcher.paths.postings)
            .filter(F.col("term").isin(terms))
            .select("term", "bucket", "block_max_tf", "block_min_len")
            .toPandas())
    probe_keys: set[tuple[str, int, int]] = set()
    for t in terms:
        rows = meta[meta["term"] == t]
        best = (None, -1.0)
        for r in rows.itertuples(index=False):
            ubs = _block_upper_bounds(weights, avgdl, t,
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
    probe_filter = None
    for (t, b, _) in probe_keys:
        cond = (F.col("term") == t) & (F.col("bucket") == b)
        probe_filter = cond if probe_filter is None else (probe_filter | cond)
    probe_df = (spark.read.parquet(searcher.paths.postings)
                .filter(probe_filter)
                .mapInPandas(decode_probe, schema="docid long, score double"))
    probe_scores = sorted((r["score"] for r in probe_df.collect()), reverse=True)
    theta0 = probe_scores[k - 1] if len(probe_scores) >= k else 0.0

    # ---- phase B: pruned decode + score ----------------------------------
    sum_gmax = sum(gmax.values())

    def score_pruned(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                t = r.term
                others = sum_gmax - gmax[t]
                ubs = _block_upper_bounds(weights, avgdl, t,
                                          np.asarray(r.block_max_tf, np.int64),
                                          np.asarray(r.block_min_len, np.float32))
                keep = np.flatnonzero(ubs + others >= theta0)
                if stats is not None:
                    stats["blocks_total"].add(len(ubs))
                    stats["blocks_kept"].add(len(keep))
                if not len(keep):
                    continue
                buf = np.frombuffer(r.blob, np.uint8)
                tidx, tw = weights[t]
                if len(keep) == len(ubs):
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

    nterms = len(terms)
    pivoted = (cands.groupBy("docid")
               .pivot("tidx", [weights[t][0] for t in terms])
               .agg(F.first("score")))
    zero = F.lit(0.0).cast("float" if dtype == np.float32 else "double")
    total = None
    for t in terms:
        c = F.coalesce(F.col(str(weights[t][0])), zero)
        total = c if total is None else total + c
    topk = (pivoted.withColumn("score", total)
            .select("docid", "score")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k))
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("docid")))
    return topk.withColumn("rank", w.cast("long"))
