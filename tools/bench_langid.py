#!/usr/bin/env python
"""Regenerate BENCH/langid_vectorize.json — the VERDICT r3 #2 evidence.

Interleaved legs, same process, over sf0.1 documents: the production
Arrow-batched NumPy kernel (`_batch_detect`), the per-row Python loop
it replaced, and (optionally, --catalyst) the all-JVM explode pipeline.
Each leg is prefixed by the same cache-cliff calibration probe bench.py
uses in spirit: argsort ns/elem at 300k (cache-resident) and 1.5M
(past this host's cliff), so a cold read of the JSON shows whether the
host or the code moved.

Usage: python tools/bench_langid.py [--docs 5000] [--legs 4] [--catalyst]
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lucene_solr_1_spark.datapipe.langid import (  # noqa: E402
    _batch_detect, detect_language)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe():
    out = {}
    for label, sz in (("argsort_300k_ns", 300_000), ("argsort_1m5_ns", 1_500_000)):
        a = np.random.default_rng(0).integers(0, 1 << 60, sz)
        t0 = time.perf_counter()
        np.argsort(a)
        out[label] = round((time.perf_counter() - t0) / sz * 1e9, 1)
    out["load_avg"] = list(os.getloadavg())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--legs", type=int, default=4)
    ap.add_argument("--catalyst", action="store_true")
    args = ap.parse_args()

    texts = (pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["text"])
             .column("text").to_pylist()[: args.docs])
    n = len(texts)
    # warm both paths (allocator + lazy profile load)
    _batch_detect(texts[:200])
    [detect_language(t) for t in texts[:200]]

    legs = []
    for _ in range(args.legs):
        leg = {"probe": probe()}
        t0 = time.perf_counter()
        langs, confs = _batch_detect(texts)
        leg["numpy_batch"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        exp = [detect_language(t) for t in texts]
        leg["loop"] = round(time.perf_counter() - t0, 3)
        legs.append(leg)

    mism = sum(1 for (l, c), (el, ec) in zip(zip(langs, confs), exp)
               if l != el or abs(c - ec) > 1e-9)

    result = {
        "n_docs": n,
        "corpus": SF_DIR,
        "legs": legs,
        "best": {k: min(leg[k] for leg in legs) for k in ("numpy_batch", "loop")},
        "parity_mismatches": mism,
        "note": ("VERDICT r3 #2: production langid = Arrow-batched NumPy "
                 "kernel chunked to cache-resident sorts (no shuffle, no "
                 "per-row Python); loop = old per-row Python twin. "
                 "Interleaved legs; probe = argsort ns/elem at 300k vs "
                 "1.5M shows the host cache-cliff throttle state."),
    }
    if args.catalyst:
        from pyspark.sql import SparkSession
        from lucene_solr_1_spark.datapipe.langid import detect_languages_catalyst
        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.sql.shuffle.partitions", "8")
                 .appName("bench_langid").getOrCreate())
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        df = df.repartition(8).cache()
        df.count()
        detect_languages_catalyst(df).count()  # warm
        t0 = time.perf_counter()
        detect_languages_catalyst(df).count()
        result["catalyst"] = round(time.perf_counter() - t0, 3)
        spark.stop()

    result["speedup_numpy_vs_loop"] = round(
        result["best"]["loop"] / result["best"]["numpy_batch"], 2)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/langid_vectorize.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
