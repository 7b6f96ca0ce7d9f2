"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Components:
  * index_build       — full distributed build (tokenize -> per-segment pack
                        with checkpoints -> term-bucket merge) over BENCH_DOCS
                        deterministically generated webtext docs
                        (docs/sec is the BASELINE.json headline metric)
  * engine q_*        — BM25 top-10 through the packed-postings engine
  * sql q_*           — headline contract queries on $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_DOCS (default 50000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "500000"))

    from lucene_solr_1_spark.session import get_spark
    from lucene_solr_1_spark.fixtures.webtext import gen_docs_spark
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher
    from lucene_solr_1_spark.contract import make_queries

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app="bench")
    queries: dict[str, float] = {}
    t_all = time.time()

    # ---- index build throughput -----------------------------------------
    # corpus is materialized to parquet first (the reference's rec/s also
    # reads a pre-existing corpus); build time excludes generation
    corpus = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen_docs_spark(spark, n_docs, parallelism=cpus * 2) \
            .write.mode("overwrite").parquet(corpus)
    root = os.path.join(tempfile.mkdtemp(prefix="bench_idx_"), "idx")
    docs = spark.read.parquet(corpus)
    t0 = time.time()
    paths = build_index(spark, docs, root, num_segments=cpus * 2,
                        out_partitions=cpus)
    build_sec = time.time() - t0
    queries["index_build"] = round(build_sec, 3)
    docs_per_sec = round(n_docs / build_sec, 1)

    # ---- engine query latency -------------------------------------------
    searcher = IndexSearcher(spark, paths.root)
    from lucene_solr_1_spark.fixtures.webtext import VOCAB
    engine_qs = {
        "engine_term_head": ([str(VOCAB[0])], "OR"),
        "engine_term_mid": ([str(VOCAB[500])], "OR"),
        "engine_or3": ([str(VOCAB[1]), str(VOCAB[200]), str(VOCAB[3000])], "OR"),
        "engine_and2": ([str(VOCAB[50]), str(VOCAB[120])], "AND"),
        "engine_msm2": ([str(VOCAB[10]), str(VOCAB[300]), str(VOCAB[900])], "MSM2"),
    }
    for name, (terms, op) in engine_qs.items():
        t0 = time.time()
        searcher.search(terms, op, k=10).collect()
        queries[name] = round(time.time() - t0, 3)
    t0 = time.time()
    searcher.search_wand([str(VOCAB[1]), str(VOCAB[200]), str(VOCAB[3000])],
                         k=10).collect()
    queries["engine_wand_or3"] = round(time.time() - t0, 3)

    # ---- block-max WAND skip rate on a SKEWED corpus --------------------
    # the uniform bench corpus mathematically admits 0% skipping (flat
    # per-block bounds); real webtext is skewed (hub docs + verbose
    # tail), so the per-round evidence of BMW's value is measured here:
    # one hub doc holds both terms at max tf, the tail mentions them
    # singly in long docs — θ from the hub prunes most tail blocks.
    import numpy as np
    rng = np.random.RandomState(7)
    w = rng.randint(0, 2000, size=(30000, 60))
    texts = ["alpha " * 15 + "beta " * 12 + "pad"]
    for i in range(1, len(w)):
        row = [f"w{x}" for x in w[i]]
        if i % 3 == 0:
            row[0] = "alpha"
        if i % 5 == 0:
            row[1] = "beta"
        texts.append(" ".join(row))
    import pandas as pd
    skew_pdf = pd.DataFrame({"url": [f"s{i:06d}" for i in range(len(texts))],
                             "text": texts})
    skew_root = os.path.join(tempfile.mkdtemp(prefix="bench_skew_"), "idx")
    skew_paths = build_index(spark, spark.createDataFrame(skew_pdf),
                             skew_root, num_segments=8, out_partitions=8)
    skew_s = IndexSearcher(spark, skew_paths.root)
    stats: dict = {}
    t0 = time.time()
    skew_s.search_wand(["alpha", "beta"], k=1, stats=stats,
                       force=True).collect()
    queries["engine_wand_skewed_k1"] = round(time.time() - t0, 3)
    total_b = stats["blocks_total"].value
    kept_b = stats["blocks_kept"].value
    wand_skip_ratio = round(1.0 - kept_b / total_b, 4) if total_b else 0.0
    shutil.rmtree(os.path.dirname(skew_root), ignore_errors=True)

    # ---- headline SQL operators on the driver testdata -------------------
    contract = make_queries()
    for name in ["term_stats", "bool_or_topk", "facet_field", "grouping_top1",
                 "minhash_lsh", "ann_cosine_topk", "event_window_agg",
                 "numeric_trie_range", "geo_bbox_grid", "winnow_fingerprint",
                 "payload_term", "frange_filter", "schema_copyfield_topk"]:
        t0 = time.time()
        contract[name](spark, sf_dir).collect()
        queries[f"sql_{name}"] = round(time.time() - t0, 3)

    total = round(time.time() - t_all, 3)
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    print(json.dumps({
        "metric": "index-build + BM25 top-k + pipeline ops wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "bench_docs": n_docs,
        "indexing_docs_per_sec": docs_per_sec,
        "wand_skip_ratio_skewed": wand_skip_ratio,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
