"""sf1 scale gate (VERDICT-r4 next #9): run the index build at 5M docs
(10x the per-round sf0.1 bench) and the bool_or_topk engine query,
publishing per-phase SHUFFLE BYTES from the Spark status REST API — the
evidence that the head-term salting / WAND plans hold one order up
(shuffle volume must scale ~linearly with the corpus, never
quadratically, and the query phase must shuffle kilobytes, not the
index).

Usage: python tools/bench_sf1_gate.py [n_docs]   (default 5_000_000)
Writes BENCH/sf1_gate.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read().decode())


def _phase_metrics(spark, base: str, group: str) -> dict:
    """Aggregate stage metrics for all jobs in a job group."""
    app_id = spark.sparkContext.applicationId
    jobs = _api(base, f"/api/v1/applications/{app_id}/jobs")
    stage_ids = set()
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.update(j.get("stageIds", []))
    stages = _api(base, f"/api/v1/applications/{app_id}/stages")
    agg = {"n_stages": 0, "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "input_bytes": 0, "output_bytes": 0, "max_stage_shuffle_write": 0}
    for s in stages:
        if s["stageId"] in stage_ids and s["status"] == "COMPLETE":
            agg["n_stages"] += 1
            agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            agg["input_bytes"] += s.get("inputBytes", 0)
            agg["output_bytes"] += s.get("outputBytes", 0)
            agg["max_stage_shuffle_write"] = max(
                agg["max_stage_shuffle_write"], s.get("shuffleWriteBytes", 0))
    return agg


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from lucene_solr_1_spark.fixtures.webtext import VOCAB, gen_docs_spark
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher
    from lucene_solr_1_spark.session import get_spark
    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app="sf1gate",
                      driver_mem="48g",
                      extra={"spark.ui.enabled": "true",
                             "spark.ui.retainedStages": "5000",
                             "spark.ui.retainedJobs": "5000"})
    base = spark.sparkContext.uiWebUrl
    sc = spark.sparkContext

    corpus = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen_docs_spark(spark, n_docs, parallelism=cpus * 2) \
            .write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    docs.count()

    sc.setJobGroup("build", "index build")
    root = os.path.join(tempfile.mkdtemp(prefix="sf1_idx_"), "idx")
    t0 = time.time()
    build_index(spark, docs, root, num_segments=cpus * 2,
                out_partitions=cpus)
    build_sec = round(time.time() - t0, 2)
    build_m = _phase_metrics(spark, base, "build")

    searcher = IndexSearcher(spark, root)
    terms = [str(VOCAB[1]), str(VOCAB[200]), str(VOCAB[3000])]
    sc.setJobGroup("query", "bool_or_topk")
    t0 = time.time()
    hits = searcher.search(terms, "OR", k=10).collect()
    query_sec = round(time.time() - t0, 3)
    query_m = _phase_metrics(spark, base, "query")

    out = {
        "n_docs": n_docs, "cpus": cpus,
        "index_build_sec": build_sec,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "build_metrics": build_m,
        "build_shuffle_bytes_per_doc": round(
            build_m["shuffle_write_bytes"] / n_docs, 2),
        "bool_or_topk_sec": query_sec,
        "bool_or_topk_rows": len(hits),
        "query_metrics": query_m,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "sf1_gate.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
