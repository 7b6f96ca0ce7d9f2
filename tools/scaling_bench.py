"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

Runs the IDENTICAL index build at local[8] and local[32] (fresh JVM
each, same parquet corpus), reports throughput at both and
efficiency = (T32 / T8) / 4. Writes BENCH/BASELINE.md and
BENCH/scaling.json.

Usage: python tools/scaling_bench.py [n_docs] (default 400000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from lucene_solr_1_spark.session import get_spark
from lucene_solr_1_spark.index.build import build_index

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); corpus = sys.argv[3]
spark = get_spark(cores=cores, shuffle_partitions=cores, app=f"scale{{cores}}",
                  driver_mem="48g")
root = f"/tmp/scale_idx_{{cores}}/idx"
shutil.rmtree(f"/tmp/scale_idx_{{cores}}", ignore_errors=True)
docs = spark.read.parquet(corpus)
t0 = time.time()
build_index(spark, docs, root, num_segments=64, out_partitions=32)
dt = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "sec": round(dt, 2),
                               "docs_per_sec": round(n_docs / dt, 1)}}))
"""


def run(cores: int, n_docs: int, corpus: str) -> dict:
    script = CHILD.format(repo=REPO)
    p = subprocess.run([sys.executable, "-c", script, str(cores), str(n_docs), corpus],
                       capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT (rc={p.returncode}): {p.stderr[-2000:]}")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    corpus = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        # materialize once with a throwaway session
        script = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from lucene_solr_1_spark.session import get_spark\n"
            "from lucene_solr_1_spark.fixtures.webtext import gen_docs_spark\n"
            f"spark = get_spark(cores=32, shuffle_partitions=32, driver_mem='48g')\n"
            f"gen_docs_spark(spark, {n_docs}, parallelism=64).write.mode('overwrite')"
            f".parquet({corpus!r})\n")
        subprocess.run([sys.executable, "-c", script], check=True, timeout=3600,
                       capture_output=True)
    t0 = time.time()
    results = {c: run(c, n_docs, corpus) for c in (2, 8, 32)}
    out = {
        "n_docs": n_docs,
        **{f"local{c}": r for c, r in results.items()},
        "speedup_8_vs_2": round(results[8]["docs_per_sec"]
                                / results[2]["docs_per_sec"], 3),
        "efficiency_8_vs_2_(N=2,4N=8)": round(
            results[8]["docs_per_sec"] / results[2]["docs_per_sec"] / 4.0, 3),
        "speedup_32_vs_8": round(results[32]["docs_per_sec"]
                                 / results[8]["docs_per_sec"], 3),
        "efficiency_32_vs_8_(N=8,4N=32)": round(
            results[32]["docs_per_sec"] / results[8]["docs_per_sec"] / 4.0, 3),
        "wall_total_sec": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
