"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

Runs the IDENTICAL index build at local[8] and local[32] (fresh JVM
each, same parquet corpus), reports throughput at both and
efficiency = (T32 / T8) / 4. Writes BENCH/BASELINE.md and
BENCH/scaling.json.

Usage: python tools/scaling_bench.py [n_docs] [--positional]
       [--cores 2,8,32]            (default 400000, plain build, 2,8,32)

--positional runs the positions=True build (stores per-posting token
positions — more bytes packed + written per core-second, i.e. LOWER
arithmetic intensity). Its trials land under "trials_positional" in
BENCH/scaling.json with the same best-of-N provenance rules.
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
from lucene_solr_1_spark import fsio
from lucene_solr_1_spark.index.build import (IndexPaths, assign_docids,
    build_segments, merge_segments, write_commit_point, write_stats)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); corpus = sys.argv[3]
positional = len(sys.argv) > 4 and sys.argv[4] == "positional"
spark = get_spark(cores=cores, shuffle_partitions=cores, app=f"scale{{cores}}",
                  driver_mem="48g")
root = f"/tmp/scale_idx_{{cores}}/idx"
shutil.rmtree(f"/tmp/scale_idx_{{cores}}", ignore_errors=True)
docs = spark.read.parquet(corpus)
out = IndexPaths(root)
fsio.makedirs(root)
t0 = time.time(); stages = {{}}
assign_docids(spark, docs, out, 64)
stages["s0_docids"] = round(time.time() - t0, 2); t1 = time.time()
build_segments(spark, out, 64, positions=positional)
stages["s1_invert_pack"] = round(time.time() - t1, 2); t1 = time.time()
merge_segments(spark, out, 64, 32)
stages["s2_merge"] = round(time.time() - t1, 2); t1 = time.time()
write_commit_point(out, write_stats(spark, out))
stages["s3_stats_commit"] = round(time.time() - t1, 2)
dt = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "sec": round(dt, 2),
                               "docs_per_sec": round(n_docs / dt, 1),
                               "stages": stages}}))
"""


def run(cores: int, n_docs: int, corpus: str, positional: bool = False) -> dict:
    script = CHILD.format(repo=REPO)
    args = [sys.executable, "-c", script, str(cores), str(n_docs), corpus]
    if positional:
        args.append("positional")
    p = subprocess.run(args, capture_output=True, text=True, timeout=5400)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT (rc={p.returncode}): {p.stderr[-2000:]}")


def main():
    args = [a for a in sys.argv[1:]]
    positional = "--positional" in args
    args = [a for a in args if a != "--positional"]
    core_list = (2, 8, 32)
    for a in list(args):
        if a.startswith("--cores"):
            core_list = tuple(int(c) for c in a.split("=", 1)[1].split(","))
            args.remove(a)
    n_docs = int(args[0]) if args else 400_000
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
    results = {c: run(c, n_docs, corpus, positional) for c in core_list}
    # merge into the trials/best-of structure: the sandbox VM throttles
    # under sustained load (one-sided interference), so per-leg best-of-N
    # across ALL recorded trials is the hardware estimate; every trial is
    # kept for provenance (see BENCH/BASELINE.md methodology note)
    path = os.path.join(REPO, "BENCH", "scaling.json")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    tkey = "trials_positional" if positional else "trials"
    trials = prev.get(tkey, {})
    for c, r in results.items():
        entry = {"sec": r["sec"], "docs_per_sec": r["docs_per_sec"],
                 "n_docs": n_docs}
        if "stages" in r:
            entry["stages"] = r["stages"]
        trials.setdefault(f"local{c}", []).append(entry)
    # best-of / efficiency are computed ONLY over trials at THIS run's
    # corpus size (older records without n_docs are the historical 4M
    # series) — mixing scales would compare different fixed-overhead
    # regimes
    def _nd(t):
        return t.get("n_docs", 4_000_000)
    best = {}
    for leg, ts in trials.items():
        same = [t for t in ts if _nd(t) == n_docs]
        if same:
            best[leg] = max(same, key=lambda x: x["docs_per_sec"])
    b = {leg: best[leg]["docs_per_sec"] for leg in best}
    out = dict(prev)
    out["n_docs"] = n_docs
    out.setdefault("methodology",
                   "fresh JVM per run, foreground only, best-of-N per leg "
                   "across all trials")
    out[tkey] = trials
    bkey = "best_positional" if positional else "best"
    if n_docs != 4_000_000:
        bkey += f"_{n_docs // 1000}k"
    out[bkey] = {leg: {"cores": int(leg[5:]), **v}
                 for leg, v in best.items()}
    sfx = "_positional" if positional else ""
    if n_docs != 4_000_000:
        sfx += f"_{n_docs // 1000}k"     # don't shadow the 4M series
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if f"local{lo}" in b and f"local{hi}" in b:
            sp = b[f"local{hi}"] / b[f"local{lo}"]
            out[f"speedup_{hi}_vs_{lo}{sfx}"] = round(sp, 3)
            out[f"efficiency_{hi}_vs_{lo}_(N={lo},4N={hi}){sfx}"] = \
                round(sp / 4, 3)
    out["wall_total_sec"] = round(time.time() - t0, 1)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
