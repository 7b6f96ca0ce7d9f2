"""Interleaved same-host A/B of bench.py: r1 state (84b5502) vs HEAD.

VERDICT r2 item #1: the r2 bench regressed 1.5-2.9x vs r1 on identical
queries, concentrated in Python-worker paths; the host-throttle story only
partially covered it.  This runs bench.py alternately from the r1 worktree
(A) and HEAD (B) -- A,B,A,B -- fresh JVM per leg, same cached corpus, and
appends one JSON record per leg to BENCH/regression_runs.jsonl.

Usage: python tools/regression_ab.py [n_pairs]   (default 2)
Env passed through: BENCH_DOCS (default 500000), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

A_DIR = "/tmp/r1repo"       # git worktree at 84b5502 (end of round 1)
B_DIR = "/root/repo"        # HEAD
OUT = "/root/repo/BENCH/regression_runs.jsonl"


def loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def run_leg(tag: str, cwd: str) -> dict:
    env = dict(os.environ)
    env.setdefault("BENCH_DOCS", "500000")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["PYTHONPATH"] = cwd
    la0 = loadavg()
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    la1 = loadavg()
    parsed = None
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            parsed = json.loads(line)
            break
    rec = {"tag": tag, "cwd": cwd, "rc": p.returncode,
           "wall_sec": round(wall, 1), "load_before": la0, "load_after": la1,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "parsed": parsed}
    if parsed is None:
        rec["stderr_tail"] = p.stderr[-2000:]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    q = (parsed or {}).get("queries", {})
    print(f"[{tag}] rc={p.returncode} wall={wall:.0f}s "
          f"index_build={q.get('index_build')} term_head={q.get('engine_term_head')}",
          flush=True)
    return rec


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for i in range(n_pairs):
        run_leg(f"A{i + 1}-r1", A_DIR)
        run_leg(f"B{i + 1}-head", B_DIR)
    print("done; records in", OUT)


if __name__ == "__main__":
    main()
