"""CJK segmentation microbench (VERDICT-r4 next #6): per-row map vs the
dedup+memo kernel (analysis/segcache.py) on a 10k-doc corpus drawn from
a small sentence pool (the web-corpus duplication regime), plus the
unique-only worst case where dedup cannot help.

Usage: python tools/bench_cjk.py [n_docs]
Prints one JSON line.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lucene_solr_1_spark.analysis.kuromoji import ja_tokenize  # noqa: E402
from lucene_solr_1_spark.analysis.segcache import segment_series  # noqa: E402
from lucene_solr_1_spark.analysis.smartcn import smartcn_tokenize  # noqa: E402

SENTS = ["日本経済新聞でモバゲーの記事を読んだ。",
         "京都大学硬式野球部の試合を見た。",
         "多くの学生が試験に合格した。",
         "我购买了道具和服装。",
         "我购买了道具和服装并于明天交货。",
         "东西已经拿到了"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    ja_tokenize(SENTS[0])          # warm dictionary load
    smartcn_tokenize(SENTS[3])
    s = pd.Series([SENTS[i % len(SENTS)] for i in range(n)])

    def seg(x):
        return (ja_tokenize(x) if any("぀" <= c <= "ヿ" for c in x)
                else smartcn_tokenize(x))

    t0 = time.time()
    base = s.map(seg)
    t_map = time.time() - t0
    t0 = time.time()
    fast = segment_series(s, seg, {})
    t_dedup = time.time() - t0
    assert base.tolist() == fast.tolist(), "parity violation"

    uniq = pd.Series([SENTS[i % len(SENTS)] + f" {i}番" for i in range(500)])
    t0 = time.time()
    bu = uniq.map(seg)
    t_map_u = time.time() - t0
    t0 = time.time()
    fu = segment_series(uniq, seg, {})
    t_dedup_u = time.time() - t0
    assert bu.tolist() == fu.tolist(), "parity violation (unique)"

    print(json.dumps({
        "n_docs": n, "map_sec": round(t_map, 3),
        "dedup_sec": round(t_dedup, 3),
        "speedup": round(t_map / max(t_dedup, 1e-9), 1),
        "unique_map_sec": round(t_map_u, 3),
        "unique_dedup_sec": round(t_dedup_u, 3),
        "unique_overhead": round(t_dedup_u / max(t_map_u, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
