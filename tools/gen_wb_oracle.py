"""Generate the word-break parity oracle corpus (tests/data/).

Builds a deterministic fuzz corpus that stresses every character class
of the reference StandardTokenizer grammar (mid-joins, ENL bridges,
mark absorption, script runs, class-range boundaries), tokenizes it by
driving the reference's compiled DFA (tools/ref_tokenizer.py), and
caches (text, tokens) pairs to tests/data/wb_oracle_standard.json.gz
so the parity tests run without javac.

Usage: python tools/gen_wb_oracle.py
"""

from __future__ import annotations

import gzip
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.ref_tokenizer import tokenize_many  # noqa: E402
from lucene_solr_1_spark.analysis import wbclasses as wb  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "wb_oracle_standard.json.gz")


def sample_chars(ranges, rng, k):
    out = []
    for _ in range(k):
        a, b = rng.choice(ranges)
        out.append(chr(rng.randint(a, b)))
    return out


def main():
    rng = random.Random(61_2026)

    ascii_l = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
    ascii_d = list("0123456789")
    seps = list(" \t\n-/()\"<>!?@#$%&*+=;~`|{}[]\\")
    midl = [chr(a) for a, b in wb.MIDL_RANGES for _ in range(3)]
    midn = [chr(a) for a, b in wb.MIDN_RANGES for _ in range(3)]
    enl = [chr(a) for a, b in wb.ENL_RANGES for _ in range(3)]

    # class samples (deterministic): every range endpoint + random interiors
    pools = {}
    for name in ("LETTER", "DIGIT", "SEA", "CJK", "HIRAGANA", "KATAKANA",
                 "EXT", "HANGUL"):
        rs = getattr(wb, f"{name}_RANGES")
        pool = [chr(a) for a, b in rs] + [chr(b) for a, b in rs]
        pool += sample_chars(rs, rng, 200)
        pools[name] = pool

    texts = []

    # 1. web-ish English with mid chars (the practical hot cases)
    words = ("the quick brown fox lucene apache org U.S.A don't she's "
             "node1 3.14 1,234 12:30 v2.0.1 a_b __init__ O'Reilly "
             "216.239.63.104 example.com sub.domain.co.uk x").split()
    for _ in range(400):
        n = rng.randint(1, 12)
        texts.append(" ".join(rng.choice(words) for _ in range(n)))

    # 2. adversarial mid/ENL/mark soup around ASCII runs
    alphabet = (ascii_l * 6 + ascii_d * 4 + midl + midn + enl +
                seps * 3 + pools["EXT"][:40])
    for _ in range(1200):
        n = rng.randint(1, 60)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))

    # 3. multi-script soup: every class interleaved
    allpool = []
    for name, pool in pools.items():
        allpool += pool[:220]
    allpool += ascii_l + ascii_d + midl + midn + enl + seps
    for _ in range(1500):
        n = rng.randint(1, 40)
        texts.append("".join(rng.choice(allpool) for _ in range(n)))

    # 4. per-class boundary singles and pairs (every range endpoint in
    #    letter/sep/mid context)
    for name, pool in pools.items():
        for ch in pool[: 2 * len(getattr(wb, f"{name}_RANGES"))]:
            texts.append(ch)
            texts.append(f"a{ch}b 1{ch}2 a{ch} {ch}a")

    # 5. long-token cap behavior (255 skip)
    texts.append("x" * 300)
    texts.append("x" * 255 + " ok " + "y" * 256)

    print(f"{len(texts)} corpus texts; tokenizing with reference DFA ...")
    res = tokenize_many(texts, which="standard", maxlen=255)
    assert len(res) == len(texts)
    recs = [{"text": t, "tokens": toks} for t, toks in zip(texts, res)]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(recs, f, ensure_ascii=False)
    ntok = sum(len(r["tokens"]) for r in recs)
    print(f"wrote {OUT}: {len(recs)} texts, {ntok} oracle tokens")


if __name__ == "__main__":
    main()
