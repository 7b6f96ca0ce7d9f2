"""Deterministic Common-Crawl-style webtext fixture generator.

Produces the exact ``input_hint`` shape from BASELINE.json:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generation is **block-deterministic**: doc i's content depends only on
(seed, i), via an RNG seeded per fixed-size block. The same rows come
out whether generated locally in pandas or in parallel on executors via
mapInPandas over a range — so oracle fixtures and Spark bench inputs
are identical by construction (FIXTURES.md; no external data).

Content: ~10k-term Zipf(1.1) vocabulary (real head-term skew, the thing
segment-merge salting exists for), lognormal doc lengths 5..2000 tokens,
stopwords interleaved (StopFilter has work to do), and pinned edge-case
docs at fixed indices (FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_EXP = 1.1
GEN_BLOCK = 2048  # docs per RNG block

_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

_SYL = ["ba", "ra", "ku", "mo", "ti", "sen", "dor", "vel", "mi", "zo",
        "pla", "qui", "fen", "gar", "hul", "jic", "kam", "lor", "nep", "wex"]


def _make_vocab() -> np.ndarray:
    """10k deterministic pseudo-words, rank 0 = most frequent."""
    rng = np.random.default_rng(SEED)
    words = set()
    out = []
    while len(out) < VOCAB_SIZE:
        n = rng.integers(2, 5)
        w = "".join(rng.choice(_SYL) for _ in range(n))
        if w not in words and w not in _STOPWORDS:
            words.add(w)
            out.append(w)
    return np.array(out)


VOCAB = _make_vocab()
_probs = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_EXP
ZIPF_P = _probs / _probs.sum()

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# ---- pinned edge-case docs (FIXTURES.md §1), at these absolute indices ----
_EDGE_BODIES = {
    10: "",                                                # empty body
    11: " ".join(_STOPWORDS),                              # stopword-only
    12: "x" * 256 + " normaltoken " + "y" * 255,           # 256-len dropped, 255 kept
    13: "Foo-Bar, baz's QUUX. mp3 4k x86_64 3.14 2,000",   # case/punct/alnum
    14: " ".join(["tfonce"] + ["tftwo"] * 2 + ["tfmid"] * 127
                 + ["tfblock"] * 128 + ["tfover"] * 129 + ["tfbig"] * 300),
    15: "Café naïve coöperate résumé 日本語 中文搜索",        # pinned unicode
    16: "tieterm alpha beta gamma delta",                  # near-tie pair:
    17: "tieterm alpha beta gamma delta",                  # identical bodies
}


_ZIPF_CDF = np.cumsum(ZIPF_P)


def _zipf_draw(rng: np.random.Generator, n: int) -> np.ndarray:
    """Vectorized Zipf vocab-id draw via inverse CDF."""
    return np.searchsorted(_ZIPF_CDF, rng.random(n), side="right").clip(0, VOCAB_SIZE - 1)


def _doc_batch(indices: np.ndarray) -> pd.DataFrame:
    """Generate docs for any set of absolute indices.

    All randomness for a block is drawn in one fixed whole-block pass, so
    the rows are identical no matter which subset of the block is asked
    for — local and Spark-parallel generation agree byte-for-byte.
    """
    urls, htmls, texts, langs, tss = [], [], [], [], []
    indices = np.asarray(indices, dtype=np.int64)
    for block_start in np.unique(indices // GEN_BLOCK) * GEN_BLOCK:
        block_idx = indices[(indices >= block_start) & (indices < block_start + GEN_BLOCK)]
        rng = np.random.default_rng((SEED, int(block_start)))
        # fixed draw order for the whole block (subset-independent):
        lens = np.clip(np.round(rng.lognormal(4.2, 0.9, GEN_BLOCK)), 5, 2000).astype(np.int64)
        lang_draw = rng.random(GEN_BLOCK)
        title_ids = _zipf_draw(rng, GEN_BLOCK * 3).reshape(GEN_BLOCK, 3)
        total = int(lens.sum())
        tok_ids = _zipf_draw(rng, total)
        stop_mask = rng.random(total) < 0.18
        stop_pick = rng.integers(0, len(_STOPWORDS), total)
        doc_ends = np.cumsum(lens)
        doc_starts = doc_ends - lens

        # body assembly: stopwords become standalone stream elements (the
        # joined text is identical to prefix-concatenation, with no bulk
        # np.char string ops); only the ~10% suffixed tokens are touched.
        toks = VOCAB[tok_ids].astype(object)
        pos_in_doc = np.arange(total) - np.repeat(doc_starts, lens)
        dot_m = pos_in_doc % 13 == 12
        nl_m = (pos_in_doc % 37 == 36) & (pos_in_doc != lens.repeat(lens) - 1)
        for idx in np.flatnonzero(dot_m):
            toks[idx] += "."
        for idx in np.flatnonzero(nl_m):
            toks[idx] += "\n"
        c = np.cumsum(stop_mask)
        stream = np.empty(total + int(c[-1] if total else 0), dtype=object)
        tok_pos = np.arange(total) + c
        stream[tok_pos] = toks
        stop_at = np.flatnonzero(stop_mask)
        stream[tok_pos[stop_at] - 1] = np.array(_STOPWORDS, dtype=object)[stop_pick[stop_at]]
        s_start = doc_starts + c[doc_starts] - stop_mask[doc_starts]
        s_end = doc_ends - 1 + c[doc_ends - 1] + 1

        for i in block_idx:
            off = int(i - block_start)
            title = " ".join(VOCAB[title_ids[off]]).title()
            if int(i) in _EDGE_BODIES:
                body = _EDGE_BODIES[int(i)]
            else:
                body = " ".join(stream[s_start[off]:s_end[off]].tolist())
                body = body.replace("\n ", "\n")
            text = title + "\n" + body
            html = (
                "<html><head><title>" + title + "</title><style>x{}</style></head>"
                "<body><script>var a=1;</script>" + body + "</body></html>"
            ).encode("utf-8")
            ld = lang_draw[off]
            lang = "en" if ld < 0.95 else ("de" if ld < 0.975 else "fr")
            urls.append(f"https://site{int(i) % 97:02d}.example/p/{int(i):010d}")
            htmls.append(html)
            texts.append(text)
            langs.append(lang)
            tss.append(_EPOCH + dt.timedelta(seconds=int(i) * 137))
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def gen_docs(n_docs: int, start: int = 0) -> pd.DataFrame:
    """Generate docs [start, start+n_docs) as a pandas DataFrame."""
    return _doc_batch(np.arange(start, start + n_docs))


def gen_docs_spark(spark, n_docs: int, parallelism: int | None = None):
    """Distributed generation: same rows as gen_docs, built on executors."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    rng_df = spark.range(0, n_docs, 1, parallelism or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _doc_batch(pdf["id"].to_numpy())

    return rng_df.mapInPandas(gen, schema=schema)


def gen_queries() -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): 60 queries over the fixture
    vocab — head/tail single terms, OR/AND/MSM2 mixes, absent term,
    stopword-only (empty after analysis)."""
    rng = np.random.default_rng((SEED, 999))
    rows = []
    qid = 1

    def add(clauses, op="OR", k=10):
        nonlocal qid
        rows.append({"qid": qid, "clauses": list(clauses), "op": op, "k": k})
        qid += 1

    heads = VOCAB[:20]
    mids = VOCAB[100:1000]
    tails = VOCAB[5000:]
    for t in heads[:6]:
        add([t])
    for t in rng.choice(tails, 6, replace=False):
        add([t])
    for _ in range(14):
        n = int(rng.integers(2, 6))
        cl = [str(rng.choice(heads))] + [str(x) for x in rng.choice(mids, n - 1, replace=False)]
        add(cl, "OR")
    for _ in range(12):
        cl = [str(x) for x in rng.choice(mids, 2, replace=False)]
        add(cl, "AND")
    for _ in range(8):
        cl = [str(x) for x in rng.choice(mids, 3, replace=False)]
        add(cl, "MSM2")
    add(["zzzznotinthecorpus"])
    add(["the", "and", "of"])                      # all stopwords -> 0 hits
    add(["tieterm"])                               # near-tie pair, docid tie-break
    add(["tfbig", "tfblock"], "OR")                # block-boundary tfs
    for _ in range(60 - qid + 1):
        cl = [str(rng.choice(heads)), str(rng.choice(tails))]
        add(cl, "OR")
    return pd.DataFrame(rows)
