"""Word-break parity vs the reference's compiled DFA.

tests/data/wb_oracle_standard.json.gz holds 6,038 corpus texts (36k
tokens: web-ish English, mid/ENL/mark soup, multi-script soup, every
class-range boundary, token-cap edges) tokenized by DRIVING THE
REFERENCE'S GENERATED SCANNER (StandardTokenizerImpl.java compiled
straight from /root/reference — tools/ref_tokenizer.py), so these
tests pin the Python twin (TOKEN_RE) and the JVM twin
(JAVA_TOKEN_PATTERN) to the exact reference automaton: token text,
order, offsets, and types.

Regenerate the oracle with: python tools/gen_wb_oracle.py
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

from lucene_solr_1_spark.analysis.standard import (
    MAX_TOKEN_LENGTH,
    TOKEN_RE,
    token_type,
)

ORACLE = os.path.join(os.path.dirname(__file__), "data",
                      "wb_oracle_standard.json.gz")


def _load():
    with gzip.open(ORACLE, "rt", encoding="utf-8") as f:
        return json.load(f)


def _utf16_prefix(text):
    """Map code-point offsets to UTF-16 offsets (the reference's yychar
    counts Java chars, so astral code points advance it by 2)."""
    u16 = [0]
    for ch in text:
        u16.append(u16[-1] + (2 if ord(ch) > 0xFFFF else 1))
    return u16


def test_python_twin_token_and_offset_parity():
    recs = _load()
    assert len(recs) > 5000
    n_tokens = 0
    for r in recs:
        text = r["text"]
        u16 = _utf16_prefix(text)
        got = [(m.group(0), u16[m.start()])
               for m in TOKEN_RE.finditer(text)
               if len(m.group(0)) <= MAX_TOKEN_LENGTH]
        want = [(t[3], t[1]) for t in r["tokens"]]
        assert got == want, f"mismatch on {text!r}"
        n_tokens += len(want)
    assert n_tokens > 30_000


def test_python_twin_type_parity():
    recs = _load()
    bad = []
    for r in recs:
        toks = [m.group(0) for m in TOKEN_RE.finditer(r["text"])
                if len(m.group(0)) <= MAX_TOKEN_LENGTH]
        want = [t[0] for t in r["tokens"]]
        got = [token_type(t) for t in toks]
        if got != want:
            bad.append((r["text"], got, want))
    assert not bad, bad[:3]


def test_jvm_twin_token_parity(spark):
    from pyspark.sql import functions as F

    from lucene_solr_1_spark.analysis.standard import JAVA_TOKEN_PATTERN
    recs = _load()
    df = spark.createDataFrame(
        [(i, r["text"]) for i, r in enumerate(recs)], "i long, text string")
    rows = df.select(
        "i", F.regexp_extract_all("text", F.lit(JAVA_TOKEN_PATTERN), 0)
        .alias("toks")).collect()
    got = {row["i"]: [t for t in row["toks"] if len(t) <= MAX_TOKEN_LENGTH]
           for row in rows}
    for i, r in enumerate(recs):
        want = [t[3] for t in r["tokens"]]
        assert got[i] == want, f"JVM mismatch on {r['text']!r}"


def test_web_text_mid_joins():
    """The WB6/7/11/12 joins the old subset grammar missed — hostnames,
    acronyms, times, decimals (ref DFA verified live)."""
    cases = {
        "foo.bar lucene.apache.org": ["foo.bar", "lucene.apache.org"],
        "foo:bar 3:30": ["foo:bar", "3", "30"],  # colon joins letters only
        "U.S.A. 21.35 1,234": ["U.S.A", "21.35", "1,234"],
        "2'a foo.2": ["2", "a", "foo", "2"],  # mids never join across types
        "a_b __init__ 1_2 カナ_abc": ["a_b", "__init__", "1_2", "カナ_abc"],
        "a..b a.b.c": ["a", "b", "a.b.c"],  # single mid between runs only
    }
    for text, want in cases.items():
        got = TOKEN_RE.findall(text)
        assert got == want, (text, got, want)


def test_ascii_fast_path_parity(spark):
    """r6: analyze_expr dispatches pure-ASCII rows to the ASCII-restricted
    pattern (derived from the same probed range tables). Pin that the two
    JVM patterns tokenize identically on adversarial + fuzzed ASCII input,
    and that the dispatch expression equals the always-full expression on
    mixed ASCII/non-ASCII rows."""
    import random

    from pyspark.sql import functions as F

    from lucene_solr_1_spark.analysis.standard import (
        ASCII_TOKEN_PATTERN, JAVA_TOKEN_PATTERN, analyze_expr)

    cases = [
        "hello world", "a.b.c", "1,000.5", "it's a test", "a_b_c", "__x__",
        "3.14 and 2,718", "a:b c:d", "'quoted'", "..", "a..b", "1..2",
        "x'y'z", "word_1 2_word", "_", "", " ", "a'", "'a", "1.", ".1",
        "don't:stop won't,go 1;2;3", "_a_1_b_", "A1 1A a1a 1a1",
        "e.g. i.e. etc. U.S.A. 3:30pm", "x" * 300,
        # non-ASCII rows exercise the otherwise-branch of the dispatch
        "カナ_abc mixed", "関西国際空港", "naïve café", "a b",
    ]
    random.seed(7)
    for _ in range(500):
        n = random.randint(0, 30)
        cases.append("".join(random.choice("abAB01_.':,; \t")
                             for _ in range(n)))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    ascii_only = df.filter(F.col("s").rlike("^[\\x00-\\x7F]*$"))
    rows = ascii_only.select(
        F.regexp_extract_all("s", F.lit(JAVA_TOKEN_PATTERN), 0).alias("f"),
        F.regexp_extract_all("s", F.lit(ASCII_TOKEN_PATTERN), 0).alias("a"),
    ).collect()
    assert rows and all(r["f"] == r["a"] for r in rows)
    # end-to-end: the dispatching analyzer == the full-pattern-only chain
    full = F.filter(
        F.transform(F.regexp_extract_all("s", F.lit(JAVA_TOKEN_PATTERN), 0),
                    F.lower),
        lambda t: (F.length(t) <= 255)
        & ~t.isin(*sorted(__import__(
            "lucene_solr_1_spark.analysis.standard",
            fromlist=["ENGLISH_STOP_WORDS"]).ENGLISH_STOP_WORDS)))
    both = df.select(analyze_expr("s").alias("got"),
                     F.coalesce(full, F.array()).alias("want")).collect()
    assert all(r["got"] == r["want"] for r in both)
