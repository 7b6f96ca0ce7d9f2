"""C4 line/page rules + global three-sentence-span dedup vs brute-force
Python oracles (Raffel et al. 2020 §2.2 semantics as documented in
datapipe/c4.py)."""

import re

import pytest

from lucene_solr_1_spark.datapipe.c4 import (
    TERMINAL_PUNCT, c4_line_filter, span_dedup)

DOCS = [
    (0, "This is a perfectly fine first sentence.\n"
        "short line\n"
        "Another good line with enough words here.\n"
        "A third proper sentence closes the page out.\n"
        "And a fourth one for good measure today."),
    (1, "Enable javascript to view this page properly.\n"
        "Only one good sentence lives on this page here."),
    (2, "This page contains lorem ipsum filler text somewhere inside.\n"
        "It still has quite a few proper sentences in it.\n"
        "Three of them, to be exact, right here."),
    (3, "function() { return 42; }\n"
        "A sentence that would otherwise be acceptable here today.\n"
        "Another one follows it as well, naturally.\n"
        "And a third to pass the sentence count."),
    (4, ""),
]


def py_line_filter(t, min_words=5, min_sents=3):
    lines = [l for l in t.split("\n") if l.strip()]
    kept = []
    for l in lines:
        r = l.rstrip()
        if (r and r[-1] in TERMINAL_PUNCT
                and len([w for w in re.split(r"\s+", l) if w]) >= min_words
                and not re.search(r"\bjavascript\b", l.lower())):
            kept.append(l)
    clean = "\n".join(kept)
    sents = [s for s in re.split(r"[.!?]+", clean) if s.strip()]
    ok = (len(sents) >= min_sents
          and "lorem ipsum" not in t.lower()
          and "{" not in t)
    return clean, len(kept), int(ok)


def test_line_filter_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    for did, t in DOCS:
        clean, nk, ok = py_line_filter(t)
        g = got[did]
        assert g["clean_text"] == clean, (did, g["clean_text"], clean)
        assert g["n_lines_kept"] == nk
        assert g["c4_ok"] == ok, (did, g["c4_ok"], ok)


def py_span_dedup(docs, span=3):
    # corpus-first (doc, pos) occurrence of each span hash wins
    first, counts = {}, {}
    for did, sents in docs:
        for p in range(len(sents) - span + 1):
            k = tuple(sents[p:p + span])
            counts[k] = counts.get(k, 0) + 1
            first.setdefault(k, (did, p))
    out = {}
    for did, sents in docs:
        rm = set()
        for p in range(len(sents) - span + 1):
            k = tuple(sents[p:p + span])
            if counts[k] > 1 and first[k] != (did, p):
                rm.update(range(p, p + span))
        out[did] = ([s for i, s in enumerate(sents) if i not in rm],
                    len(sents), len(rm))
    return out


SPAN_DOCS = [
    (0, ["a", "b", "c", "d", "e"]),
    (1, ["x", "a", "b", "c", "y"]),          # contains dup span a,b,c
    (2, ["a", "b", "c", "a", "b", "c"]),     # internal repeat
    (3, ["unique", "sentences", "only", "here"]),
    (4, ["a", "b"]),                          # shorter than span
]


def test_span_dedup_matches_oracle(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, sentences array<string>")
    got = {r["doc_id"]: r for r in span_dedup(df).collect()}
    exp = py_span_dedup(SPAN_DOCS)
    for did, (kept, ns, nrm) in exp.items():
        g = got[did]
        assert g["kept_sentences"] == kept, (did, g["kept_sentences"], kept)
        assert g["n_sentences"] == ns
        assert g["n_removed"] == nrm


def test_span_dedup_fuzz(spark):
    import random
    rng = random.Random(7)
    docs = [(i, [rng.choice("abcdefg") for _ in range(rng.randint(0, 12))])
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, sentences array<string>")
    got = {r["doc_id"]: r for r in span_dedup(df).collect()}
    exp = py_span_dedup(docs)
    for did, (kept, ns, nrm) in exp.items():
        g = got[did]
        assert g["kept_sentences"] == kept, did
        assert (g["n_sentences"], g["n_removed"]) == (ns, nrm)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, sentences array<string>")
    plan = span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
