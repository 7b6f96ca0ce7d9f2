"""Stempel Polish stemmer parity and filter-contract tests.

Oracle: tests/data/stempel_vocab.json.gz — word->stem pairs recorded
from the COMPILED reference Egothor stemmer (org/egothor/stemmer)
running the reference's own stemmer_20000.tbl
(tools/gen_stempel_vocab.py).  Vectors from the reference's
TestPolishAnalyzer.java / TestStempelPolishStemFilterFactory.java.
"""
import gzip
import json
from pathlib import Path

import pytest

from lucene_solr_1_spark.analysis.stempel import (
    polish_analyze, polish_stem, polish_stop_set, stempel_filter_tokens,
    stempel_stem)

DATA = Path(__file__).resolve().parent / "data"


def _vocab() -> dict:
    with gzip.open(DATA / "stempel_vocab.json.gz", "rt",
                   encoding="utf-8") as f:
        return json.load(f)


def test_vocabulary_parity_zero_mismatches():
    pairs = _vocab()
    assert len(pairs) > 50000
    mism = [(w, exp, stempel_stem(w)) for w, exp in pairs.items()
            if stempel_stem(w) != exp]
    assert mism == [], f"{len(mism)} mismatches, first: {mism[:5]}"


def test_null_stems_present_and_kept_by_filter():
    # some fuzz words patch down to nothing; StempelFilter keeps the
    # original term in that case (StempelFilter.java:66 "if we can't
    # stem it, return unchanged")
    nulls = [w for w, s in _vocab().items() if s is None and len(w) > 3]
    assert nulls, "oracle should contain null-stem words"
    out = stempel_filter_tokens(nulls[:20])
    assert out == nulls[:20]


def test_polish_analyzer_basics():
    # ref: TestPolishAnalyzer.java:34-41
    assert polish_analyze("studenta") == ["student"]
    assert polish_analyze("studenci") == ["student"]
    assert polish_analyze("był") == []  # stopword


def test_polish_analyzer_exclusion_set():
    # ref: TestPolishAnalyzer.java:45-50
    excl = {"studenta"}
    assert polish_analyze("studenta", stem_exclusion=excl) == ["studenta"]
    assert polish_analyze("studenci", stem_exclusion=excl) == ["student"]


def test_stem_filter_factory_basics():
    # ref: TestStempelPolishStemFilterFactory.java:33-39 (whitespace
    # tokenizer, no lowercase/stop)
    assert stempel_filter_tokens("studenta studenci".split()) == \
        ["student", "student"]


def test_min_length_gate_is_strict():
    # StempelFilter stems only terms STRICTLY longer than minLength=3
    three = "kot"
    assert stempel_filter_tokens([three]) == [three]
    # length-4 terms do get stemmed
    assert stempel_filter_tokens(["psem"]) != None  # noqa: E711 - smoke
    four = [w for w in _vocab() if len(w) == 4][:50]
    exp = [(_vocab()[w] if _vocab()[w] is not None else w) for w in four]
    assert stempel_filter_tokens(four) == exp


def test_stop_set_loaded():
    stop = polish_stop_set()
    assert "był" in stop and "i" in stop and len(stop) > 100
    assert not any(w.startswith("#") for w in stop)


def test_polish_stem_vocab_registry():
    # the word->word mapper used by stem_vocab/stem_token_lists
    from lucene_solr_1_spark.analysis.stemmer import stem_vocab
    table = stem_vocab(["studenta", "studenci", "kot", "był"],
                       algorithm="polish")
    assert table["studenta"] == "student"
    assert table["studenci"] == "student"
    assert table["kot"] == "kot"  # <= minLength passes through


def test_utf16_astral_input_no_crash():
    # astral chars walk as surrogate pairs like the JVM; must not crash
    # and must round-trip when unstemmed
    w = "ab\U0001F600cd"
    s = stempel_stem(w)
    assert s is None or isinstance(s, str)
