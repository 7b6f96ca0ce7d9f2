"""ClassicTokenizer/ClassicFilter/ClassicAnalyzer (analysis/classic.py)
vs the reference's TestClassicAnalyzer vectors.
"""
import pytest

from lucene_solr_1_spark.analysis.classic import (
    classic_analyze, classic_filter, classic_tokenize)

VECTORS = [
    # alphanumerics / delimiters / underscores
    ("B2B", ["b2b"]), ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    # apostrophes (ClassicFilter strips 's)
    ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]),
    ("she's", ["she"]), ("Jim's", ["jim"]), ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    # single letter + dash (TSA dash), stopword 'a' dropped
    ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
    ("a-class", ["class"]),
    # company names
    ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
    # hosts incl. the LUCENE-1068 trailing-dot ACRONYM_DEP retype
    ("www.nutch.org", ["www.nutch.org"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    # acronyms (dots removed by ClassicFilter)
    ("U.S.A.", ["usa"]),
    # numbers
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    # various text
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
]


@pytest.mark.parametrize("text,expected", VECTORS)
def test_classic_analyzer_vectors(text, expected):
    assert classic_analyze(text) == expected


def test_types_and_acronym_dep_retype():
    assert classic_tokenize("www.nutch.org.", with_types=True) == \
        [("www.nutch.org", "<HOST>")]
    assert classic_tokenize("wbuwb.wb.wbu.", with_types=True) == \
        [("wbuwb.wb.wbu", "<HOST>")]
    assert classic_tokenize("U.S.A.", with_types=True) == \
        [("U.S.A.", "<ACRONYM>")]
    assert classic_tokenize("AT&T", with_types=True) == \
        [("AT&T", "<COMPANY>")]
    assert classic_tokenize("bob@example.com", with_types=True) == \
        [("bob@example.com", "<EMAIL>")]


def test_max_token_length():
    assert classic_analyze("ab cd toolong xy z", max_token_length=5) \
        == ["ab", "cd", "xy", "z"]
    long_term = "a" * 255
    assert classic_analyze(f"ab cd {long_term} xy z") == \
        ["ab", "cd", long_term, "xy", "z"]
    assert classic_analyze(f"ab cd {long_term}a xy z") == \
        ["ab", "cd", "xy", "z"]


def test_classic_filter_type_scoped():
    # dots only removed from <ACRONYM>, not <HOST>/<NUM>
    pairs = [("21.35", "<NUM>"), ("U.S.A.", "<ACRONYM>"),
             ("she's", "<APOSTROPHE>")]
    assert classic_filter(pairs) == \
        [("21.35", "<NUM>"), ("USA", "<ACRONYM>"),
         ("she", "<APOSTROPHE>")]
