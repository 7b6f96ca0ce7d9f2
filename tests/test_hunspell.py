"""Hunspell dictionary stemmer (analysis/hunspell.py) vs the
reference's own HunspellStemmerTest / HunspellStemFilterTest vectors
over its bundled test.aff/test.dic.
"""
import os

import pytest

from lucene_solr_1_spark.analysis.hunspell import (
    HunspellDictionary, HunspellStemmer, hunspell_tokens)

_BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/hunspell/")

_INLINE_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""
_INLINE_DIC = """9
lucen/A
lucene
mahout/A
olr/B
ab/C
Apach/A
Foo/E
foo/D
Moo/E
"""


def _load(ignore_case=False):
    if os.path.exists(_BASE + "test.aff"):
        aff = open(_BASE + "test.aff", encoding="utf-8").read()
        dic = open(_BASE + "test.dic", encoding="utf-8").read()
    else:
        aff, dic = _INLINE_AFF, _INLINE_DIC
    return HunspellStemmer(HunspellDictionary(aff, dic,
                                              ignore_case=ignore_case))


def test_stemmer_reference_vectors():
    """HunspellStemmerTest.testStem_* (case-sensitive)."""
    s = _load()
    assert s.stem("lucene") == ["lucene", "lucen"]
    assert s.stem("mahoute") == ["mahout"]
    assert s.stem("solr") == ["olr"]            # prefix strip
    assert s.stem("abcd") == ["ab"]             # recursive suffix C
    assert s.stem("apache") == []
    assert s.stem("Apache") == ["Apach"]


def test_stemmer_ignore_case_vectors():
    """HunspellStemmerTest.testStem_ignoreCase, incl. the documented
    'Foo rule overridden by foo rule' behavior."""
    s = _load(ignore_case=True)
    assert s.stem("apache") == ["apach"]
    assert s.stem("APACHE") == ["apach"]
    assert s.stem("Apache") == ["apach"]
    assert s.stem("foos") == ["foo"]
    assert s.stem("mood") == ["moo"]
    assert s.stem("Foos") == ["foo"]
    assert s.stem("Food") == []      # foo/D replaced Foo/E: no E flag
    assert s.stem("Mood") == ["moo"]


def test_filter_contract():
    """HunspellStemFilter: first stem replaces, rest stack; unknown
    words pass through (HunspellStemFilterTest.testKeywordAttribute
    analog minus keyword handling, which is the caller's protected
    set)."""
    s = _load()
    assert hunspell_tokens(["lucene", "is", "awesome"], s.d) == \
        ["lucene", "lucen", "is", "awesome"]
    assert hunspell_tokens(["solr"], s.d) == ["olr"]


def test_flag_modes():
    aff_num = "FLAG num\nSFX 65 Y 1\nSFX 65 0 e n\n"
    dic = "1\nlucen/65\n"
    st = HunspellStemmer(HunspellDictionary(aff_num, dic))
    assert st.stem("lucene") == ["lucen"]
    aff_long = "FLAG long\nSFX Aa Y 1\nSFX Aa 0 e n\n"
    dic_long = "1\nlucen/Aa\n"
    st = HunspellStemmer(HunspellDictionary(aff_long, dic_long))
    assert st.stem("lucene") == ["lucen"]
