"""Compound-word token filters (analysis/compound.py) vs the
reference's TestCompoundWordTokenFilter vectors, using the same Danish
FOP hyphenation patterns (cached in tests/data, see
tools/gen_hyphenation_patterns.py).
"""
import gzip
import os

import pytest

from lucene_solr_1_spark.analysis.compound import (
    dictionary_compound_tokens, hyphenation_compound_tokens,
    parse_hyphenation_xml)

_XML = os.path.join(os.path.dirname(__file__), "data", "da_UTF8.xml.gz")


@pytest.fixture(scope="module")
def tree():
    with gzip.open(_XML, "rt", encoding="utf-8") as f:
        return parse_hyphenation_xml(f.read())


def test_hyphenation_with_dictionary(tree):
    dic = {"læse", "hest"}
    got = hyphenation_compound_tokens(
        ["min", "veninde", "som", "er", "lidt", "af", "en", "læsehest"],
        tree, dic)
    assert got == ["min", "veninde", "som", "er", "lidt", "af", "en",
                   "læsehest", "læse", "hest"]


def test_hyphenation_longest_match(tree):
    dic = {"basketball", "basket", "ball", "kurv"}
    got = hyphenation_compound_tokens(["basketballkurv"], tree, dic,
                                      max_subword_size=40,
                                      only_longest_match=True)
    assert got == ["basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_no_dictionary(tree):
    got = hyphenation_compound_tokens(["basketballkurv"], tree, None,
                                      min_subword_size=2,
                                      max_subword_size=4)
    assert got == ["basketballkurv", "ba", "sket", "bal", "ball", "kurv"]


def test_dictionary_compound_swedish():
    dic = {"Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"}
    words = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
             "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
             "Skomakare Vindrutetorkare Vindrutetorkarblad abba").split()
    assert dictionary_compound_tokens(words, dic) == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor", "Biltak",
        "Bil", "tak", "Slagborr", "Slag", "borr", "Hammarborr",
        "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral", "Basfiolsfodral",
        "Bas", "fiol", "fodral", "Basfiolsfodralmakaregesäll", "Bas",
        "fiol", "fodral", "makare", "gesäll", "Skomakare", "Sko",
        "makare", "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]


def test_dictionary_compound_longest_match():
    dic = {"Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
           "Fiolsfodral"}
    assert dictionary_compound_tokens(
        ["Basfiolsfodralmakaregesäll"], dic, only_longest_match=True) \
        == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
            "fodral", "makare", "gesäll"]


def test_liang_exceptions_and_short_words(tree):
    # too-short words pass through untouched
    assert hyphenation_compound_tokens(["ab"], tree, None) == ["ab"]
    # non-class characters after letters began -> no decomposition
    assert tree.hyphenate("abc4def") is None
