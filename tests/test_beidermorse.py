"""Beider-Morse phonetic matching (analysis/beidermorse.py).

Oracle: tests/data/bm_vocab.json.gz — input/encoding pairs from
commons-codec's own PhoneticEngine (the exact engine the reference's
BeiderMorseFilter wraps), regenerable via tools/gen_bm_vocab.py.
"""
import gzip
import json
import os

import pytest

from lucene_solr_1_spark.analysis.beidermorse import bm_encode, bm_phonemes
from lucene_solr_1_spark.analysis.phonetic import beider_morse_tokens

_VOCAB = os.path.join(os.path.dirname(__file__), "data",
                      "bm_vocab.json.gz")


@pytest.mark.parametrize("cfg", ["gen_approx", "gen_exact", "ash_approx",
                                 "ash_exact", "sep_approx", "sep_exact"])
def test_bm_vocabulary_parity(cfg):
    with gzip.open(_VOCAB, "rt", encoding="utf-8") as f:
        pairs = json.load(f)[cfg]
    assert len(pairs) > 1000
    nt, rt = cfg.split("_")
    bad = [(w, bm_encode(w, nt, rt), e)
           for w, e in pairs if bm_encode(w, nt, rt) != e]
    assert not bad, bad[:10]


def test_reference_filter_vectors():
    """TestBeiderMorseFilter.java:53-65 (generic, exact): token fan-out
    incl. the D'Angelo prefix split."""
    assert beider_morse_tokens(["Angelo"], "gen", "exact") == \
        ["anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"]
    assert beider_morse_tokens(["D'Angelo"], "gen", "exact") == \
        ["anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo",
         "danZelo", "dandZelo", "dangelo", "danhelo", "danjelo",
         "danxelo"]


def test_reference_language_set_vector():
    """TestBeiderMorseFilter.java:68-86: a forced origin-language set
    restricts the fan-out."""
    langs = frozenset({"italian", "greek", "spanish"})
    assert beider_morse_tokens(["Angelo"], "gen", "exact",
                               languages=langs) == \
        ["andZelo", "angelo", "anxelo"]


def test_numbers_pass_through():
    """TestBeiderMorseFilter.java:89: input yielding no phonemes passes
    through as-is."""
    assert beider_morse_tokens(["1234"], "gen", "exact") == ["1234"]


def test_merge_asymmetry_pinned():
    """The commons-codec LanguageSet.merge asymmetry (ANY.merge(x)=x)
    is observable behavior: 'vgnbah' collapses an unrestricted branch
    into a german-tagged one during the common final pass, which then
    kills the spanish b->v alternative."""
    assert bm_encode("vgnbah", "ash", "approx") == "vgmba|vgmbo"
    # without the leading v+g collision the spanish branch survives
    assert "vmva" in bm_encode("vnbah", "ash", "approx")


def test_leading_pipe_single_empty_alternative():
    """'(|h|f)' parses to exactly three alternatives — Java's split
    keeps the leading empty field and the explicit empty-add fires only
    for a trailing '|' (Rule.parsePhonemeExpr)."""
    from lucene_solr_1_spark.analysis.beidermorse import \
        _parse_phoneme_expr
    assert _parse_phoneme_expr("(|h|f)") == [("", None), ("h", None),
                                             ("f", None)]
    assert _parse_phoneme_expr("(a|)") == [("a", None), ("", None)]
    assert _parse_phoneme_expr("(in[russian]|ina)") == \
        [("in", frozenset({"russian"})), ("ina", None)]


def test_name_prefix_fanout():
    enc = bm_encode("van helsing", "gen", "approx")
    assert enc.startswith("(") and ")-(" in enc
    # sephardic: prefixes dropped, apostrophe keeps last part
    assert bm_encode("abad'hh", "sep", "approx") == \
        bm_encode("hh", "sep", "approx")
