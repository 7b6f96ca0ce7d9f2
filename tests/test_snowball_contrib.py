"""Contributed Snowball stemmers (analysis/snowball2.py): Armenian,
Basque, Catalan, Irish — the last four of the reference's 23 tartarus
languages.

Oracle: tests/data/snowball_contrib_vocab.json.gz, word/stem pairs
produced by compiling and running the reference's own generated
stemmers over a deterministic fuzz vocabulary exercising every among
entry (tools/gen_snowball_contrib_vocab.py).
"""
import gzip
import json
import os

import pytest

from lucene_solr_1_spark.analysis.snowball2 import (
    armenian_stem, basque_stem, catalan_stem, irish_stem)

_FNS = {"armenian": armenian_stem, "basque": basque_stem,
        "catalan": catalan_stem, "irish": irish_stem}
_VOCAB = os.path.join(os.path.dirname(__file__), "data",
                      "snowball_contrib_vocab.json.gz")


@pytest.mark.parametrize("lang", sorted(_FNS))
def test_contrib_vocabulary_parity(lang):
    with gzip.open(_VOCAB, "rt", encoding="utf-8") as f:
        pairs = json.load(f)[lang]
    assert len(pairs) > 5000
    fn = _FNS[lang]
    bad = [(w, fn(w), e) for w, e in pairs if fn(w) != e]
    assert not bad, bad[:20]


def test_irish_inline_vectors():
    """Spec-traced: initial-mutation strip/restore BEFORE region marks,
    then noun/deriv/verb suffix steps (IrishStemmer.java:229,378)."""
    cases = {
        "bhfear": "fear",        # eclipsis bhf -> f
        "gcarraig": "carraig",   # eclipsis gc -> c
        "n-athair": "athair",    # h-/n-/t- prosthesis dropped
        "d'fhuascail": "fuascail",  # d'fh -> f
        "séimhiú": "séimhiú",    # no rule fires
        "imíodar": "imíodar",
        "beannachta": "beannachta",  # achta needs R1
    }
    for w, e in cases.items():
        assert irish_stem(w) == e, (w, irish_stem(w), e)


def test_catalan_inline_vectors():
    """Spec-traced: accent cleaning, -ment/-itat style derivational
    strips in R1/R2, attached pronouns (CatalanStemmer.java:13)."""
    # cleaning always folds accents, even when no suffix fires
    assert catalan_stem("caminàvem").endswith("caminav") or \
        "à" not in catalan_stem("caminàvem")
    assert "·" not in catalan_stem("col·legi")


def test_basque_repeat_carries_cut_point():
    """Snowball repeat() leaves the cursor at the cut point: after a
    slice_from replacement the replacement text itself is not
    re-matched (BasqueStemmer.java stem(): repeat aditzak/izenak)."""
    # 'tra' replacement terminates the izenak loop even though 'tra'
    # itself ends in 'a' (a table suffix): matching continues at the
    # cut point, not the new end.
    from lucene_solr_1_spark.analysis._snowball_contrib_tables import DATA
    assert any(a == ("from", "tra")
               for _, a in DATA["basque"]["routines"]["r_izenak"]
               ["cases"].values())


def test_registered_in_stem_vocab():
    from lucene_solr_1_spark.analysis.stemmer import stem_vocab
    assert stem_vocab(["bhfear"], algorithm="irish") == {"bhfear": "fear"}
    assert stem_vocab(["gcarraig"], algorithm="snowball_irish") == \
        {"gcarraig": "carraig"}
