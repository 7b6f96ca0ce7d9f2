"""ICU normalization twin tests.

- utr30/ICUFoldingFilter: every golden from the reference's
  TestICUFoldingFilter.java:39-74 (the compiled utr30.nrm's own test
  suite), evaluated by our Normalizer2 engine over the shipped
  gennorm2 TEXT sources.
- Engine-level fuzz: the utr30 pipeline is idempotent
  (fold(fold(x)) == fold(x)) and stable under pre-composed vs
  decomposed input — the property the reference relies on for
  index/query-time symmetry.
- nfkc_cf emulation: every golden from TestICUNormalizer2Filter.java.
"""
from __future__ import annotations

import random
import unicodedata

from lucene_solr_1_spark.analysis.icu_norm import (
    icu_fold,
    icu_fold_df,
    icu_normalize,
    utr30_normalizer,
)

# TestICUFoldingFilter.java:39-74 (tokens; tokenization orthogonal)
FOLDING_GOLDENS = [
    ("This", "this"), ("is", "is"), ("a", "a"), ("test", "test"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),                       # supplementary case folding
    ("ﴳﴺﰧ", "طمطمطم"),                # arabic presentation forms
    ("क्‍ष", "कष"),               # default ignorable removal
    ("résumé", "resume"),              # composed accents
    ("résumé", "resume"),  # decomposed accents
    ("৭০৬", "706"),                    # native digit folding
    ("đis", "dis"), ("cræzy", "craezy"),
    ("ELİF", "elif"), ("eli̇f", "elif"),
]

# TestICUNormalizer2Filter.java:42-58 (nfkc_cf default instance)
NFKC_CF_GOLDENS = [
    ("This", "this"), ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μάϊοσ"), ("Μάϊος", "μάϊοσ"),
    ("𐐖", "𐐾"), ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "क्ष"),
]


def test_folding_goldens():
    for inp, expected in FOLDING_GOLDENS:
        assert icu_fold(inp) == expected, (inp, icu_fold(inp), expected)


def test_nfkc_cf_goldens():
    for inp, expected in NFKC_CF_GOLDENS:
        got = icu_normalize(inp, "nfkc_cf")
        assert got == expected, (inp, got, expected)


def test_nfc_nfkc_delegation():
    assert icu_normalize("é", "nfc") == "é"
    assert icu_normalize("ﬁ", "nfkc") == "fi"
    assert icu_normalize("①", "nfkc") == "1"


def test_utr30_idempotent_fuzz():
    n = utr30_normalizer()
    rng = random.Random(314)
    pool = (list(n.mappings.keys()) + list(n.ccc.keys())
            + list(range(0x20, 0x2FF)) + list(range(0x3040, 0x30FF)))
    for _ in range(2000):
        s = "".join(chr(rng.choice(pool)) for _ in range(rng.randint(1, 16)))
        once = icu_fold(s)
        assert icu_fold(once) == once, repr(s)


def test_composed_decomposed_symmetry():
    # NFC input and NFD input must fold identically (query/index symmetry)
    rng = random.Random(2718)
    base = "aeiouncsyzAEIOUNCSYZ"
    marks = ["̀", "́", "̂", "̃", "̈", "̊"]
    for _ in range(500):
        s = "".join(rng.choice(base) + (rng.choice(marks) if rng.random() < .7 else "")
                    for _ in range(rng.randint(1, 10)))
        composed = unicodedata.normalize("NFC", s)
        decomposed = unicodedata.normalize("NFD", s)
        assert icu_fold(composed) == icu_fold(decomposed), repr(s)


def test_hangul_roundtrip():
    n = utr30_normalizer()
    # Hangul syllables survive compose-mode folding intact
    for s in ["한국어", "훈민정음", "가각갃"]:
        assert n.normalize(s) == s


def test_deletion_set():
    # soft hyphen, ZWJ/ZWNJ, variation selectors all removed
    assert icu_fold("a­b") == "ab"
    assert icu_fold("a‍b") == "ab"
    assert icu_fold("a️b") == "ab"


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [("a", "Résumé ΜΆΪΟΣ"), ("b", None)], ["id", "text"])
    out = {r["id"]: r["folded"] for r in icu_fold_df(df, "text").collect()}
    assert out["a"] == "resume μαιοσ"
    assert out["b"] is None
