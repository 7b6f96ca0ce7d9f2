"""Phonetic encoders vs the reference's own filter vectors
(ref: lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:
38-64) plus published per-algorithm cases."""

import os

import pytest

from lucene_solr_1_spark.analysis.phonetic import (
    caverphone2, metaphone, phonetic_tokens, refined_soundex, soundex)


def test_reference_filter_vectors_inject_and_replace():
    s = "aaa bbb ccc easgasg".split()
    assert phonetic_tokens(s, "metaphone", True) == \
        ["A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"]
    assert phonetic_tokens(s, "metaphone", False) == \
        ["A", "B", "KKK", "ESKS"]
    assert phonetic_tokens(s, "soundex", True) == \
        ["A000", "aaa", "B000", "bbb", "C000", "ccc", "E220", "easgasg"]
    assert phonetic_tokens(s, "soundex", False) == \
        ["A000", "B000", "C000", "E220"]
    assert phonetic_tokens(s, "refinedsoundex", False) == \
        ["A0", "B1", "C3", "E034034"]
    c = "Darda Karleen Datha Carlene".split()
    assert phonetic_tokens(c, "caverphone2", True) == \
        ["TTA1111111", "Darda", "KLN1111111", "Karleen",
         "TTA1111111", "Datha", "KLN1111111", "Carlene"]
    assert phonetic_tokens(c, "caverphone2", False) == \
        ["TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]


def test_soundex_classic_cases():
    # Russell/Odell + the commons-codec H/W pass-through rule
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"      # H transparent: s,c collapse
    assert soundex("Tymczak") == "T522"
    assert soundex("Washington") == "W252"
    assert soundex("Gutierrez") == "G362"
    assert soundex("Jackson") == "J250"
    assert soundex("") == ""


def test_metaphone_published_phrase():
    got = [metaphone(w) for w in
           "the quick brown fox jumped over the lazy dogs".split()]
    assert got == ["0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS",
                   "TKS"]
    assert metaphone("Thompson") == "0MPS"    # TH->0, H silent after T
    assert metaphone("Knight") == "NT"        # KN- cluster, silent GH
    assert metaphone("Wright") == "RT"        # WR- cluster
    assert metaphone("Xavier") == "SFR"       # X- -> S
    assert metaphone("information", max_len=8) == "INFRMXN"


def test_caverphone2_published_examples():
    # from Hood's revision-2 paper examples
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Thompson") == "TMPSN11111"


def test_refined_soundex_no_cap():
    assert refined_soundex("easgasg") == "E034034"
    assert refined_soundex("braz") == "B1905"


def test_double_metaphone_filter_vectors():
    """The reference's DoubleMetaphoneFilterTest vectors (size 4/8,
    inject on/off, alternate emission, non-convertible passthrough)."""
    from lucene_solr_1_spark.analysis.dmetaphone import (
        double_metaphone, double_metaphone_tokens)
    assert double_metaphone_tokens(["international"], 4, inject=False) \
        == ["ANTR"]
    assert double_metaphone_tokens(["international"], 4, inject=True) \
        == ["international", "ANTR"]
    assert double_metaphone_tokens(["Kuczewski"], 4, inject=False) \
        == ["KSSK", "KXFS"]
    assert double_metaphone_tokens(["international"], 8, inject=False) \
        == ["ANTRNXNL"]
    assert double_metaphone_tokens(["12345", "#$%@#^%&"], 4, True) \
        == ["12345", "#$%@#^%&"]
    assert double_metaphone_tokens(["12345", "#$%@#^%&", "hello"], 8,
                                   inject=False) \
        == ["12345", "#$%@#^%&", "HL"]
    assert double_metaphone(None) == (None, None)
    assert double_metaphone("  ") == (None, None)


def test_double_metaphone_inline_vectors():
    """Published-algorithm landmark cases (primary, alternate)."""
    from lucene_solr_1_spark.analysis.dmetaphone import double_metaphone
    cases = {
        "smith": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
        "jose": ("HS", "HS"), "chemistry": ("KMST", "KMST"),
        "chianti": ("KNT", "KNT"), "school": ("SKL", "SKL"),
        "thomas": ("TMS", "TMS"), "Xavier": ("SF", "SFR"),
        "cabrillo": ("KPRL", "KPR"), "ghislane": ("JLN", "JLN"),
        "island": ("ALNT", "ALNT"), "sugar": ("XKR", "SKR"),
        "filipowicz": ("FLPT", "FLPF"), "zhao": ("J", "J"),
        "dumb": ("TM", "TM"), "edge": ("AJ", "AJ"),
        "edgar": ("ATKR", "ATKR"), "wasserman": ("ASRM", "FSRM"),
    }
    for w, (p, a) in cases.items():
        assert double_metaphone(w) == (p, a), (w, double_metaphone(w))


def test_double_metaphone_jvm_parity(spark):
    """Fuzz parity with commons-codec's DoubleMetaphone on Spark's own
    JVM classpath (the exact encoder DoubleMetaphoneFilter.java wraps):
    english vocabulary sample + random alphabet/punctuation strings, at
    max code lengths 4 and 8."""
    import random
    import zipfile

    from lucene_solr_1_spark.analysis.dmetaphone import double_metaphone

    try:
        dm = spark._jvm.org.apache.commons.codec.language.DoubleMetaphone()
        dm.getMaxCodeLen()
    except Exception:
        pytest.skip("commons-codec not on the JVM classpath")
    zpath = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
             "lucene/analysis/snowball/TestSnowballVocabData.zip")
    words = []
    if os.path.exists(zpath):
        with zipfile.ZipFile(zpath) as z:
            words = z.read("english/voc.txt").decode().split()[:4000]
    rng = random.Random(7)
    fuzz = ["".join(rng.choice("aeiouy bcdfghjklmnpqrstvwxzç'ñ-")
                    for _ in range(rng.randint(1, 14)))
            for _ in range(1500)]
    for maxlen in (4, 8):
        dm.setMaxCodeLen(maxlen)
        for w in words + fuzz:
            assert double_metaphone(w, maxlen) == \
                (dm.doubleMetaphone(w), dm.doubleMetaphone(w, True)), w


def test_double_metaphone_in_phonetic_filter():
    """PhoneticFilter('doublemetaphone') uses the primary code."""
    from lucene_solr_1_spark.analysis.phonetic import phonetic_tokens
    assert phonetic_tokens(["smith", "12345"],
                           encoder="doublemetaphone", inject=True) \
        == ["SM0", "smith", "12345"]
