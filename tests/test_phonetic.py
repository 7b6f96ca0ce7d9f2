"""Phonetic encoders vs the reference's own filter vectors
(ref: lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:
38-64) plus published per-algorithm cases."""

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
