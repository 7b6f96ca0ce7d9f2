# Morfologik grammar tests. The shipped polish.dict is absent from the
# reference snapshot, so the dictionary here is reconstructed from the
# surface->lemma/tag facts the reference's own test expectations pin
# (lucene/analysis/morfologik/src/test/.../TestMorfologikAnalyzer.java);
# the filter must reproduce those token streams exactly, including
# lemma order (FSA byte order of the suffix-coded entries).
import pytest

from lucene_solr_1_spark.analysis.morfologik import (
    FSA5, DictionaryMetadata, MorfDictionary, decode_stem, encode_stem,
    morfologik_filter, serialize_fsa5)

# facts from TestMorfologikAnalyzer.java:47-160
ENTRIES = [
    ("liście", "liście", "subst:sg:acc:n2"),
    ("liście", "liście", "subst:sg:nom:n2"),
    ("liście", "liście", "subst:sg:voc:n2"),
    ("liście", "liść", "subst:pl:acc:m3"),
    ("liście", "liść", "subst:pl:nom:m3"),
    ("liście", "liść", "subst:pl:voc:m3"),
    ("liście", "list", "subst:sg:loc:m3"),
    ("liście", "list", "subst:sg:voc:m3"),
    ("liście", "lista", "subst:sg:dat:f"),
    ("liście", "lista", "subst:sg:loc:f"),
    ("danych", "dany", "adj:pl:gen:m1.m2.m3.f.n1.n2:pos"),
    ("danych", "dana", "subst:pl:gen:f"),
    ("danych", "dane", "subst:pl:gen:n2"),
    ("danych", "dać", "verb:praet:pl"),
    ("t", "to", "conj"),
    ("t", "tom", "brev:pun"),
    ("t", "tona", "brev:pun"),
    ("AGD", "AGD", "brev:npun"),
    ("AGD", "artykuły gospodarstwa domowego", "brev:pun"),
    ("agd", "artykuły gospodarstwa domowego", "brev:pun"),
    ("Poznania", "Poznań", "subst:sg:gen:m3"),
    ("poznania", "poznanie", "subst:sg:gen:n2"),
    ("poznania", "poznać", "ger:sg:gen:n2:perf:aff"),
    ("Aarona", "Aaron", "subst:sg:gen:m1"),
]


@pytest.fixture(scope="module")
def dic():
    return MorfDictionary.build(ENTRIES)


def analyze(dic, tokens, keywords=None):
    return [t for t, _pi, _tags in
            morfologik_filter(tokens, dic, keywords)]


# ------------------------------------------------- FSA5 container

def test_fsa5_roundtrip_random():
    import random
    rng = random.Random(42)
    seqs = sorted({bytes(rng.randrange(1, 256)
                         for _ in range(rng.randrange(1, 12)))
                   for _ in range(300)})
    fsa = FSA5(serialize_fsa5(seqs))
    assert fsa.completions(fsa.root) == seqs


def test_fsa5_walk():
    fsa = FSA5(serialize_fsa5([b"cat", b"cats", b"car"]))
    assert fsa.walk(fsa.root, b"ca") is not None
    assert fsa.walk(fsa.root, b"dog") is None
    assert sorted(fsa.completions(fsa.root)) == [b"car", b"cat", b"cats"]


def test_stem_codec_all_modes():
    cases = [(b"danych", b"dany"), ("liście".encode(), "liść".encode()),
             (b"AGD", "artykuły gospodarstwa domowego".encode()),
             (b"abc", b"abc"), (b"abc", b"")]
    for meta in (DictionaryMetadata(),
                 DictionaryMetadata(uses_prefixes=True),
                 DictionaryMetadata(uses_infixes=True)):
        for infl, stem in cases:
            enc = encode_stem(infl, stem, meta)
            assert decode_stem(infl, enc, meta) == stem, (infl, stem)


# ------------------------------------------------- reference vectors

def test_single_tokens(dic):
    assert analyze(dic, ["a"]) == ["a"]
    assert analyze(dic, ["liście"]) == ["liście", "liść", "list", "lista"]
    assert analyze(dic, ["danych"]) == ["dany", "dana", "dane", "dać"]
    assert analyze(dic, ["ęóąśłżźćń"]) == ["ęóąśłżźćń"]


def test_multiple_tokens_and_posincs(dic):
    out = morfologik_filter(["liście", "danych"], dic)
    assert [t for t, _, _ in out] == [
        "liście", "liść", "list", "lista", "dany", "dana", "dane", "dać"]
    assert [pi for _, pi, _ in out] == [1, 0, 0, 0, 1, 0, 0, 0]


def test_t_glucksberg(dic):
    out = morfologik_filter(["T", "Glücksberg"], dic)
    assert [t for t, _, _ in out] == ["to", "tom", "tona", "Glücksberg"]
    assert [pi for _, pi, _ in out] == [1, 0, 0, 1]


def test_case_sensitivity(dic):
    assert analyze(dic, ["AGD"]) == [
        "AGD", "artykuły gospodarstwa domowego"]
    assert analyze(dic, ["agd"]) == ["artykuły gospodarstwa domowego"]
    assert analyze(dic, ["Poznania"]) == ["Poznań"]
    assert analyze(dic, ["poznania"]) == ["poznanie", "poznać"]
    assert analyze(dic, ["Aarona"]) == ["Aaron"]
    assert analyze(dic, ["aarona"]) == ["aarona"]
    # miss on exact, hit on lowercased (MorfologikFilter.java:142)
    assert analyze(dic, ["Liście"]) == ["liście", "liść", "list", "lista"]


def test_pos_tags(dic):
    out = morfologik_filter(["liście"], dic)
    tags = {t: set(tg) for t, _, tg in out}
    assert tags["liście"] == {"subst:sg:acc:n2", "subst:sg:nom:n2",
                              "subst:sg:voc:n2"}
    assert tags["liść"] == {"subst:pl:acc:m3", "subst:pl:nom:m3",
                            "subst:pl:voc:m3"}
    assert tags["list"] == {"subst:sg:loc:m3", "subst:sg:voc:m3"}
    assert tags["lista"] == {"subst:sg:dat:f", "subst:sg:loc:f"}


def test_keyword_attr(dic):
    # TestMorfologikAnalyzer.testKeywordAttrTokens: keyword-marked
    # "liście" passes through; "danych" still lemmatizes
    out = analyze(dic, ["liście", "danych"], keywords=frozenset(["liście"]))
    assert out == ["liście", "dany", "dana", "dane", "dać"]


def test_separator_in_word(dic):
    assert analyze(dic, ["a+b"]) == ["a+b"]


def test_prefix_mode_dictionary():
    meta = DictionaryMetadata(uses_prefixes=True)
    d = MorfDictionary.build(
        [("najlepszy", "dobry", "adj:sup"), ("kota", "kot", "subst")],
        meta)
    assert d.lookup("kota") == [("kot", "subst")]
    assert d.lookup("najlepszy") == [("dobry", "adj:sup")]
