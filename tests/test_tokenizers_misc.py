"""Misc tokenizers/filters (analysis/tokenizers.py) vs the reference's
test expectations.
"""
from lucene_solr_1_spark.analysis.tokenizers import (
    edge_ngram_filter, edge_ngram_tokenize, letter_tokenize,
    lowercase_tokenize, ngram_filter, ngram_tokenize,
    numeric_payloads, path_hierarchy_tokenize, pattern_capture_group,
    pattern_replace_charfilter, persian_charfilter,
    reverse_path_hierarchy_tokenize, token_offset_payloads,
    type_payloads, whitespace_tokenize)


def test_core_tokenizers():
    assert letter_tokenize("ab12 cd-ef") == ["ab", "cd", "ef"]
    assert whitespace_tokenize(" a  b\tc\n") == ["a", "b", "c"]
    assert lowercase_tokenize("FooBar 12baz") == ["foobar", "baz"]


def test_ngram_44_order():
    """NGramTokenFilterTest (4.4): position-outer, size-inner."""
    assert ngram_filter(["abcde"], 1, 3) == [
        "a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde",
        "d", "de", "e"]
    assert ngram_filter(["ab"], 3, 5) == []          # LengthFilter wrap
    assert ngram_tokenize("abc", 1, 2) == ["a", "ab", "b", "bc", "c"]
    assert edge_ngram_filter(["abcde"], 1, 3) == ["a", "ab", "abc"]
    assert edge_ngram_tokenize("abcde", 2, 3) == ["ab", "abc"]


def test_path_hierarchy_reference_vectors():
    f = path_hierarchy_tokenize
    assert f("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert f("/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert f("a/b/c") == ["a", "a/b", "a/b/c"]
    assert f("/") == ["/"]
    assert f("//") == ["/", "//"]
    assert f("/a/b/c", replacement="\\") == ["\\a", "\\a\\b", "\\a\\b\\c"]
    assert f("c:\\a\\b\\c", delimiter="\\", replacement="\\") == \
        ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]
    assert f("/a/b/c", skip=1) == ["/b", "/b/c"]
    assert f("/a/b/c/", skip=1) == ["/b", "/b/c", "/b/c/"]


def test_reverse_path_hierarchy_reference_vectors():
    r = reverse_path_hierarchy_tokenize
    assert r("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]
    assert r("/a/b/c/") == ["/a/b/c/", "a/b/c/", "b/c/", "c/"]
    assert r("a/b/c") == ["a/b/c", "b/c", "c"]
    assert r("/") == ["/"]
    assert r("//") == ["//", "/"]
    assert r("/a/b/c/", skip=1) == ["/a/b/", "a/b/", "b/"]
    assert r("a/b/c", skip=1) == ["a/b/", "b/"]
    assert r("a/b/c/", skip=1) == ["a/b/", "b/"]
    assert r("/", skip=1) == []


def test_pattern_capture_group_reference_vectors():
    """TestPatternCaptureGroupTokenFilter.testCamelCase: min-start
    merge across patterns."""
    pats = ["([A-Z]{2,})", "(?<![A-Z])([A-Z][a-z]+)",
            r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", "([0-9]+)"]
    assert pattern_capture_group(["letsPartyLIKEits1999_dude"], pats) \
        == ["lets", "Party", "LIKE", "its", "1999", "dude"]
    assert pattern_capture_group(["letsPartyLIKEits1999_dude"], pats,
                                 preserve_original=True) == \
        ["letsPartyLIKEits1999_dude", "lets", "Party", "LIKE", "its",
         "1999", "dude"]
    assert pattern_capture_group(["foobarbaz"], []) == ["foobarbaz"]
    assert pattern_capture_group(["foobarbaz"], ["((..)(..))"]) == \
        ["foob", "fo", "ob", "arba", "ar", "ba"]


def test_charfilters():
    assert persian_charfilter("می‌خورد") == "می خورد"
    assert pattern_replace_charfilter("aa bb aa", "aa", "x") == "x bb x"


def test_payload_filters():
    toks = token_offset_payloads(["ab", "cde"])
    assert toks[0] == ("ab", (0).to_bytes(4, "big") +
                       (2).to_bytes(4, "big"))
    assert toks[1][1][-4:] == (6).to_bytes(4, "big")
    assert type_payloads([("x", "<NUM>")]) == [("x", b"<NUM>")]
    import struct
    out = numeric_payloads([("a", "<ALPHANUM>"), ("1", "<NUM>")],
                           3.0, "<NUM>")
    assert out[0][1] is None
    assert struct.unpack(">f", out[1][1])[0] == 3.0
