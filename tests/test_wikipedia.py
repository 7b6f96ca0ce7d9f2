"""WikipediaTokenizer parity tests.

Goldens transcribed from the reference's own WikipediaTokenizerTest
(terms, types, offsets, position increments, flags, all three output
modes) plus full-stream scanner parity against the compiled reference
scanner over a cached fuzz corpus
(tests/data/wikipedia_oracle.json.gz — regenerate with
python tools/gen_wikipedia_oracle.py).
"""

from __future__ import annotations

import gzip
import json
import os

from lucene_solr_1_spark.analysis.wikipedia import (
    BOTH,
    CATEGORY,
    EXTERNAL_LINK,
    EXTERNAL_LINK_URL,
    INTERNAL_LINK,
    ITALICS,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    WikipediaTokenizer,
    scan,
)

ORACLE = os.path.join(os.path.dirname(__file__), "data",
                      "wikipedia_oracle.json.gz")

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] [[Category:a b c d]]")


def test_simple():
    toks = WikipediaTokenizer().tokenize("This is a [[Category:foo]]")
    assert [t.term for t in toks] == ["This", "is", "a", "foo"]
    assert [t.start for t in toks] == [0, 5, 8, 21]
    assert [t.end for t in toks] == [4, 7, 9, 24]
    assert [t.type for t in toks] == \
        ["<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", CATEGORY]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1]


def test_link_phrases_and_lucene1133_tokens_only():
    # identical regardless of untokenizedTypes in TOKENS_ONLY mode
    for untoks in (None, {CATEGORY, ITALICS}):
        toks = WikipediaTokenizer(TOKENS_ONLY, untoks).tokenize(LINK_PHRASES)
        assert [t.term for t in toks] == [
            "click", "link", "here", "again", "click",
            "http://lucene.apache.org", "here", "again", "a", "b", "c", "d"]
        assert [t.pos_inc for t in toks] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here] "
            "[http://lucene.apache.org/java/docs/index.html?b=c here] "
            "[https://lucene.apache.org/java/docs/index.html?b=c here]")
    toks = WikipediaTokenizer().tokenize(test)
    assert [t.term for t in toks] == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here"]
    assert [t.type for t in toks] == [EXTERNAL_LINK_URL, EXTERNAL_LINK] * 3


def test_handwritten():
    test = ("[[link]] This is a [[Category:foo]] Category  This is a linked "
            "[[:Category:bar none withstanding]] "
            "Category This is (parens) This is a [[link]]  This is an external URL "
            "[http://lucene.apache.org] "
            "Here is ''italics'' and ''more italics'', '''bold''' and "
            "'''''five quotes''''' "
            " This is a [[link|display info]]  This is a period.  Here is $3.25 "
            "and here is 3.50.  Here's Johnny.  "
            "==heading== ===sub head=== followed by some text  [[Category:blah| ]] "
            "''[[Category:ital_cat]]''  here is some that is ''italics "
            "[[Category:foo]] but is never closed."
            "'''same [[Category:foo]] goes for this '''''and2 [[Category:foo]] "
            "and this"
            " [http://foo.boo.com/test/test/ Test Test] "
            "[http://foo.boo.com/test/test/test.html Test Test]"
            " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
            "<ref>Citation</ref> <sup>martian</sup> <span class=\"glue\">code</span>")
    toks = WikipediaTokenizer().tokenize(test)
    assert [t.term for t in toks] == [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This", "is",
        "parens", "This", "is", "a", "link", "This", "is", "an", "external",
        "URL", "http://lucene.apache.org", "Here", "is", "italics", "and",
        "more", "italics", "bold", "and", "five", "quotes", "This", "is",
        "a", "link", "display", "info", "This", "is", "a", "period", "Here",
        "is", "3.25", "and", "here", "is", "3.50", "Here's", "Johnny",
        "heading", "sub", "head", "followed", "by", "some", "text", "blah",
        "ital", "cat", "here", "is", "some", "that", "is", "italics", "foo",
        "but", "is", "never", "closed", "same", "foo", "goes", "for",
        "this", "and2", "foo", "and", "this",
        "http://foo.boo.com/test/test/", "Test", "Test",
        "http://foo.boo.com/test/test/test.html", "Test", "Test",
        "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test", "Test",
        "Citation", "martian", "code"]
    assert [t.type for t in toks] == [
        INTERNAL_LINK, "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", CATEGORY,
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", CATEGORY, CATEGORY, CATEGORY, "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", INTERNAL_LINK, "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        EXTERNAL_LINK_URL, "<ALPHANUM>", "<ALPHANUM>", ITALICS,
        "<ALPHANUM>", ITALICS, ITALICS, "b", "<ALPHANUM>", "bi", "bi",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", INTERNAL_LINK,
        INTERNAL_LINK, INTERNAL_LINK, "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<APOSTROPHE>",
        "<ALPHANUM>", "h", "sh", "sh", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", CATEGORY, CATEGORY, CATEGORY,
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", ITALICS, CATEGORY, "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "b", CATEGORY, "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "bi", CATEGORY, "<ALPHANUM>",
        "<ALPHANUM>", EXTERNAL_LINK_URL, EXTERNAL_LINK, EXTERNAL_LINK,
        EXTERNAL_LINK_URL, EXTERNAL_LINK, EXTERNAL_LINK,
        EXTERNAL_LINK_URL, EXTERNAL_LINK, EXTERNAL_LINK, "ci",
        "<ALPHANUM>", "<ALPHANUM>"]


def test_lucene1133_untokenized_only():
    untoks = {CATEGORY, ITALICS}
    test = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
            "[[link there]] ''italics here'' something ''more italics'' "
            "[[Category:h   i   j]]")
    toks = WikipediaTokenizer(UNTOKENIZED_ONLY, untoks).tokenize(test)
    assert [t.term for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in toks] == [11, 32, 42, 47, 56, 61, 71, 86, 98, 124]
    assert [t.end for t in toks] == [18, 37, 46, 51, 60, 66, 83, 95, 110, 133]
    assert [t.pos_inc for t in toks] == [1] * 10


def test_both():
    untoks = {CATEGORY, ITALICS}
    test = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
            "[[link there]] ''italics here'' something ''more italics'' "
            "[[Category:h   i   j]]")
    toks = WikipediaTokenizer(BOTH, untoks).tokenize(test)
    assert [t.term for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t.start for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert [t.pos_inc for t in toks] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1]
    assert [t.flags for t in toks] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0,
        0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0]


def test_scanner_fuzz_parity():
    with gzip.open(ORACLE, "rt", encoding="utf-8") as f:
        recs = json.load(f)
    assert len(recs) >= 5000
    for r in recs:
        toks, _ = scan(r["text"])
        got = [(t.type, t.start, t.text, t.pos_inc) for t in toks]
        want = [(t[0], t[1], t[3], t[4]) for t in r["tokens"]]
        assert got == want, f"mismatch on {r['text']!r}"
