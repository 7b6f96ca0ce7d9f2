"""UAX29URLEmailTokenizer parity tests.

Golden cases from TestUAX29URLEmailTokenizer.java plus the cached
full-token-stream oracle (tests/data/urlemail_oracle.json.gz —
reference corpora + multi-script stress texts tokenized by the
reference's compiled DFA; regenerate: python tools/gen_urlemail_oracle.py).
"""

from __future__ import annotations

import gzip
import json
import os

from lucene_solr_1_spark.analysis.urlemail import (
    EMAIL_TYPE,
    TOKEN_TYPES,
    URL_TYPE,
    analyze,
    tokenize,
)

ORACLE = os.path.join(os.path.dirname(__file__), "data",
                      "urlemail_oracle.json.gz")


def terms(text):
    return [t.term for t in tokenize(text)]


def test_golden_sa_behavior():
    # TestUAX29URLEmailTokenizer.java:206-252 (SA-equivalent sections)
    assert terms("B2B") == ["B2B"]
    assert terms("2B") == ["2B"]
    assert terms("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert terms("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert terms("ac/dc") == ["ac", "dc"]
    assert terms("O'Reilly's") == ["O'Reilly's"]
    assert terms("21.35") == ["21.35"]
    assert terms("R2D2 C3PO") == ["R2D2", "C3PO"]
    assert terms("216.239.63.104") == ["216.239.63.104"]
    assert terms("David has 5000 bones") == ["David", "has", "5000", "bones"]
    assert terms("안녕하세요 한글입니다") == ["안녕하세요", "한글입니다"]
    assert terms("") == []
    assert terms(".") == []
    assert terms(" ") == []


def test_golden_types():
    # testTypes + testJapanese + testKorean + testSupplementary
    toks = tokenize("David has 5000 bones")
    assert [TOKEN_TYPES[t.type] for t in toks] == \
        ["<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>"]
    toks = tokenize("仮名遣い カタカナ")
    assert [t.term for t in toks] == ["仮", "名", "遣", "い", "カタカナ"]
    assert [TOKEN_TYPES[t.type] for t in toks] == \
        ["<IDEOGRAPHIC>", "<IDEOGRAPHIC>", "<IDEOGRAPHIC>", "<HIRAGANA>",
         "<KATAKANA>"]
    toks = tokenize("훈민정음")
    assert [(t.term, TOKEN_TYPES[t.type]) for t in toks] == \
        [("훈민정음", "<HANGUL>")]
    toks = tokenize("𩬅艱鍟䇹愯瀛")
    assert all(TOKEN_TYPES[t.type] == "<IDEOGRAPHIC>" for t in toks)
    assert len(toks) == 6


def test_mailto_scheme():
    # testMailtoSchemeEmails (LUCENE-3880)
    toks = tokenize("mailto:test@example.org")
    assert [(t.term, TOKEN_TYPES[t.type]) for t in toks] == \
        [("mailto", "<ALPHANUM>"), ("test@example.org", "<EMAIL>")]

    text = ("mailto:personA@example.com,personB@example.com?cc=personC@"
            "example.com&subject=Subjectivity&body=Corpusivity%20or%20"
            "something%20like%20that")
    toks = tokenize(text)
    assert [t.term for t in toks] == [
        "mailto", "personA@example.com", ",personB@example.com",
        "?cc=personC@example.com", "subject", "Subjectivity",
        "body", "Corpusivity", "20or", "20something", "20like", "20that"]
    assert [TOKEN_TYPES[t.type] for t in toks[:4]] == \
        ["<ALPHANUM>", "<EMAIL>", "<EMAIL>", "<EMAIL>"]


def test_huge_doc_and_cap():
    # testHugeDoc: 4094 spaces of padding then two short tokens
    assert terms(" " * 4094 + "testing 1234") == ["testing", "1234"]
    # tokens above maxTokenLength are skipped, scan continues
    assert terms("x" * 300 + " ok") == ["ok"]


def test_combining_marks():
    for s in ("ざ", "ザ", "壹゙", "아゙"):
        assert terms(s) == [s]


def test_reference_corpora_full_stream_parity():
    """Every token (term AND type) over the reference's own URL/email
    corpora + multi-script stress texts must equal the compiled
    reference DFA's output."""
    with gzip.open(ORACLE, "rt", encoding="utf-8") as f:
        recs = json.load(f)
    assert len(recs) > 6000
    n = 0
    for r in recs:
        got = [(t.term, t.type) for t in tokenize(r["text"])]
        want = [(t[3], t[0]) for t in r["tokens"]]
        assert got == want, f"mismatch on {r['text'][:80]!r}"
        n += len(want)
    assert n > 40_000


def test_analyzer_chain():
    # UAX29URLEmailAnalyzer: lowercase + stop filtering, URLs intact
    assert analyze("The site IS http://Example.COM/A?b=c") == \
        ["site", "http://example.com/a?b=c"]


def test_spark_extraction_plumbing(spark):
    from lucene_solr_1_spark.analysis.urlemail import extract_urls_emails_df
    df = spark.createDataFrame(
        [(1, "mail lucene@apache.org or visit lucene.apache.org/core now"),
         (2, "no links here"),
         (3, None)],
        "doc_id long, text string")
    rows = [(r["doc_id"], r["term"], r["type"])
            for r in extract_urls_emails_df(df).collect()]
    assert sorted(rows) == [
        (1, "lucene.apache.org/core", "<URL>"),
        (1, "lucene@apache.org", "<EMAIL>"),
    ]
