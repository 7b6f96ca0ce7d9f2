"""URL canonicalization vs hand-written expected forms + a Python
urllib-based oracle, and URL-level dedup winner semantics."""

import pytest

from lucene_solr_1_spark.datapipe.urlnorm import (
    canonical_url, canonicalize_urls, url_dedup)

CASES = [
    # (input, canonical)
    ("HTTP://Example.COM:80/Path/To?b=2&a=1#frag",
     "http://example.com/Path/To?a=1&b=2"),
    ("https://Example.com:443/",
     "https://example.com/"),
    ("https://example.com",
     "https://example.com/"),
    ("http://example.com/page?utm_source=x&utm_medium=y&id=7",
     "http://example.com/page?id=7"),
    ("http://example.com/page?gclid=abc&fbclid=def",
     "http://example.com/page"),
    ("http://example.com:8080/x?z=1",
     "http://example.com:8080/x?z=1"),          # non-default port kept
    ("HTTPS://WWW.Example.org/A/B?ref=tw#x",
     "https://www.example.org/A/B"),
    ("ftp://Files.example.com/pub",
     "ftp://files.example.com/pub"),
    ("not a url at all", "not a url at all"),    # passthrough
]


def test_canonical_forms(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}
    for i, (u, exp) in enumerate(CASES):
        assert got[i] == exp, (u, got[i], exp)


def test_idempotent(spark):
    df = spark.createDataFrame([(i, c) for i, (_, c) in enumerate(CASES)],
                               "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}
    for i, (_, c) in enumerate(CASES):
        assert got[i] == c, ("not idempotent", c, got[i])


def test_url_dedup_lowest_key_wins(spark):
    rows = [
        (5, "http://example.com/page?utm_source=a"),
        (2, "HTTP://EXAMPLE.com:80/page"),
        (9, "http://example.com/page#section"),
        (7, "http://example.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["canonical_url"]
           for r in url_dedup(df).collect()}
    assert set(out) == {2, 7}
    assert out[2] == "http://example.com/page"


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")],
                               "doc_id long, url string")
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
