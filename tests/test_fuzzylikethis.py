"""FuzzyLikeThisQuery: expansion semantics vs a brute-force Python
oracle over the real term dictionary, and end-to-end search shape."""

import math
import os

import pytest

from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.fuzzylikethis import (
    fuzzy_like_this, fuzzy_like_this_terms)


def lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


@pytest.fixture(scope="module")
def searcher(spark, tmp_root):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("cast(doc_id as string) as url", "text"))
    paths = build_index(spark, docs, os.path.join(tmp_root, "flt_idx"),
                        num_segments=2, out_partitions=2)
    return IndexSearcher(spark, paths.root)


def py_oracle(searcher, spark, qterms, min_sim, max_num):
    ts = {r["term"]: r["df"] for r in
          spark.read.parquet(searcher.paths.termstats)
          .select("term", "df").collect()}
    scored = []
    for q in dict.fromkeys(qterms):
        variants = []
        for t, df in ts.items():
            s = 1.0 - lev(t, q) / min(len(t), len(q))
            if s >= min_sim:
                variants.append((t, df, s))
        if not variants:
            continue
        variants.sort(key=lambda x: (-x[2], x[0]))
        variants = variants[:50]
        df_q = ts.get(q, 0)
        if df_q == 0:
            df_q = sum(v[1] for v in variants) // len(variants)
        idf = math.log(searcher.max_doc / (df_q + 1)) + 1.0
        scored += [(t, (s ** 2) * idf) for t, _, s in variants]
    scored.sort(key=lambda x: (-x[1], x[0]))
    scored = scored[:max_num]
    top = scored[0][1]
    return [(t, s / top) for t, s in scored]


def test_expansion_matches_oracle(spark, searcher):
    got = fuzzy_like_this_terms(searcher, "merge joni", min_similarity=0.6,
                                max_num_terms=20)
    exp = py_oracle(searcher, spark, ["merge", "joni"], 0.6, 20)
    assert [t for t, _ in got] == [t for t, _ in exp]
    for (_, gb), (_, eb) in zip(got, exp):
        assert gb == pytest.approx(eb, abs=1e-9)


def test_search_end_to_end(spark, searcher):
    hits = fuzzy_like_this(searcher, "merge joni", k=10).collect()
    assert hits and hits[0]["score"] > 0
    # typo'd 'joni' must still pull in docs containing 'join'
    join_hits = {r["docid"] for r in searcher.search(["join"], k=1 << 20)
                 .collect()}
    assert any(r["docid"] in join_hits for r in hits)
