"""Binds the ENGINE's strict-ordered span-near kernel to the
span_near_strict contract semantics (NearSpansOrdered: greedy
smallest-next witness, slop consumed = p_n - p_0 - (n-1)): the matched
DOC SET from a real positional index equals the SQL min-next reduction,
and the kernel's freq equals the reduction count on fuzzed positions."""

import os
import random

import numpy as np
import pytest

from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.phrase import _phrase_freq, multi_phrase_search


def reduction_freq(a, b, slop):
    """The two-term SQL twin: anchors p1 in a with min{p2 in b : p2>p1}
    satisfying p2 - p1 - 1 <= slop."""
    freq = 0
    for p1 in a:
        nxt = [p2 for p2 in b if p2 > p1]
        if nxt and min(nxt) - p1 - 1 <= slop:
            freq += 1
    return freq


def test_kernel_freq_matches_reduction():
    rng = random.Random(11)
    for _ in range(300):
        a = sorted(rng.sample(range(40), rng.randint(0, 8)))
        b = sorted(rng.sample(range(40), rng.randint(0, 8)))
        slop = rng.randint(0, 6)
        got = _phrase_freq([np.array(a, np.int64), np.array(b, np.int64)],
                           slop, ordered=True, strict=True)
        assert got == reduction_freq(a, b, slop), (a, b, slop)


@pytest.fixture(scope="module")
def positional(spark, tmp_root):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("cast(doc_id as string) as url", "text"))
    paths = build_index(spark, docs, os.path.join(tmp_root, "span_idx"),
                        num_segments=4, out_partitions=4, positions=True)
    return IndexSearcher(spark, paths.root)


def test_engine_docset_matches_sql_reduction(spark, positional):
    got = {r["docid"] for r in
           multi_phrase_search(positional, [["merge"], ["join"]], slop=4,
                               ordered=True, strict=True, k=1 << 20)
           .select("docid").collect()}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    url2id = {r["url"]: r["docid"] for r in
              spark.read.parquet(positional.paths.docs).collect()}
    exp = set()
    for r in docs.collect():
        toks = [t for t in r["text"].split(" ") if t]
        a = [i for i, t in enumerate(toks) if t == "merge"]
        b = [i for i, t in enumerate(toks) if t == "join"]
        if reduction_freq(a, b, 4):
            exp.add(url2id[str(r["doc_id"])])
    assert got == exp and got, "span-near doc set mismatch (or empty)"
