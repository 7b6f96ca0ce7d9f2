"""PrecedenceQueryParser twin (search/queryparser.py::parse_precedence
/ search_precedence; ref lucene/queryparser/.../flexible/precedence/
PrecedenceQueryParser.java:43): AND binds tighter than OR, queries
execute as a disjunction of conjunction groups in one postings pass."""

import os

import numpy as np
import pytest

from lucene_solr_1_spark.fixtures.webtext import gen_docs
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.queryparser import (parse_precedence,
                                                    search_precedence)

N_DOCS = 800


@pytest.fixture(scope="module")
def searcher(spark, tmp_root):
    docs = spark.createDataFrame(gen_docs(N_DOCS))
    root = os.path.join(tmp_root, "prec_idx")
    paths = build_index(spark, docs, root, num_segments=3)
    return IndexSearcher(spark, paths.root)


def _freq_terms(searcher, n=4):
    import pandas as pd
    ts = searcher.spark.read.parquet(searcher.paths.termstats) \
        .orderBy("df", ascending=False).limit(n + 5).toPandas()
    return [t for t in ts["term"].tolist()][:n]


# ------------------------------------------------------------- parser

def test_and_binds_tighter_than_or():
    assert parse_precedence("merge AND join OR window") == [
        [("merge", False, 1.0), ("join", False, 1.0)],
        [("window", False, 1.0)]]


def test_default_operator_config():
    # flexible setDefaultOperator: OR -> juxtaposition splits groups,
    # AND -> joins them
    assert parse_precedence("merge join") == [
        [("merge", False, 1.0)], [("join", False, 1.0)]]
    assert parse_precedence("merge join", default_op="AND") == [
        [("merge", False, 1.0), ("join", False, 1.0)]]


def test_not_and_boost_within_group():
    assert parse_precedence("merge AND NOT join OR window^2") == [
        [("merge", False, 1.0), ("join", True, 1.0)],
        [("window", False, 2.0)]]


def test_analysis_applies():
    # query text runs the StandardAnalyzer chain: stopwords drop
    assert parse_precedence("the merge") == [[("merge", False, 1.0)]]


def test_rejects_non_term_clauses():
    with pytest.raises(ValueError, match="term clauses"):
        parse_precedence('"exact phrase" OR merge')


# ------------------------------------------------------------ executor

def test_matches_group_composition_bitwise(spark, searcher):
    """score(doc) must equal float32(conj-group score) summed
    left-to-right over matching groups, computed independently via two
    plain engine searches."""
    a, b, c, _ = _freq_terms(searcher)
    got = search_precedence(searcher, f"{a} AND {b} OR {c}",
                            k=N_DOCS).toPandas()
    g1 = {r.docid: np.float32(r.score)
          for r in searcher.search([a, b], "AND", k=N_DOCS).collect()}
    g2 = {r.docid: np.float32(r.score)
          for r in searcher.search([c], "OR", k=N_DOCS).collect()}
    exp = {}
    for d in set(g1) | set(g2):
        exp[d] = np.float32(np.float32(g1.get(d, np.float32(0.0)))
                            + g2.get(d, np.float32(0.0)))
    assert len(got) == len(exp)
    for r in got.itertuples(index=False):
        assert np.float32(r.score) == exp[r.docid], r.docid


def test_precedence_differs_from_classic(spark, searcher):
    """The discriminating case: a doc containing only the OR-side term
    hits under precedence, not under the classic flat parse."""
    from lucene_solr_1_spark.search.queryparser import parse_query
    a, b, c, _ = _freq_terms(searcher)
    q = f"{a} AND {b} OR {c}"
    prec = {r.docid for r in
            search_precedence(searcher, q, k=N_DOCS).collect()}
    classic = {r.docid for r in
               searcher.search(parse_query(q, searcher, k=N_DOCS)).collect()}
    only_c = {r.docid for r in searcher.search([c], "OR", k=N_DOCS).collect()}
    both_ab = {r.docid for r in
               searcher.search([a, b], "AND", k=N_DOCS).collect()}
    assert classic == both_ab            # classic: +a +b (c optional)
    assert prec == both_ab | only_c      # precedence: (a AND b) OR c
    assert (only_c - both_ab) & prec     # the case classic misses


def test_negation_within_group(spark, searcher):
    a, b, c, _ = _freq_terms(searcher)
    got = {r.docid for r in search_precedence(
        searcher, f"{a} AND NOT {b} OR {c}", k=N_DOCS).collect()}
    has_a = {r.docid for r in searcher.search([a], "OR", k=N_DOCS).collect()}
    has_b = {r.docid for r in searcher.search([b], "OR", k=N_DOCS).collect()}
    has_c = {r.docid for r in searcher.search([c], "OR", k=N_DOCS).collect()}
    assert got == (has_a - has_b) | has_c


def test_pure_negative_group_matches_nothing(spark, searcher):
    a, b, _, _ = _freq_terms(searcher)
    got = {r.docid for r in search_precedence(
        searcher, f"NOT {a} OR {b}", k=N_DOCS).collect()}
    has_b = {r.docid for r in searcher.search([b], "OR", k=N_DOCS).collect()}
    assert got == has_b


def test_empty_query(spark, searcher):
    assert search_precedence(searcher, "the of and", k=5).count() == 0
