"""JaspellLookup + FSTCompletion twins (solr/suggest.py), pinned
against the reference's own FSTCompletionTest vectors
(lucene/suggest/src/test/.../fst/FSTCompletionTest.java::evalKeys) and
JaspellLookup.java:104-133 / JaspellTernarySearchTrie.matchAlmost
semantics."""

import os

import pandas as pd
import pytest

from lucene_solr_1_spark.solr.suggest import (build_fst_completion,
                                              build_wfst_suggester,
                                              fst_completion_lookup,
                                              jaspell_lookup,
                                              jaspell_match_almost)

# FSTCompletionTest.evalKeys(): (term, bucket) added via
# FSTCompletionBuilder.add(term, bucket)
EVAL_KEYS = [
    ("one", 0), ("oneness", 1), ("onerous", 1), ("onesimus", 1),
    ("two", 1), ("twofold", 1), ("twonk", 1), ("thrive", 1),
    ("through", 1), ("threat", 1), ("three", 1), ("foundation", 1),
    ("fourblah", 1), ("fourteen", 1), ("four", 0), ("fourier", 0),
    ("fourty", 0), ("xo", 1),
]


@pytest.fixture(scope="module")
def completion(spark, tmp_root):
    path = os.path.join(tmp_root, "fstc_eval")
    df = spark.createDataFrame(pd.DataFrame(
        {"t": [t for t, _ in EVAL_KEYS], "w": [b for _, b in EVAL_KEYS]}))
    build_fst_completion(spark, df, "t", "w", path, out_partitions=2,
                         weights_are_buckets=True)
    return path


def test_exact_match_high_priority(spark, completion):
    assert fst_completion_lookup(spark, completion, "two", 1) == [("two", 1)]


def test_exact_match_low_priority(spark, completion):
    # 'one' (bucket 0) displaces the tail after truncation at num
    assert fst_completion_lookup(spark, completion, "one", 2) == [
        ("one", 0), ("oneness", 1)]


def test_exact_match_reordering(spark, completion):
    assert fst_completion_lookup(spark, completion, "four", 4) == [
        ("four", 0), ("fourblah", 1), ("fourteen", 1), ("fourier", 0)]


def test_requested_count(spark, completion):
    assert fst_completion_lookup(spark, completion, "four", 2) == [
        ("four", 0), ("fourblah", 1)]
    # noPromotion: exactFirst=False keeps pure (bucket desc, surface)
    assert fst_completion_lookup(spark, completion, "one", 2,
                                 exact_first=False) == [
        ("oneness", 1), ("onerous", 1)]
    # alphabetical mode
    assert fst_completion_lookup(spark, completion, "one", 2,
                                 higher_weights_first=False) == [
        ("one", 0), ("oneness", 1)]


def test_miss(spark, completion):
    assert fst_completion_lookup(spark, completion, "xyz", 1) == []


def test_full_match_list_no_promotion(spark, completion):
    # testFullMatchList: not truncated at num -> exactFirst does NOT
    # promote; natural (bucket desc, surface asc) order stands
    assert fst_completion_lookup(spark, completion, "one", 100) == [
        ("oneness", 1), ("onerous", 1), ("onesimus", 1), ("one", 0)]


def test_bucket_quantization_rule(spark, tmp_root):
    """FSTCompletionLookup.build: bucket = floor(rank-of-first-equal-
    weight * buckets / n); constant weights -> one bucket."""
    path = os.path.join(tmp_root, "fstc_quant")
    df = spark.createDataFrame(pd.DataFrame(
        {"t": [f"w{i:02d}" for i in range(20)],
         "w": list(range(1, 21))}))
    build_fst_completion(spark, df, "t", "w", path, buckets=10,
                         out_partitions=2)
    got = {r.surface: r.bucket
           for r in spark.read.parquet(path).collect()}
    for i in range(20):          # weight i+1 has i smaller -> i*10//20
        assert got[f"w{i:02d}"] == (i * 10) // 20
    # constant weights (testLargeInputConstantWeights)
    path2 = os.path.join(tmp_root, "fstc_const")
    dfc = spark.createDataFrame(pd.DataFrame(
        {"t": [f"k{i}" for i in range(30)], "w": [7] * 30}))
    build_fst_completion(spark, dfc, "t", "w", path2, out_partitions=2)
    assert {r.bucket for r in spark.read.parquet(path2).collect()} == {0}


# ------------------------------------------------------------ jaspell

@pytest.fixture(scope="module")
def jaspell(spark, tmp_root):
    path = os.path.join(tmp_root, "jaspell_tbl")
    df = spark.createDataFrame(pd.DataFrame({
        "t": ["append", "apple", "applet", "apply", "apricot", "apz",
              "ample", "banana"],
        "w": [20, 5, 10, 3, 1, 100, 4, 7]}))
    build_wfst_suggester(spark, df, "t", "w", path, out_partitions=2)
    return path


def test_jaspell_alphabetical_default(spark, jaspell):
    # onlyMorePopular=false: first num prefix matches in trie
    # (alphabetical) order, weights attached
    assert jaspell_lookup(spark, jaspell, "ap", 2) == [
        ("append", 20), ("apple", 5)]


def test_jaspell_only_more_popular_pool_cap(spark, jaspell):
    """The reference quirk: the num*2 candidate pool is alphabetical,
    so apz/100 (alphabetically last) never enters a pool of 4 and the
    top-weight result is append/20."""
    got = jaspell_lookup(spark, jaspell, "ap", 2, only_more_popular=True)
    assert got == [("append", 20), ("applet", 10)]
    assert all(t != "apz" for t, _ in got)
    # with a wide enough num the pool reaches apz and it wins
    got6 = jaspell_lookup(spark, jaspell, "ap", 6, only_more_popular=True)
    assert got6[0] == ("apz", 100)


def test_jaspell_match_almost(spark, jaspell):
    # same length as 'apple', hamming <= 2, alphabetical: ample (1
    # mismatch), apple (0), apply (1); applet/banana length-excluded
    assert jaspell_match_almost(spark, jaspell, "apple", num=10) == [
        ("ample", 4), ("apple", 5), ("apply", 3)]
    # diff=0: exact only
    assert jaspell_match_almost(spark, jaspell, "apple", diff=0) == [
        ("apple", 5)]
