"""WFST / TST completion lookups (solr/suggest.py) pinned against the
reference's own WFSTCompletionTest vectors
(lucene/suggest/src/test/.../fst/WFSTCompletionTest.java) and
TSTLookup's lookup contract (tst/TSTLookup.java)."""

import os

import pandas as pd
import pytest

from lucene_solr_1_spark.solr.suggest import (build_wfst_suggester,
                                              tst_lookup, wfst_lookup)


@pytest.fixture(scope="module")
def basic(spark, tmp_root):
    """The testBasic key set: foo/50 bar/10 barbar/12 barbara/6."""
    path = os.path.join(tmp_root, "wfst_basic")
    df = spark.createDataFrame(pd.DataFrame({
        "t": ["foo", "bar", "barbar", "barbara"],
        "w": [50, 10, 12, 6]}))
    build_wfst_suggester(spark, df, "t", "w", path, out_partitions=2)
    return path


def test_wfst_basic_vectors(spark, basic):
    """WFSTCompletionTest.testBasic, line by line (default ctor =
    exactFirst true)."""
    # top 2 for 'f': only foo available
    assert wfst_lookup(spark, basic, "f", 2) == [("foo", 50)]
    # no dup exact suggestion
    assert wfst_lookup(spark, basic, "foo", 2) == [("foo", 50)]
    # top 1 for 'bar': the exact match wins even though barbar is higher
    assert wfst_lookup(spark, basic, "bar", 1) == [("bar", 10)]
    # top 2 for 'b'
    assert wfst_lookup(spark, basic, "b", 2) == [("barbar", 12),
                                                 ("bar", 10)]
    # top 3 for 'ba'
    assert wfst_lookup(spark, basic, "ba", 3) == [("barbar", 12),
                                                  ("bar", 10),
                                                  ("barbara", 6)]


def test_wfst_exact_first_vectors(spark, tmp_root):
    """WFSTCompletionTest.testExactFirst / testNonExactFirst."""
    path = os.path.join(tmp_root, "wfst_exact")
    df = spark.createDataFrame(pd.DataFrame({"t": ["x y", "x"],
                                             "w": [20, 2]}))
    build_wfst_suggester(spark, df, "t", "w", path, out_partitions=1)
    for top_n in (1, 2, 3):
        got = wfst_lookup(spark, path, "x", top_n, exact_first=True)
        assert len(got) == min(top_n, 2)
        assert got[0] == ("x", 2)
        if top_n > 1:
            assert got[1] == ("x y", 20)
    for top_n in (1, 2, 3):
        got = wfst_lookup(spark, path, "x", top_n, exact_first=False)
        assert len(got) == min(top_n, 2)
        assert got[0] == ("x y", 20)
        if top_n > 1:
            assert got[1] == ("x", 2)


def test_wfst_no_match_and_bad_num(spark, basic):
    assert wfst_lookup(spark, basic, "zzz", 3) == []
    with pytest.raises(ValueError):
        wfst_lookup(spark, basic, "b", 0)


def test_tst_lookup_contract(spark, basic):
    """TSTLookup.lookup: alphabetical completions by default; weight
    top-n under onlyMorePopular (LookupPriorityQueue order)."""
    assert tst_lookup(spark, basic, "bar", 2) == [("bar", 10),
                                                  ("barbar", 12)]
    assert tst_lookup(spark, basic, "bar", 10) == [("bar", 10),
                                                   ("barbar", 12),
                                                   ("barbara", 6)]
    assert tst_lookup(spark, basic, "bar", 2, only_more_popular=True) == \
        [("barbar", 12), ("bar", 10)]
