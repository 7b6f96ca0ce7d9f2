"""JoinUtil score modes, child block join, facet.prefix/missing."""

import pandas as pd
import pytest

from lucene_solr_1_spark.search.join import (join_query, to_child_block_join)
from lucene_solr_1_spark.solr.facets import facet_field, facet_missing


@pytest.fixture(scope="module")
def sides(spark):
    from_pdf = pd.DataFrame({
        "docid": range(8),
        "grp": ["a", "a", "b", "b", "b", "c", "d", "d"],
        "score": [1.0, 3.0, 2.0, 4.0, 6.0, 5.0, 1.0, 1.0]})
    to_pdf = pd.DataFrame({
        "to_id": range(6),
        "val": ["a", "b", "c", "e", "b", "a"]})
    return (spark.createDataFrame(from_pdf), spark.createDataFrame(to_pdf),
            from_pdf, to_pdf)


def test_join_score_modes(sides):
    from_df, to_df, from_pdf, _ = sides
    expected = {
        "total": from_pdf.groupby("grp")["score"].sum(),
        "max": from_pdf.groupby("grp")["score"].max(),
        "avg": from_pdf.groupby("grp")["score"].mean(),
    }
    for mode, exp in expected.items():
        got = (join_query(from_df, "grp", to_df, "val", score_mode=mode)
               .orderBy("to_id").toPandas())
        # only to-docs whose val appears on the from side
        assert got["val"].isin(set(from_pdf["grp"])).all()
        assert set(got["to_id"]) == {0, 1, 2, 4, 5}
        for _, r in got.iterrows():
            assert abs(r["join_score"] - exp[r["val"]]) < 1e-9, mode


def test_join_score_mode_none_is_semi(sides):
    from_df, to_df, from_pdf, to_pdf = sides
    got = join_query(from_df, "grp", to_df, "val").orderBy("to_id").toPandas()
    assert "join_score" not in got.columns
    assert set(got["to_id"]) == {0, 1, 2, 4, 5}


def test_to_child_block_join(sides, spark):
    parents = spark.createDataFrame(pd.DataFrame(
        {"pkey": [1, 2], "score": [0.5, 0.9]}))
    children = spark.createDataFrame(pd.DataFrame(
        {"pkey": [1, 1, 2, 3], "cid": [10, 11, 20, 30]}))
    got = to_child_block_join(parents, children, "pkey",
                              parent_score_col="score") \
        .orderBy("cid").toPandas()
    assert got["cid"].tolist() == [10, 11, 20]
    assert got["parent_score"].tolist() == [0.5, 0.5, 0.9]
    plain = to_child_block_join(parents, children, "pkey") \
        .orderBy("cid").toPandas()
    assert plain["cid"].tolist() == [10, 11, 20]


def test_facet_prefix_and_missing(spark):
    attrs = spark.createDataFrame(pd.DataFrame({
        "docid": range(6),
        "cat": ["alpha", "alto", "beta", None, "alpha", None]}))
    hits = spark.createDataFrame(pd.DataFrame({"docid": [0, 1, 2, 3, 5]}))
    got = facet_field(attrs, hits, "cat", prefix="al").toPandas()
    assert got["cat"].tolist() == ["alpha", "alto"]
    assert got["count"].tolist() == [1, 1]
    miss = facet_missing(attrs, hits, "cat").toPandas()
    assert miss["missing"].iloc[0] == 2

