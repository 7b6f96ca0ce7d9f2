"""Index sorting (SortingMergePolicy analog) + early-terminating sorted
top-k: per-segment docid order must follow the sort key, the collector
must equal the full global sort, touch at most num_segments x k rows,
and the unsorted default path must be byte-identical to before."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.index.build import BUCKET_SHIFT, build_index
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.sorted import early_terminating_sorted_topk


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_root):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("cast(doc_id as string) as url", "text",
                        "n_chars"))
    root = os.path.join(tmp_root, "sorted_idx")
    paths = build_index(spark, docs, root, num_segments=4,
                        out_partitions=4, sort_by="n_chars")
    return paths, IndexSearcher(spark, root)


def test_segment_docid_order_is_sort_order(spark, sorted_idx):
    paths, searcher = sorted_idx
    pdf = (spark.read.parquet(paths.docs)
           .select("docid", "sort_key").toPandas()
           .sort_values("docid").reset_index(drop=True))
    assert searcher.stats["index_sort"] == "n_chars"
    buckets = pdf["docid"].to_numpy() >> BUCKET_SHIFT
    for b in np.unique(buckets):
        keys = pdf.loc[buckets == b, "sort_key"].to_numpy()
        assert (np.diff(keys) >= 0).all(), f"bucket {b} not sorted"


def test_early_termination_equals_full_sort(spark, sorted_idx):
    paths, searcher = sorted_idx
    k = 15
    got = early_terminating_sorted_topk(searcher, k).toPandas()
    full = (spark.read.parquet(paths.docs)
            .orderBy(F.asc("sort_key"), F.asc("docid"))
            .limit(k).select("docid", "sort_key", "url").toPandas())
    assert got["docid"].tolist() == full["docid"].tolist()
    assert got["sort_key"].tolist() == full["sort_key"].tolist()


def test_candidate_set_is_bounded(spark, sorted_idx):
    paths, searcher = sorted_idx
    k = 7
    n_seg = searcher.stats["num_segments"]
    docs = spark.read.parquet(paths.docs)
    cond = F.lit(False)
    for b in range(n_seg):
        base = b << BUCKET_SHIFT
        cond = cond | ((F.col("docid") >= base)
                       & (F.col("docid") < base + k))
    assert docs.filter(cond).count() <= n_seg * k


def test_search_still_works_on_sorted_index(spark, sorted_idx):
    _, searcher = sorted_idx
    hits = searcher.search(["merge"], k=5).collect()
    assert hits and all(r["score"] > 0 for r in hits)


def test_unsorted_raises(spark, tmp_root):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("cast(doc_id as string) as url", "text"))
    root = os.path.join(tmp_root, "unsorted_idx")
    build_index(spark, docs, root, num_segments=2, out_partitions=2)
    s = IndexSearcher(spark, root)
    with pytest.raises(ValueError, match="sort_by"):
        early_terminating_sorted_topk(s, 5)


def test_duplicate_filter(spark):
    from lucene_solr_1_spark.search.sorted import duplicate_filter
    hits = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6), (5, 0.5)],
        "docid long, score double")
    keyed = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "docid long, site string")
    last = {r["docid"] for r in
            duplicate_filter(hits, keyed, "site", keep="last").collect()}
    first = {r["docid"] for r in
             duplicate_filter(hits, keyed, "site", keep="first").collect()}
    assert last == {2, 4, 5}
    assert first == {1, 3, 5}
