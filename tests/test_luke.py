"""LukeRequestHandler analog (solr/luke.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def idx_root(spark, tmp_path_factory):
    from lucene_solr_1_spark.index.build import build_index
    root = os.path.join(str(tmp_path_factory.mktemp("luke")), "idx")
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.format_string("doc%06d", F.col("doc_id")).alias("url"),
                    F.col("text")))
    build_index(spark, docs, root, num_segments=2)
    return root


def test_top_terms_matches_sql_truth(spark, idx_root):
    from lucene_solr_1_spark.solr.luke import top_terms
    got = top_terms(spark, idx_root, num_terms=5).orderBy("rank").collect()
    # ground truth from the raw corpus
    from lucene_solr_1_spark.analysis.standard import ENGLISH_STOP_WORDS
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
             .filter(~F.col("t").isin(*ENGLISH_STOP_WORDS) & (F.col("t") != ""))
             .groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
             .orderBy(F.desc("df"), F.asc("t")).limit(5).collect())
    assert [(r["term"], r["df"]) for r in got] == \
        [(r["t"], r["df"]) for r in truth]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_histogram_slots(spark, idx_root):
    from lucene_solr_1_spark.solr.luke import docfreq_histogram
    got = {r["bucket"]: r["cnt"]
           for r in docfreq_histogram(spark, idx_root).collect()}
    # slot rule: df=1 -> bucket 1; 2^(k-1) < df <= 2^k -> bucket 2^k
    from lucene_solr_1_spark.analysis.standard import ENGLISH_STOP_WORDS
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dfs = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
           .filter(~F.col("t").isin(*ENGLISH_STOP_WORDS) & (F.col("t") != ""))
           .groupBy("t").agg(F.countDistinct("doc_id").alias("df")).collect())
    exp: dict[int, int] = {}
    for r in dfs:
        df = r["df"]
        slot = 0 if df <= 1 else (df - 1).bit_length()
        exp[1 << slot] = exp.get(1 << slot, 0) + 1
    assert got == exp


def test_index_info(spark, idx_root):
    from lucene_solr_1_spark.solr.luke import index_info
    info = index_info(spark, idx_root)
    assert info["numDocs"] == 500
    assert info["segmentCount"] == 2
    assert info["postingsFormat"] == "lucene41"


def test_metrics_sentinels_excluded(spark, idx_root):
    from lucene_solr_1_spark.solr.luke import _field_stats
    ts = _field_stats(spark, idx_root, None)
    assert ts.filter(F.col("term").startswith("\x00")).count() == 0
