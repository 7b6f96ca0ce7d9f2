"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: build the real inverted index (per-segment pack
               + checkpoints + term-bucket merge) over the sf0.001
               documents table and run a BM25 boolean top-k through the
               packed-postings engine (float32 Lucene semantics).
queries()    — one entry per operator from SURVEY.md §2 + training-data
               pipeline ops, each as declarative Spark SQL over the
               testdata views (Catalyst handles pushdown/broadcast).
oracle_sql() — the same semantics in DuckDB ANSI SQL, scores computed in
               DOUBLE and rounded identically on both sides.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_1_spark.contract import make_oracle_sql, make_queries

_ENTRY_IDX_CACHE: dict[str, str] = {}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher

    sf_dir = "/root/testdata/sf0.001"
    root = _ENTRY_IDX_CACHE.get(sf_dir)
    if root is None or not os.path.exists(os.path.join(root, "stats.json")):
        root = os.path.join(tempfile.mkdtemp(prefix="lucene_spark_idx_"), "idx")
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select(F.format_string("doc%010d", F.col("doc_id")).alias("url"),
                        F.col("text")))
        build_index(spark, docs, root, num_segments=4)
        _ENTRY_IDX_CACHE[sf_dir] = root
    searcher = IndexSearcher(spark, root)
    topk = searcher.search(["merge", "join", "window"], op="OR", k=10)
    return searcher.fetch_fields(topk).select("rank", "docid", "url", "score")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return make_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL with identical semantics per query."""
    return make_oracle_sql()
