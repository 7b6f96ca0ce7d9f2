"""LukeRequestHandler analog — index introspection.

Reference: ``solr/core/src/java/org/apache/solr/handler/admin/
LukeRequestHandler.java`` — ``getDetailedFieldInfo`` (:575-622) walks a
field's TermsEnum collecting (a) the distinct-term count, (b) the
top-``numTerms`` terms by docFreq through a bounded priority queue,
and (c) a power-of-two docFreq histogram whose slot is
``32 - numberOfLeadingZeros(max(0, freq-1))`` (slot 0 holds freq 1,
slot k holds 2^(k-1) < freq <= 2^k); ``getIndexInfo`` (:551) reports
numDocs / maxDoc / version-level facts.

The analog reads the engine's termstats table — already term-bucketed
parquet, so top-N is a TakeOrdered (no full sort materialized) and the
histogram is one map-side-combinable groupBy.  The reference's
TopTermQueue breaks docFreq ties in unspecified heap order; we use
term ascending (deterministic) and document the deviation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = ["top_terms", "docfreq_histogram", "field_info", "index_info"]


def _field_stats(spark: SparkSession, root_or_df, field: str | None):
    """termstats rows for one field (multi-field indexes prefix terms
    with 'field<sep>'; single-field indexes store bare terms)."""
    from ..index.build import FIELD_SEP
    if isinstance(root_or_df, DataFrame):
        ts = root_or_df
    else:
        ts = spark.read.parquet(os.path.join(root_or_df, "termstats"))
    ts = ts.filter(~F.col("term").startswith("\x00"))  # metrics sentinels
    if field is not None:
        pref = field + FIELD_SEP
        scoped = ts.filter(F.col("term").startswith(pref))
        # fall back to bare terms for single-field indexes asked for
        # their default field
        ts = scoped if field != "text" else (
            scoped.union(ts.filter(~F.col("term").contains(FIELD_SEP))))
        # strip by LENGTH, not regexp: a field name with regex
        # metacharacters ('a.b') must not strip unintended terms
        # (ADVICE r5); startswith above already guarantees the prefix
        ts = ts.withColumn(
            "term",
            F.when(F.col("term").startswith(pref),
                   F.col("term").substr(F.lit(len(pref) + 1),
                                        F.length("term")))
            .otherwise(F.col("term")))
    return ts


def top_terms(spark: SparkSession, root_or_df, field: str | None = None,
              num_terms: int = 10) -> DataFrame:
    """Top-N terms by docFreq (LukeRequestHandler.java:596-612).
    Ties break by term ascending (the reference's heap order is
    unspecified)."""
    ts = _field_stats(spark, root_or_df, field)
    # TakeOrdered (bounded) — the row_number window runs on <= num_terms
    # rows, never the full dictionary
    ranked = (ts.orderBy(F.desc("df"), F.asc("term")).limit(num_terms)
              .select("term", F.col("df").cast("long").alias("df")))
    return ranked.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("df"),
                                                   F.asc("term"))))


def docfreq_histogram(spark: SparkSession, root_or_df,
                      field: str | None = None) -> DataFrame:
    """Power-of-two docFreq histogram: slot = 32-nlz(max(0, df-1)),
    reported as bucket = 2^slot (LukeRequestHandler.java:597-601)."""
    ts = _field_stats(spark, root_or_df, field)
    slot = F.when(F.col("df") <= 1, F.lit(0)).otherwise(
        F.ceil(F.log2(F.col("df").cast("double"))).cast("int"))
    return (ts.withColumn("slot", slot)
            .groupBy("slot")
            .agg(F.count("*").alias("cnt"))
            .select(F.expr("shiftleft(1L, slot)").cast("long")
                    .alias("bucket"),
                    F.col("cnt").cast("long").alias("cnt"))
            .orderBy("bucket"))


def field_info(spark: SparkSession, root: str, field: str | None = None,
               num_terms: int = 10) -> dict:
    """fieldMap analog: distinct count + topTerms + histogram."""
    ts = _field_stats(spark, root, field)
    return {
        "distinct": ts.count(),
        "topTerms": [(r["term"], r["df"])
                     for r in top_terms(spark, ts, None,
                                        num_terms).collect()],
        "histogram": [(r["bucket"], r["cnt"])
                      for r in docfreq_histogram(spark, ts,
                                                 None).collect()],
    }


def index_info(spark: SparkSession, root: str) -> dict:
    """getIndexInfo analog from the commit-point metadata
    (LukeRequestHandler.java:551-566)."""
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    out = {
        "numDocs": stats.get("max_doc"),
        "maxDoc": stats.get("max_doc"),
        "numTerms": stats.get("n_terms"),
        "segmentCount": stats.get("num_segments"),
        "postingsFormat": stats.get("postings_format"),
    }
    if stats.get("index_sort"):
        out["indexSort"] = stats["index_sort"]
    return out
