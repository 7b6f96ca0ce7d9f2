"""StatsComponent analog — one-pass numeric field statistics.

Parity with Solr's StatsValuesFactory numeric stats (ref: solr/core/
src/java/org/apache/solr/handler/component/StatsComponent.java:47,
StatsValuesFactory.java:82-160): min, max, sum, count, missing,
sumOfSquares, mean, stddev — plus optional per-facet breakdown, all in
single aggregations (partial aggregation map-side, no extra passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _aggs(field: str):
    return [
        F.min(field).alias("min"),
        F.max(field).alias("max"),
        F.sum(field).alias("sum"),
        F.count(field).alias("count"),
        F.sum(F.when(F.col(field).isNull(), 1).otherwise(0)).cast("long").alias("missing"),
        F.sum(F.col(field) * F.col(field)).alias("sumOfSquares"),
        F.avg(field).alias("mean"),
        F.stddev_samp(field).alias("stddev"),
    ]


def stats(df: DataFrame, field: str, hits: DataFrame | None = None,
          key: str = "docid") -> DataFrame:
    if hits is not None:
        df = df.join(F.broadcast(hits.select(key).distinct()), key)
    return df.agg(*_aggs(field))


def stats_facet(df: DataFrame, field: str, facet: str,
                hits: DataFrame | None = None, key: str = "docid") -> DataFrame:
    """stats.facet: the same stats per facet value."""
    if hits is not None:
        df = df.join(F.broadcast(hits.select(key).distinct()), key)
    return df.groupBy(facet).agg(*_aggs(field)).orderBy(facet)
