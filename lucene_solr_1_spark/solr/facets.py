"""Faceting — Solr SimpleFacets / Lucene facet module analogs as
declarative DataFrame transforms (every one is a stock Catalyst plan:
semi-join on the matching doc set + groupBy; at scale the hits side is
small and broadcast, the attribute scan prunes to the facet columns).

Reference parity:
  facet_field  — solr/core/.../request/SimpleFacets.java:338,377-454
                 (term counts over the result DocSet, count desc)
  facet_query  — SimpleFacets.java:283 (arbitrary predicate counts)
  facet_range  — SimpleFacets.java:252,266-267 (numeric/date buckets)
  facet_pivot  — solr/core/.../handler/component/PivotFacetProcessor.java
  rollup       — lucene/facet taxonomy rollup (TaxonomyReader:66) via
                 Spark's native rollup()
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def facet_field(attrs: DataFrame, hits: DataFrame, field: str,
                key: str = "docid", limit: int = 100, mincount: int = 1,
                prefix: str | None = None) -> DataFrame:
    """Counts of `field` values over the matching doc set, count desc
    then value asc (Solr's facet.sort=count). `prefix` keeps only
    values starting with it (facet.prefix — SimpleFacets.java:377,
    used for facet-driven autocomplete); the predicate lands before
    the aggregation so Catalyst pushes it into the scan."""
    joined = attrs.join(F.broadcast(hits.select(key).distinct()), key)
    if prefix is not None:
        joined = joined.filter(F.col(field).startswith(prefix))
    return (joined.groupBy(field).agg(F.count("*").alias("count"))
            .filter(F.col("count") >= mincount)
            .orderBy(F.desc("count"), F.asc(field)).limit(limit))


def facet_missing(attrs: DataFrame, hits: DataFrame, field: str,
                  key: str = "docid") -> DataFrame:
    """facet.missing (SimpleFacets.java:440-454): the count of matching
    docs with NO value for the facet field, one extra conditional
    aggregate in the same pass shape as the counts."""
    joined = attrs.join(F.broadcast(hits.select(key).distinct()), key)
    return joined.agg(
        F.sum(F.when(F.col(field).isNull(), 1).otherwise(0))
        .cast("long").alias("missing"))


def facet_query(attrs: DataFrame, predicates: dict[str, Column]) -> DataFrame:
    """facet.query: one labelled count per arbitrary predicate, computed
    in a single pass (conditional aggregation)."""
    aggs = [F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(label)
            for label, cond in predicates.items()]
    return attrs.agg(*aggs)


def facet_range(attrs: DataFrame, field: str, start, end, gap,
                hits: DataFrame | None = None, key: str = "docid") -> DataFrame:
    """Numeric range buckets [start+i*gap, start+(i+1)*gap)."""
    df = attrs
    if hits is not None:
        df = df.join(F.broadcast(hits.select(key).distinct()), key)
    bucket = (F.floor((F.col(field) - F.lit(start)) / F.lit(gap))).cast("long")
    return (df.filter((F.col(field) >= start) & (F.col(field) < end))
            .withColumn("bucket_start", F.lit(start) + bucket * F.lit(gap))
            .groupBy("bucket_start").agg(F.count("*").alias("count"))
            .orderBy("bucket_start"))


def facet_pivot(attrs: DataFrame, fields: list[str],
                hits: DataFrame | None = None, key: str = "docid",
                limit_per_level: int | None = None) -> DataFrame:
    """N-dimensional pivot counts (hierarchical facet drill)."""
    df = attrs
    if hits is not None:
        df = df.join(F.broadcast(hits.select(key).distinct()), key)
    out = df.groupBy(*fields).agg(F.count("*").alias("count"))
    return out.orderBy(*[F.asc(f) for f in fields])


def facet_rollup(attrs: DataFrame, fields: list[str]) -> DataFrame:
    """Taxonomy-style hierarchical rollup counts (NULL = aggregate level)."""
    return (attrs.rollup(*fields).agg(F.count("*").alias("count"))
            .orderBy(*[F.asc_nulls_first(f) for f in fields]))


def drill_sideways(attrs: DataFrame, hits_by_dim: dict[str, DataFrame],
                   base_hits: DataFrame, key: str = "docid") -> dict[str, DataFrame]:
    """DrillSideways (facet/.../DrillSideways.java): for each dimension,
    facet counts computed with every OTHER dimension's filter applied
    but its own dropped. Caller passes per-dimension hit sets."""
    out = {}
    dims = list(hits_by_dim)
    for d in dims:
        others = [hits_by_dim[o] for o in dims if o != d]
        hits = base_hits.select(key).distinct()
        for o in others:
            hits = hits.join(o.select(key).distinct(), key, "inner")
        out[d] = facet_field(attrs, hits, d, key=key)
    return out
