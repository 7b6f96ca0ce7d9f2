"""QueryElevationComponent — editorial pinning of documents to the top
of the result set (ref: solr/core/src/java/org/apache/solr/handler/
component/QueryElevationComponent.java:91, config format elevate.xml,
ElevationObj at QueryElevationComponent.java:113-160).

Semantics mirrored from the reference's prepare() (QueryElevation
Component.java:380-436):

* the elevation map is keyed by the ANALYZED query string
  (getAnalyzedQuery: the raw q run through the id-field analyzer and
  re-joined — `analyzed_key` here uses the standard analyze chain);
* the user query is rewritten ``original OR <id-term disjunction>`` so
  elevated docs are INSERTED into the hit set even when they don't
  match the user query (BooleanQuery newq, Occur.SHOULD both sides);
* excluded ids become MUST_NOT clauses, unless ``markExcludes`` — then
  they stay in the results carrying an ``excluded`` marker column (the
  ExcludedMarkerFactory doc transformer analog);
* sort is ``_elevate_ desc, score desc``: the ElevationComparatorSource
  assigns priority ``max - i`` to the i-th configured id (first listed
  wins) and 0 to everything else;
* ``exclusive=true`` (the QueryElevationParams.EXCLUSIVE request param)
  replaces the query with ONLY the elevated set.

Scale: the elevation config is a hand-edited editorial file (tens of
entries) — it folds into literal Columns, never a join; the only
distributed work is the underlying search plus one isin() filter for
the forced-insert fetch.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, functions as F


def parse_elevate_xml(xml: str) -> dict[str, tuple[list[str], list[str]]]:
    """elevate.xml -> {analyzed query text: ([elevate ids in priority
    order], [exclude ids])} (ref config loop QueryElevationComponent
    .java:277-310: ``elevate/query`` nodes, ``doc`` children with
    ``id`` + optional ``exclude`` attrs)."""
    if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
        raise ValueError("DTD (<!DOCTYPE/<!ENTITY) not allowed in elevate.xml")
    root = ET.fromstring(xml)
    if root.tag != "elevate":
        raise ValueError(f"expected <elevate> root, got <{root.tag}>")
    out: dict[str, tuple[list[str], list[str]]] = {}
    for q in root.findall("query"):
        text = q.get("text")
        if text is None:
            raise ValueError("<query> missing text attribute")
        elevate, exclude = [], []
        for d in q.findall("doc"):
            did = d.get("id")
            if did is None:
                raise ValueError("<doc> missing id attribute")
            if (d.get("exclude") or "").lower() == "true":
                exclude.append(did)
            else:
                elevate.append(did)
        out[analyzed_key(text)] = (elevate, exclude)
    return out


def analyzed_key(qstr: str) -> str:
    """getAnalyzedQuery analog (QueryElevationComponent.java:532-545):
    analyze the query text and re-join tokens with single spaces, so
    'AAA' and 'aaa' (and stopword/punct variants) share one entry."""
    from ..analysis.standard import analyze_text
    return " ".join(analyze_text(qstr))


def apply_elevation(hits: DataFrame, elevate_ids: list[int],
                    exclude_ids: list[int] | None = None, k: int = 10,
                    mark_excludes: bool = False,
                    exclusive: bool = False) -> DataFrame:
    """Re-rank a scored (docid, score) DataFrame under an elevation
    entry: priority column from the configured order (first id =
    highest, ElevationComparatorSource.java semantics), sort
    ``priority desc, score desc, docid asc``, excluded ids dropped (or
    marked when ``mark_excludes``), top k. Adds boolean ``elevated``
    (+ ``excluded`` when marking) — the [elevated]/[excluded] doc
    transformer analogs."""
    exclude_ids = list(exclude_ids or [])
    n = len(elevate_ids)
    prio = F.lit(0)
    for i, did in enumerate(elevate_ids):
        prio = F.when(F.col("docid") == int(did), F.lit(n - i)).otherwise(prio)
    out = hits.withColumn("_elevate_", prio)
    if exclusive:
        out = out.filter(F.col("_elevate_") > 0)
    if exclude_ids:
        if mark_excludes:
            out = out.withColumn(
                "excluded",
                F.col("docid").isin([int(x) for x in exclude_ids]))
        else:
            out = out.filter(
                ~F.col("docid").isin([int(x) for x in exclude_ids]))
    out = (out.withColumn("elevated", F.col("_elevate_") > 0)
           .orderBy(F.desc("_elevate_"), F.desc("score"), F.asc("docid"))
           .limit(int(k))
           .drop("_elevate_"))
    return out


def elevated_search(searcher, qstr: str,
                    elevations: dict[str, tuple[list[str], list[str]]],
                    k: int = 10, mark_excludes: bool = False,
                    exclusive: bool = False) -> DataFrame:
    """The full component: look up the analyzed query in the elevation
    map; on a hit, run the rewritten query (original OR forced ids —
    forced docs surface with their matched score, or score 0.0 when
    they don't match the user query at all, the inserted-TermQuery
    analog), then `apply_elevation`. On a miss, plain search."""
    entry = elevations.get(analyzed_key(qstr))
    if entry is None:
        return searcher.search(qstr, k=k)
    elevate_ids = [int(x) for x in entry[0]]
    exclude_ids = [int(x) for x in entry[1]]
    # wide enough that dropping excludes / inserting forced docs still
    # leaves k rows (ElevationObj: max = elevate.size() + 5 head-room);
    # the inner rank is recomputed by the elevation sort, so drop it
    hits = (searcher.search(qstr, k=k + len(elevate_ids) + len(exclude_ids))
            .drop("rank"))
    if elevate_ids:
        spark = hits.sparkSession
        forced = spark.createDataFrame(
            [(int(d),) for d in elevate_ids], "docid long")
        missing_ids = forced.join(hits.select("docid"), "docid", "left_anti")
        # score forced-in ids DIRECTLY against the user query (ADVICE
        # r4; the reference's rewritten 'original OR ids' query surfaces
        # the true match score, QueryElevationComponent.java:380-436):
        # an elevated doc below the fetched window gets its real score;
        # only genuinely non-matching docs keep the 0.0 insert score
        rescored = (searcher.search(qstr, k=len(elevate_ids),
                                    docid_filter=missing_ids)
                    .select("docid", "score"))
        missing = (missing_ids.join(rescored, "docid", "left")
                   .withColumn("score",
                               F.coalesce(F.col("score"), F.lit(0.0))
                               .cast(hits.schema["score"].dataType)))
        for c in hits.columns:
            if c not in ("docid", "score"):
                missing = missing.withColumn(c, F.lit(None).cast(
                    hits.schema[c].dataType))
        hits = hits.unionByName(missing.select(*hits.columns))
    return apply_elevation(hits, elevate_ids, exclude_ids, k=k,
                           mark_excludes=mark_excludes, exclusive=exclusive)
