"""Request-plumbing extension surfaces (SURVEY §2.I):

* ``QPARSER_REGISTRY`` — the QParserPlugin registry analog (ref:
  solr/core/src/java/org/apache/solr/search/QParserPlugin.java:32-50
  ``standardPlugins``): defType/localparam name -> parser entry point.
* ``SearchHandler`` — the SearchComponent chain analog (ref: solr/core/
  .../handler/component/SearchHandler.java:55-120, SearchComponent.java):
  an ordered list of components each contributing one section of the
  response; QueryComponent runs first and later components see its hits.
* ``UpdateProcessorChain`` — the UpdateRequestProcessorChain analog
  (ref: solr/core/.../update/processor/UpdateRequestProcessorChain.java
  :40-80): ordered DataFrame -> DataFrame processors applied to an
  ingest batch before indexing (dedup, lang-id, field mutation — the
  chain shape Solr configures in solrconfig.xml).

All three are deliberately thin: the heavy lifting stays in the
declarative operators they call, so Catalyst still sees one composed
plan per request.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _qparser_registry() -> dict[str, Callable]:
    from ..search.queryparser import (parse_complex_phrase, parse_dismax,
                                      parse_query, parse_surround)

    def term_parser(q: str, searcher, **kw):
        """TermQParserPlugin: the raw term, no analysis/syntax."""
        from ..search.engine import BooleanQuery
        return BooleanQuery(should=[searcher.term_key(
            kw.get("f") or searcher.default_field, q)] if searcher.fields
            else [q])

    def prefix_parser(q: str, searcher, **kw):
        """PrefixQParserPlugin."""
        return parse_query(q.rstrip("*") + "*", searcher)

    def raw_parser(q: str, searcher, **kw):
        """RawQParserPlugin: the exact term, no analysis at all."""
        from ..search.engine import BooleanQuery
        f = kw.get("f")
        t = searcher.term_key(f or searcher.default_field, q) \
            if getattr(searcher, "fields", None) else q
        return BooleanQuery(should=[t])

    def field_parser(q: str, searcher, **kw):
        """FieldQParserPlugin: analyze the whole value against one
        field; one token -> TermQuery, several -> PhraseQuery (ref:
        solr/.../search/FieldQParserPlugin.java)."""
        from ..analysis.standard import analyze_text
        from ..search.engine import BooleanQuery, PhraseClause
        f = kw.get("f")
        toks = analyze_text(q)
        if getattr(searcher, "fields", None) and (f or searcher.default_field):
            toks = [searcher.term_key(f or searcher.default_field, t)
                    for t in toks]
        if len(toks) <= 1:
            return BooleanQuery(should=list(toks))
        bq = BooleanQuery()
        bq.phrases.append(PhraseClause(tuple(toks), 0, "MUST", 1.0))
        return bq

    def func_parser(q: str, searcher, **kw):
        """FunctionQParserPlugin ({!func}): every doc matches, score =
        the function value over the docs table (ref: solr/.../search/
        FunctionQParserPlugin.java). EXECUTES: returns the top-k
        DataFrame(docid, score, rank)."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from ..search.function_query import parse_func_expr, searcher_sources
        col = parse_func_expr(q, sources=searcher_sources(searcher))
        k = kw.get("k", 10)
        docs = searcher.spark.read.parquet(searcher.paths.docs)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return (docs.select("docid", col.cast("float").alias("score"))
                .orderBy(F.desc("score"), F.asc("docid")).limit(k)
                .withColumn("rank", F.row_number().over(w)))

    def frange_parser(q: str, searcher, l=None, u=None,  # noqa: E741
                      incl: bool = True, incu: bool = True, **kw):
        """FunctionRangeQParserPlugin ({!frange l=.. u=..}): constant-
        score filter on a function value (ref: solr/.../search/
        FunctionRangeQParserPlugin.java). EXECUTES: returns
        DataFrame(docid, score=1.0) of matching docs, composable as a
        docid_filter for search()."""
        from pyspark.sql import functions as F

        from ..search.function_query import parse_func_expr, searcher_sources
        col = parse_func_expr(q, sources=searcher_sources(searcher))
        docs = searcher.spark.read.parquet(searcher.paths.docs)
        pred = F.lit(True)
        if l is not None:
            pred = pred & (col >= float(l) if incl else col > float(l))
        if u is not None:
            pred = pred & (col <= float(u) if incu else col < float(u))
        return docs.filter(pred).select(
            "docid", F.lit(1.0).cast("float").alias("score"))

    def boost_parser(q: str, searcher, b: str = "1", **kw):
        """BoostQParserPlugin ({!boost b=func}q): inner lucene query's
        scores multiplied by a function value (ref: solr/.../search/
        BoostQParserPlugin.java). EXECUTES: top-k after the boost."""
        from pyspark.sql import functions as F

        from ..search.function_query import parse_func_expr, searcher_sources
        col = parse_func_expr(b, sources=searcher_sources(searcher))
        k = kw.get("k", 10)
        hits = searcher.search(parse_query(q, searcher), k=2**31 - 1)
        docs = searcher.spark.read.parquet(searcher.paths.docs)
        vals = docs.select("docid", col.cast("float").alias("_b"))
        boosted = (hits.join(vals, "docid")
                   .withColumn("score", (F.col("score") * F.col("_b"))
                               .cast("float"))
                   .select("docid", "score"))
        from pyspark.sql.window import Window
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return (boosted.orderBy(F.desc("score"), F.asc("docid")).limit(k)
                .withColumn("rank", F.row_number().over(w)))

    def switch_parser(q: str, searcher, **kw):
        """SwitchQParserPlugin ({!switch case.a=... default=...}): the
        query text selects a configured sub-query (ref: solr/.../search/
        SwitchQParserPlugin.java — acts like a param-driven 'case')."""
        key = f"case.{q.strip()}" if q.strip() else "case"
        sub = kw.get(key, kw.get("default"))
        if sub is None:
            raise KeyError(f"switch: no case matches {q!r} and no default")
        return parse_query(sub, searcher)

    def nested_parser(q: str, searcher, defType: str = "lucene",
                      v: str | None = None, **kw):
        """NestedQParserPlugin ({!query defType=.. v=..}): delegate to
        another registered parser (ref: solr/.../search/
        NestedQParserPlugin.java)."""
        return QPARSER_REGISTRY[defType](v if v is not None else q,
                                         searcher, **kw)

    def join_parser(q: str, searcher, attrs=None, to_attrs=None,
                    **kw):
        """JoinQParserPlugin ({!join from=f to=t}subquery, ref: solr/
        .../search/JoinQParserPlugin.java): constant-score set of docs
        whose `to` value appears among the `from` values of the
        subquery's matches. `attrs` = DataFrame(docid, <from col>, ...)
        for the from side; `to_attrs` = the to side (defaults to
        `attrs` — the single-core case; fromIndex's cross-core join is
        the two-DataFrame form). EXECUTES: DataFrame(docid, score=1.0),
        composable as docid_filter."""
        from pyspark.sql import functions as F

        from ..search.join import join_query
        if attrs is None:
            raise ValueError("join parser needs attrs=DataFrame("
                             "docid, ...)")
        frm, to = kw.get("from"), kw.get("to")
        if not frm or not to:
            raise ValueError("join parser needs from= and to= params")
        sub = kw.get("defType", "lucene")
        hits = searcher.search(
            QPARSER_REGISTRY[sub](q, searcher), k=2**31 - 1)
        from_rows = hits.join(attrs, "docid").select(frm)
        out = join_query(from_rows, frm, to_attrs or attrs, to)
        return out.select("docid",
                          F.lit(1.0).cast("float").alias("score"))

    def geofilt_parser(q: str, searcher, spatial_index: str = None,
                       pt: str = None, d: float = None, level: int = 11,
                       **kw):
        """SpatialFilterQParserPlugin {!geofilt pt=lat,lon d=km} (ref:
        solr/.../search/SpatialFilterQParserPlugin.java): constant-score
        points within d km of pt, via the quad prefix-tree index.
        EXECUTES: DataFrame(docid, score=1.0, dist_km)."""
        from pyspark.sql import functions as F

        from ..search.spatial import geo_distance_search
        if spatial_index is None or pt is None or d is None:
            raise ValueError("geofilt needs spatial_index=, pt=, d=")
        lat, lon = (float(x) for x in pt.split(","))
        out = geo_distance_search(searcher.spark, spatial_index,
                                  lat, lon, float(d), level=level)
        return out.select("docid",
                          F.lit(1.0).cast("float").alias("score"),
                          "dist_km")

    def bbox_parser(q: str, searcher, spatial_index: str = None,
                    pt: str = None, d: float = None, level: int = 11,
                    **kw):
        """BBoxQParserPlugin analog {!bbox pt=lat,lon d=km}: the
        bounding-box relaxation of geofilt (SpatialFilterQParserPlugin
        with bbox=true). EXECUTES."""
        import math as _m

        from pyspark.sql import functions as F

        from ..search.spatial import EARTH_RADIUS_KM, geo_bbox_search
        if spatial_index is None or pt is None or d is None:
            raise ValueError("bbox needs spatial_index=, pt=, d=")
        lat, lon = (float(x) for x in pt.split(","))
        dlat = _m.degrees(float(d) / EARTH_RADIUS_KM)
        cosl = max(1e-9, _m.cos(_m.radians(lat)))
        dlon = min(180.0, _m.degrees(float(d) / (EARTH_RADIUS_KM * cosl)))
        out = geo_bbox_search(searcher.spark, spatial_index,
                              max(-90.0, lat - dlat),
                              min(90.0, lat + dlat),
                              lon - dlon, lon + dlon, level=level)
        return out.select("docid",
                          F.lit(1.0).cast("float").alias("score"))

    def maxscore_parser(q: str, searcher, tie: float = 0.0, **kw):
        """MaxScoreQParserPlugin (ref: solr/.../search/
        MaxScoreQParserPlugin.java): like lucene, but SHOULD clauses
        combine with MAX (+ tie * sum of the rest) instead of sum;
        MUST/MUST_NOT keep normal semantics. EXECUTES top-k."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        bq = parse_query(q, searcher, k=kw.get("k", 10))
        k = kw.get("k", 10)
        cur = None
        for i, t in enumerate(dict.fromkeys(bq.should)):
            d = (searcher.search([t], "OR", k=2**31 - 1)
                 .select("docid", F.col("score").alias(f"s{i}")))
            cur = d if cur is None else cur.join(d, "docid", "outer")
        if cur is None:
            return searcher.search(bq)
        n = len(dict.fromkeys(bq.should))
        cols = [F.coalesce(F.col(f"s{i}"), F.lit(0.0).cast("float"))
                for i in range(n)]
        mx = F.greatest(*cols) if n > 1 else cols[0]
        total = sum(cols[1:], cols[0])
        score = (mx + F.lit(float(tie)) * (total - mx)).cast("float")
        hits = cur.select("docid", score.alias("score"))
        if bq.must:
            musts = searcher.search(bq.must, "AND", k=2**31 - 1) \
                .select("docid", F.col("score").alias("_ms"))
            hits = (hits.join(musts, "docid")
                    .withColumn("score", (F.col("score") + F.col("_ms"))
                                .cast("float")).drop("_ms"))
        if bq.must_not:
            excl = searcher.search(bq.must_not, "OR", k=2**31 - 1) \
                .select("docid")
            hits = hits.join(excl, "docid", "left_anti")
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return (hits.orderBy(F.desc("score"), F.asc("docid")).limit(k)
                .withColumn("rank", F.row_number().over(w)))

    def xml_parser(q: str, searcher, **kw):
        """XmlQParserPlugin analog over the CoreParser element registry
        (ref: lucene/queryparser/.../xml/CoreParser.java:34). EXECUTES."""
        from ..search.xmlparser import xml_search
        return xml_search(searcher, q, k=kw.get("k", 10))

    return {
        "lucene": lambda q, searcher, **kw: parse_query(q, searcher),
        "dismax": parse_dismax,
        "edismax": parse_dismax,
        "term": term_parser,
        "prefix": prefix_parser,
        # these two EXECUTE (positional engine) rather than return a
        # BooleanQuery — the reference's ComplexPhrase/surround parsers
        # also produce span queries outside the boolean algebra
        "complexphrase": lambda q, searcher, **kw:
            parse_complex_phrase(searcher, q, k=kw.get("k", 10)),
        "surround": lambda q, searcher, **kw:
            parse_surround(searcher, q, k=kw.get("k", 10)),
        "raw": raw_parser,
        "field": field_parser,
        # func/frange/boost EXECUTE over the function-query surface
        "func": func_parser,
        "frange": frange_parser,
        "boost": boost_parser,
        "switch": switch_parser,
        "query": nested_parser,        # Solr registers Nested as "query"
        "xmlparser": xml_parser,
        "join": join_parser,
        "geofilt": geofilt_parser,
        "bbox": bbox_parser,
        "maxscore": maxscore_parser,
    }


QPARSER_REGISTRY: dict[str, Callable] = _qparser_registry()


def get_qparser(name: str) -> Callable:
    """QParserPlugin lookup by defType (KeyError on unknown, like
    Solr's 'unknown query parser' error)."""
    return QPARSER_REGISTRY[name]


class SearchHandler:
    """Ordered component chain: each component is
    ``fn(searcher, params, response) -> None`` and mutates the response
    dict (its named section). The stock chain mirrors Solr's default
    (query, facet, highlight, stats — SearchHandler.java's
    DEFAULT_COMPONENTS minus debug/mlt, which remain registrable)."""

    def __init__(self):
        self.components: list[tuple[str, Callable]] = []

    def register(self, name: str, fn: Callable) -> "SearchHandler":
        self.components.append((name, fn))
        return self

    def handle(self, searcher, params: dict) -> dict:
        response: dict = {"params": dict(params)}
        for _, fn in self.components:
            fn(searcher, params, response)
        return response


def query_component(searcher, params: dict, response: dict) -> None:
    """QueryComponent: parse with the requested defType and execute;
    puts the top-k DataFrame under response['hits']."""
    deftype = params.get("defType", "lucene")
    q = params["q"]
    k = int(params.get("rows", 10))
    if deftype in ("dismax", "edismax"):
        execute = get_qparser(deftype)(q, searcher, params.get("qf", ""),
                                       tie=float(params.get("tie", 0.0)),
                                       mm=int(params.get("mm", 0)), k=k)
        response["hits"] = execute()
        return
    bq = get_qparser(deftype)(q, searcher, f=params.get("f"))
    bq.k = k
    response["hits"] = searcher.search(bq)


def facet_component(searcher, params: dict, response: dict) -> None:
    """FacetComponent over the docs table restricted to the hits."""
    if not params.get("facet.field"):
        return
    from pyspark.sql import functions as F
    fld = params["facet.field"]
    docs = searcher.spark.read.parquet(searcher.paths.docs)
    hits = response["hits"].select("docid")
    response["facets"] = (docs.join(hits, "docid", "left_semi")
                          .groupBy(fld).count()
                          .orderBy(F.desc("count"), F.asc(fld)))


def highlight_component(searcher, params: dict, response: dict) -> None:
    """HighlightComponent: snippet per hit via solr/highlight.py."""
    if not params.get("hl"):
        return
    from .highlight import highlight
    with_text = searcher.fetch_fields(response["hits"],
                                      cols=("url", "text"))
    response["highlighting"] = highlight(with_text, params["q"])


def elevation_component(searcher, params: dict, response: dict) -> None:
    """QueryElevationComponent (ref: solr/.../component/
    QueryElevationComponent.java:91): looks the analyzed q up in
    params['elevations'] (a parse_elevate_xml map) and re-ranks/inserts
    per the editorial entry. The reference runs this at prepare() time
    by rewriting the query + sort; with this engine's score-desc model
    the post-pass is equivalent (elevated-first comparator + forced
    insert + excludes), so it registers AFTER query_component."""
    elev = params.get("elevations")
    if not elev or not params.get("enableElevation", True):
        return
    from .elevate import elevated_search
    response["hits"] = elevated_search(
        searcher, params["q"], elev, k=int(params.get("rows", 10)),
        mark_excludes=bool(params.get("markExcludes", False)),
        exclusive=bool(params.get("exclusive", False)))


def term_vector_component(searcher, params: dict, response: dict) -> None:
    """TermVectorComponent (ref: solr/.../component/TermVectorComponent
    .java:158-400): per-hit term vectors from the vectors side table
    (params['tv.path']), with tv.positions/tv.offsets/tv.df/tv.tf_idf
    flags (tv.all turns everything on). Collects only the top-k docids
    driver-side; the vector fetch prunes by docid."""
    if not params.get("tv") or not params.get("tv.path"):
        return
    from ..index.termvectors import term_vectors_for_docs
    docids = [r["docid"] for r in
              response["hits"].select("docid").collect()]
    allf = bool(params.get("tv.all", False))
    response["termVectors"] = term_vectors_for_docs(
        searcher.spark, params["tv.path"], docids,
        positions=allf or bool(params.get("tv.positions", False)),
        offsets=allf or bool(params.get("tv.offsets", False)),
        termstats_path=searcher.paths.termstats,
        df_counts=allf or bool(params.get("tv.df", False)),
        tf_idf=allf or bool(params.get("tv.tf_idf", False)))


def debug_component(searcher, params: dict, response: dict) -> None:
    """DebugComponent (ref: solr/.../component/DebugComponent.java:49):
    ``debugQuery=true`` attaches the per-hit scoring explanation — the
    'explain' section — as a DataFrame of (docid, rank, total_score,
    term, freq, df, idf, weight_value, norm_byte, norm_cache, contrib)
    rows via IndexSearcher.explain_hits, plus the analyzed querystring
    (the 'querystring'/'parsedquery' debug keys)."""
    if not params.get("debugQuery", False):
        return
    from ..analysis.standard import analyze_text
    q = params["q"]
    response["debug"] = {
        "querystring": q,
        "parsedquery": analyze_text(q) if isinstance(q, str) else list(q),
        "explain": searcher.explain_hits(
            q, op=params.get("q.op", "OR"),
            k=int(params.get("rows", 10))),
    }


def default_handler() -> SearchHandler:
    return (SearchHandler()
            .register("query", query_component)
            .register("elevate", elevation_component)
            .register("tv", term_vector_component)
            .register("facet", facet_component)
            .register("highlight", highlight_component)
            .register("debug", debug_component))


class UpdateProcessorChain:
    """Ordered DataFrame processors applied to an ingest batch; each is
    ``fn(DataFrame) -> DataFrame`` (LogUpdate/DistributedUpdate analogs
    are the identity here — routing happens in assign_docids)."""

    def __init__(self, *processors: Callable[[DataFrame], DataFrame]):
        self.processors = list(processors)

    def then(self, fn: Callable[[DataFrame], DataFrame]
             ) -> "UpdateProcessorChain":
        self.processors.append(fn)
        return self

    def process(self, batch: DataFrame) -> DataFrame:
        for fn in self.processors:
            batch = fn(batch)
        return batch
