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


def default_handler() -> SearchHandler:
    return (SearchHandler()
            .register("query", query_component)
            .register("facet", facet_component)
            .register("highlight", highlight_component))


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
