"""XML query parser — the CoreParser analog.

ref: lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:34 (builder registry: TermQuery, BooleanQuery,
MatchAllDocsQuery, UserQuery, RangeQuery, DisjunctionMaxQuery,
ConstantScoreQuery, SpanTerm/SpanNear/SpanOr and friends), plus the
per-element builder classes under xml/builders/.

``parse_xml_query`` maps the XML tree onto this engine's existing
query algebra — BooleanQuery/term clauses where the element family is
boolean-shaped, the positional kernel for the span family — and
``xml_search`` executes any supported root element. Elements whose
builders the reference registers but that have no analog here raise
ValueError with the element name (explicit, not silent).

Query XML containing a DTD (``<!DOCTYPE`` / ``<!ENTITY``) is rejected
before parsing (ADVICE r3: stdlib ElementTree DOES expand internal
entities, and blowup protection would otherwise depend on the linked
Expat version — so untrusted query XML never reaches the expander).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame


def _fromstring(xml: str):
    """ET.fromstring with DTDs refused up front (billion-laughs /
    quadratic-blowup guard for untrusted query XML)."""
    if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
        raise ValueError("DTD (<!DOCTYPE/<!ENTITY) not allowed in query XML")
    return ET.fromstring(xml)


def _text(el) -> str:
    return (el.text or "").strip()


def _boost(el) -> float:
    return float(el.get("boost", "1.0"))


def parse_xml_query(xml: str, searcher=None, k: int = 10):
    """Parse into a BooleanQuery when the tree is boolean-shaped
    (TermQuery / BooleanQuery / UserQuery / RangeQuery /
    MatchAllDocsQuery roots). Span/dismax roots need ``xml_search``."""
    from .engine import BooleanQuery
    from .queryparser import ParsedClause, _expand, parse_query
    from ..analysis.standard import analyze_text

    root = _fromstring(xml)
    # summed clause weight per scoring term — the SAME accumulate-then-
    # fold parse_query uses (ADVICE r3: applying only boost != 1.0
    # occurrences directly gave `foo` + `foo^2` weight 2.0 here vs 3.0
    # via the classic parser for the equivalent query)
    acc: dict[str, float] = {}

    def score_occurrence(terms, boost: float) -> None:
        for t in terms:
            acc[t] = acc.get(t, 0.0) + boost

    def term_of(el) -> list[str]:
        toks = analyze_text(_text(el))
        fld = el.get("fieldName")
        if fld and getattr(searcher, "fields", None):
            toks = [searcher.term_key(fld, t) for t in toks]
        return toks

    def build(el, bq: BooleanQuery, occur: str) -> None:
        tag = el.tag
        if tag == "TermQuery":
            terms = term_of(el)
            target = {"MUST": bq.must, "SHOULD": bq.should,
                      "MUST_NOT": bq.must_not}[occur]
            target.extend(terms)
            if occur != "MUST_NOT":
                score_occurrence(terms, _boost(el))
        elif tag == "TermsQuery":
            # analyzed bag of terms, all SHOULD (TermsQueryBuilder)
            toks = term_of(el)
            if occur == "MUST_NOT":
                bq.must_not.extend(toks)
            else:
                bq.should.extend(toks)
                score_occurrence(toks, 1.0)
        elif tag == "UserQuery":
            inner = parse_query(_text(el), searcher, k=k)
            bq.must.extend(inner.must)
            bq.should.extend(inner.should)
            bq.must_not.extend(inner.must_not)
            bq.phrases.extend(inner.phrases)
            # re-open the inner parse's fold into this tree's
            # accumulator: each distinct inner scoring term summed to
            # inner.boosts[t] (or the implicit 1.0), so a term shared
            # with an outer TermQuery keeps accumulating
            for t in set(inner.must) | set(inner.should):
                acc[t] = acc.get(t, 0.0) + inner.boosts.get(t, 1.0)
            bq.min_should_match += inner.min_should_match
        elif tag == "RangeQuery":
            if searcher is None:
                raise ValueError("RangeQuery needs a searcher for rewrite")
            cl = ParsedClause(
                text="", kind="range",
                range_bounds=(el.get("lowerTerm"), el.get("upperTerm"),
                              el.get("includeLower", "true") == "true",
                              el.get("includeUpper", "true") == "true"))
            terms = _expand(searcher, cl, 512)
            if occur == "MUST_NOT":
                bq.must_not.extend(terms)
            else:
                bq.should.extend(terms)
                score_occurrence(terms, 1.0)
                if occur == "MUST" and terms:
                    bq.min_should_match += 1
        elif tag == "BooleanQuery":
            for cl_el in el:
                if cl_el.tag != "Clause":
                    raise ValueError(f"BooleanQuery child: {cl_el.tag}")
                occ = {"must": "MUST", "should": "SHOULD",
                       "mustNot": "MUST_NOT"}[cl_el.get("occurs", "should")]
                for child in cl_el:
                    build(child, bq, occ)
        else:
            raise ValueError(f"unsupported XML query element: {tag}")

    bq = BooleanQuery(k=k)
    build(root, bq, "SHOULD")
    # fold: a single unboosted occurrence (sum exactly 1.0) stays implicit
    for t, w in acc.items():
        if w != 1.0:
            bq.boosts[t] = w
    if bq.should and not bq.min_should_match and not bq.must:
        bq.min_should_match = 1
    return bq


def xml_search(searcher, xml: str, k: int = 10) -> DataFrame:
    """Execute any supported root element. Boolean-family roots go
    through parse_xml_query + search(); DisjunctionMaxQuery and the
    span family dispatch to their engines (dismax scoring /
    multi_phrase positional kernel)."""
    from pyspark.sql import functions as F

    root = _fromstring(xml)
    if root.tag == "MatchAllDocsQuery":
        docs = searcher.spark.read.parquet(searcher.paths.docs)
        return (docs.select("docid",
                            F.lit(1.0).cast("float").alias("score"))
                .orderBy("docid").limit(k))
    if root.tag == "DisjunctionMaxQuery":
        from ..analysis.standard import analyze_text
        tie = float(root.get("tieBreaker", "0.0"))
        groups = []
        for child in root:
            if child.tag != "TermQuery":
                raise ValueError(
                    f"DisjunctionMaxQuery child: {child.tag}")
            toks = analyze_text(_text(child))
            fld = child.get("fieldName")
            if fld and getattr(searcher, "fields", None):
                toks = [searcher.term_key(fld, t) for t in toks]
            groups.append(toks)
        # max over clause scores + tie * sum(others), DisMaxScorer
        cur = None
        for i, toks in enumerate(groups):
            d = (searcher.search(toks, "OR", k=2**31 - 1)
                 .select("docid", F.col("score").alias(f"s{i}")))
            cur = d if cur is None else cur.join(d, "docid", "outer")
        cols = [F.coalesce(F.col(f"s{i}"), F.lit(0.0).cast("float"))
                for i in range(len(groups))]
        mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
        total = sum(cols[1:], cols[0])
        score = (mx + F.lit(tie) * (total - mx)).cast("float")
        from pyspark.sql.window import Window
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return (cur.select("docid", score.alias("score"))
                .orderBy(F.desc("score"), F.asc("docid")).limit(k)
                .withColumn("rank", F.row_number().over(w)))
    if root.tag in ("SpanNear", "SpanOr"):
        from .phrase import multi_phrase_search
        from ..analysis.standard import analyze_text

        def slot_terms(el) -> list[str]:
            if el.tag == "SpanTerm":
                return analyze_text(_text(el))
            if el.tag == "SpanOr":
                out = []
                for c in el:
                    out.extend(slot_terms(c))
                return out
            raise ValueError(f"span element: {el.tag}")
        if root.tag == "SpanOr":
            slots = [sorted(set(slot_terms(root)))]
            return multi_phrase_search(searcher, slots, k=k)
        slop = int(root.get("slop", "0"))
        ordered = root.get("inOrder", "true") == "true"
        slots = [sorted(set(slot_terms(c))) for c in root]
        return multi_phrase_search(searcher, slots, slop=slop,
                                   ordered=ordered, strict=ordered, k=k)
    return searcher.search(parse_xml_query(xml, searcher, k=k))
