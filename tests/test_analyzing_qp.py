"""AnalyzingQueryParser (search/queryparser.py::analyzing_parse_query)
vs the reference's TestAnalyzingQueryParser behaviors: wildcard chunks
and range bounds go through the analyzer; a chunk analyzing to more
than one token is a parse error.
"""
import pytest

from lucene_solr_1_spark.search.queryparser import (
    _clause_to_text, analyzing_rewrite_clause, parse_clauses)


def _rewrite(q):
    out = []
    for c in parse_clauses(q):
        if c.kind in ("wildcard", "range"):
            c = analyzing_rewrite_clause(c)
        out.append(_clause_to_text(c))
    return out


def test_wildcard_chunks_analyzed():
    """TestAnalyzingQueryParser.testWildCardQuery analog: literal
    chunks lowercase through the analyzer, wildcards survive."""
    assert _rewrite("FOO*bar?") == ["foo*bar?"]
    assert _rewrite("Lu*ene") == ["lu*ene"]
    assert _rewrite("*ENE") == ["*ene"]          # leading chunk skipped


def test_range_bounds_analyzed():
    """setAnalyzeRangeTerms(true): bounds analyze."""
    assert _rewrite("[Apple TO Zebra]") == ["[apple TO zebra]"]


def test_multi_token_chunk_is_parse_error():
    """analyzeSingleChunk: >1 output token -> error
    (AnalyzingQueryParser.java:185)."""
    cl = parse_clauses("cat-dog*")[0]
    if cl.kind == "prefix":
        pytest.skip("prefix path analyzes in _expand")
    with pytest.raises(ValueError, match="multiple terms"):
        analyzing_rewrite_clause(cl)
    with pytest.raises(ValueError, match="multiple terms"):
        analyzing_rewrite_clause(parse_clauses("cat-dog*x?")[0])


def test_stopword_chunk_collapses_to_one_token():
    """A chunk whose analysis drops a stopword but still yields one
    token is fine ('a-b' -> 'b')."""
    assert _rewrite("a-b*xyz?") == ["b*xyz?"]


def test_escaped_wildcard_not_a_chunk_boundary():
    """An escaped '*' is gobbled by the (\\.) group — it does NOT
    split the chunk; the whole literal (incl. backslash) goes to the
    analyzer, which here splits it -> parse error, same as the
    reference analyzer would produce for 'FOO\\*BAR'."""
    cl = parse_clauses(r"FOO\*BAR?x")[0]
    assert cl.kind == "wildcard"
    with pytest.raises(ValueError, match="multiple terms"):
        analyzing_rewrite_clause(cl)
