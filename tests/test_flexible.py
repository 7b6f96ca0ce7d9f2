# StandardQueryParser config surface (flexible parser twin):
# processor behaviors per lucene/queryparser/.../flexible/standard/
# StandardQueryParser.java and its processors package.
import pytest

from lucene_solr_1_spark.search.flexible import (StandardQueryParser,
                                                 float_to_edits)


def kinds(cls):
    return [(c.text, c.occur) for c in cls]


def test_default_operator_or():
    p = StandardQueryParser()
    assert kinds(p.process("a b")) == [("a", "SHOULD"), ("b", "SHOULD")]


def test_default_operator_and():
    p = StandardQueryParser(default_operator="AND")
    assert kinds(p.process("a b")) == [("a", "MUST"), ("b", "MUST")]
    # explicit OR keeps both neighbors SHOULD (GroupQueryNodeProcessor)
    assert kinds(p.process("a OR b")) == [("a", "SHOULD"), ("b", "SHOULD")]
    # mixed: "a OR b c" -> a b SHOULD (or-joined), c MUST (default)
    assert kinds(p.process("a OR b c")) == [
        ("a", "SHOULD"), ("b", "SHOULD"), ("c", "MUST")]
    # explicit modifiers always win
    assert kinds(p.process("+a OR b -c")) == [
        ("a", "MUST"), ("b", "SHOULD"), ("c", "MUST_NOT")]
    # the OR's SHOULD effect touches only its two neighbors: "a" here
    # is NOT adjacent to the OR and stays required under AND default
    assert kinds(p.process("a b OR c")) == [
        ("a", "MUST"), ("b", "SHOULD"), ("c", "SHOULD")]


def test_leading_wildcard_rejected_by_default():
    p = StandardQueryParser()
    with pytest.raises(ValueError):
        p.process("*oo")
    with pytest.raises(ValueError):
        p.process("?oo")
    # allowed when configured (AllowLeadingWildcardProcessor)
    p2 = StandardQueryParser(allow_leading_wildcard=True)
    assert p2.process("*oo")[0].kind == "wildcard"
    # trailing wildcard is always fine
    assert p.process("fo*")[0].kind == "prefix"


def test_lowercase_expanded_terms():
    p = StandardQueryParser()
    assert p.process("FOO*")[0].text == "foo"
    assert p.process("F?O")[0].text == "f?o"
    assert p.process("FOO~")[0].text == "foo"
    p2 = StandardQueryParser(lowercase_expanded_terms=False)
    assert p2.process("FOO*")[0].text == "FOO"
    # plain terms are untouched here (the analyzer folds them later)
    assert p2.process("FOO")[0].text == "FOO"
    # range bounds: folded by default (classic analyzeRangePart),
    # case-preserved when the flag is off
    assert p.process("f:[Alpha TO Omega]")[0].range_bounds[:2] == (
        "alpha", "omega")
    assert p2.process("f:[Alpha TO Omega]")[0].range_bounds[:2] == (
        "Alpha", "Omega")


def test_multi_fields_and_boosts():
    p = StandardQueryParser(multi_fields=["title", "body"],
                            fields_boost={"title": 5.0})
    cls = p.process("hello")
    assert [(c.field, c.boost) for c in cls] == [("title", 5.0),
                                                 ("body", 1.0)]
    # explicit field wins over the multi-field expansion
    cls2 = p.process("body:hello")
    assert [(c.field, c.boost) for c in cls2] == [("body", 1.0)]


def test_phrase_slop_default():
    p = StandardQueryParser(phrase_slop=3)
    assert p.process('"a b"')[0].slop == 3
    # explicit ~N wins (DefaultPhraseSlopQueryNodeProcessor)
    assert p.process('"a b"~1')[0].slop == 1
    # no config: stays exact
    assert StandardQueryParser().process('"a b"')[0].slop == 0


def test_float_to_edits():
    # FuzzyQuery.floatToEdits table
    assert float_to_edits(0.5, 4) == 2
    assert float_to_edits(0.5, 3) == 1
    assert float_to_edits(0.0, 9) == 0
    assert float_to_edits(1.0, 9) == 1
    # (1-0.8)*10 = 1.999… truncates to 1 — the same double-math
    # truncation Java's (int) cast performs
    assert float_to_edits(0.8, 10) == 1
    assert float_to_edits(0.5, 10) == 2  # capped at 2 for long terms


def test_fuzzy_min_sim_applies_to_bare_tilde_only():
    p = StandardQueryParser(fuzzy_min_sim=0.7)
    cl = p.process("roam~")[0]
    assert cl.kind == "fuzzy" and cl.fuzzy_edits == 1  # (1-0.7)*4=1.2
    cl2 = p.process("roam~2")[0]
    assert cl2.fuzzy_edits == 2  # explicit edits win


def test_parse_end_to_end_builds_boolean_query():
    p = StandardQueryParser(default_operator="AND")
    bq = p.parse("merge join")
    assert sorted(bq.must) == ["join", "merge"]
    bq2 = StandardQueryParser().parse("merge join")
    assert sorted(bq2.should) == ["join", "merge"]
    assert bq2.min_should_match == 1
