"""StandardQueryParser twin: the flexible query parser's CONFIG surface.

The reference's flexible parser (lucene/queryparser/src/java/org/
apache/lucene/queryparser/flexible/standard/StandardQueryParser.java)
parses the same classic syntax but routes every query node through a
processor pipeline driven by StandardQueryConfigHandler settings.
This twin implements that configuration surface over the existing
clause parser (search/queryparser.py) — the processors become clause
transforms applied before query building:

  * default_operator (OR/AND) — GroupQueryNodeProcessor semantics:
    with AND, bare clauses become MUST; an explicit OR keeps (and
    retroactively makes) both neighbors SHOULD; explicit +/-/AND
    always win.
  * allow_leading_wildcard (default False) —
    AllowLeadingWildcardProcessor: a wildcard starting with * or ?
    raises (WildcardQueryNodeProcessor contract).
  * lowercase_expanded_terms (default True) —
    LowercaseExpandedTermsQueryNodeProcessor: prefix/wildcard/fuzzy/
    range patterns fold to lowercase before term-dictionary expansion
    (plain terms always go through the analyzer).
  * multi_fields + fields_boost — MultiFieldQueryNodeProcessor +
    BoostQueryNodeProcessor: a clause with no explicit field expands
    to one clause per configured field, boost multiplied by the
    field's boost.
  * phrase_slop — DefaultPhraseSlopQueryNodeProcessor: phrases
    WITHOUT an explicit ~N get the configured default slop.
  * fuzzy_min_sim / fuzzy_prefix_length —
    FuzzyQueryNodeProcessor: a bare `term~` converts min-similarity
    to max edits with FuzzyQuery.floatToEdits (FuzzyQuery.java:
    floatToEdits): edits = min(floor((1-minSim)*len(term)), 2);
    an explicit `term~N` keeps N.

PrecedenceQueryParser (the other flexible-parser entry point) lives
in search/queryparser.py::parse_precedence.
"""

from __future__ import annotations

from dataclasses import replace

from .queryparser import ParsedClause, parse_clauses, parse_query

_EXPANDED = ("prefix", "fuzzy", "wildcard", "range")


def float_to_edits(min_similarity: float, term_len: int) -> int:
    """FuzzyQuery.floatToEdits (lucene/core/.../search/FuzzyQuery.java)."""
    if min_similarity >= 1.0:
        return min(int(min_similarity), 2)
    if min_similarity == 0.0:
        return 0
    return min(int((1.0 - min_similarity) * term_len), 2)


class StandardQueryParser:
    """Configurable parser producing a BooleanQuery via the shared
    clause machinery; parse() mirrors StandardQueryParser.parse()."""

    def __init__(self, *,
                 default_operator: str = "OR",
                 lowercase_expanded_terms: bool = True,
                 allow_leading_wildcard: bool = False,
                 multi_fields: list[str] | None = None,
                 fields_boost: dict[str, float] | None = None,
                 phrase_slop: int = 0,
                 fuzzy_min_sim: float | None = None,
                 fuzzy_prefix_length: int = 0):
        if default_operator not in ("OR", "AND"):
            raise ValueError("default_operator must be OR or AND")
        self.default_operator = default_operator
        self.lowercase_expanded_terms = lowercase_expanded_terms
        self.allow_leading_wildcard = allow_leading_wildcard
        self.multi_fields = list(multi_fields) if multi_fields else None
        self.fields_boost = dict(fields_boost or {})
        self.phrase_slop = phrase_slop
        self.fuzzy_min_sim = fuzzy_min_sim
        self.fuzzy_prefix_length = fuzzy_prefix_length

    # --- the processor pipeline as clause transforms ---

    def _apply_default_operator(self, cls: list[ParsedClause]) -> None:
        if self.default_operator != "AND":
            return
        # parse_clauses marks BOTH neighbors of an explicit OR with
        # or_joined, so the flag alone identifies every OR-touched
        # clause — no lookahead (which would leak the OR's SHOULD one
        # clause too far left: "a b OR c" must keep a MUST).
        for cl in cls:
            if cl.explicit_occur:
                continue
            cl.occur = "SHOULD" if cl.or_joined else "MUST"

    def _check_leading_wildcard(self, cl: ParsedClause) -> None:
        if not self.allow_leading_wildcard and cl.kind == "wildcard" \
                and cl.text[:1] in "*?":
            raise ValueError(
                "leading wildcard is not allowed: set "
                "allow_leading_wildcard (AllowLeadingWildcardProcessor)")

    def _lowercase_expanded(self, cl: ParsedClause) -> ParsedClause:
        if cl.kind not in _EXPANDED:
            return cl
        if self.lowercase_expanded_terms:
            # parse_clauses already folds range bounds (the classic
            # parser's analyzeRangePart behavior); fold the others
            return replace(cl, text=cl.text.lower())
        # case-preserving mode: restore the raw range bounds the clause
        # parser kept alongside the folded ones
        if cl.range_bounds and cl.range_bounds_raw:
            lo, hi = cl.range_bounds_raw
            return replace(cl, range_bounds=(lo, hi) + cl.range_bounds[2:])
        return cl

    def _apply_phrase_slop(self, cl: ParsedClause) -> ParsedClause:
        if cl.kind == "phrase" and cl.slop == 0 and self.phrase_slop:
            return replace(cl, slop=self.phrase_slop)
        return cl

    def _apply_fuzzy_config(self, cl: ParsedClause) -> ParsedClause:
        if cl.kind != "fuzzy" or cl.fuzzy_explicit \
                or self.fuzzy_min_sim is None:
            return cl
        return replace(cl, fuzzy_edits=float_to_edits(
            self.fuzzy_min_sim, len(cl.text)))

    def _expand_fields(self, cl: ParsedClause) -> list[ParsedClause]:
        if cl.field is not None or not self.multi_fields:
            return [cl]
        return [replace(cl, field=f,
                        boost=cl.boost * self.fields_boost.get(f, 1.0))
                for f in self.multi_fields]

    def process(self, q: str) -> list[ParsedClause]:
        cls = parse_clauses(q)
        self._apply_default_operator(cls)
        out: list[ParsedClause] = []
        for cl in cls:
            self._check_leading_wildcard(cl)
            cl = self._lowercase_expanded(cl)
            cl = self._apply_phrase_slop(cl)
            cl = self._apply_fuzzy_config(cl)
            out.extend(self._expand_fields(cl))
        return out

    def parse(self, q: str, searcher=None, k: int = 10,
              default_field: str | None = None, **kw):
        """-> BooleanQuery, ready for the engine (same contract as
        queryparser.parse_query)."""
        return parse_query(q, searcher=searcher, k=k,
                           default_field=default_field,
                           clauses=self.process(q), **kw)
