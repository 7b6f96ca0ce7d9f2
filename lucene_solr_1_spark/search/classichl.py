"""Classic Highlighter twin (lucene/highlighter/src/java/.../highlight/).

The TokenStream-driven highlighter: Highlighter.getBestTextFragments
(Highlighter.java:178-330) walks the analyzed tokens of a stored
field, groups overlapping tokens (TokenGroup.java:48-81), marks up
groups whose score is positive (SimpleHTMLFormatter: <B></B>), and
splits fragments with a pluggable Fragmenter:

  * SimpleFragmenter (SimpleFragmenter.java): new fragment when the
    incoming token's end offset crosses fragmentSize * fragNum.
  * SimpleSpanFragmenter (SimpleSpanFragmenter.java:64-95): same,
    PLUS never splits inside a phrase span (waitForPos) and never
    starts a new fragment when fewer than fragmentSize/2 chars remain
    — the guard that keeps a 139-char text one fragment at size 100
    (pinned by HighlighterTest.testHighlightingCommonTermsQuery).

Scoring is QueryScorer (QueryScorer.java:104-135): a matched token
contributes its WeightedSpanTerm weight (= query boost) to the token
markup every occurrence, but to the FRAGMENT score only once per
unique term (foundTerms).  Phrase terms are position-sensitive:
WeightedSpanTermExtractor converts a PhraseQuery to ordered position
spans; tokens outside every span score 0 (checkPosition).

Fragment selection: top-N by score (ties prefer the earlier
fragment, FragmentQueue), contiguous selected fragments merged
(mergeContiguousFragments:367-436, merged score = max), then joined
with the separator, skipping zero-score fragments.

Query tuples use the same shape as search/fvh.py:
("term", text[, boost]) | ("phrase", [texts], slop[, boost]).
"""

from __future__ import annotations

import re


class WeightedSpanTerm:
    __slots__ = ("weight", "spans")

    def __init__(self, weight: float, spans=None):
        self.weight = weight
        self.spans = spans  # None = not position sensitive

    def check_position(self, position: int) -> bool:
        if self.spans is None:
            return True
        return any(s <= position <= e for s, e in self.spans)


def _phrase_spans(terms: list[str], slop: int,
                  tokens: list) -> list[tuple[int, int]]:
    """Ordered sloppy span matching (the SpanNearQuery the extractor
    builds, inOrder=true): position windows containing the terms in
    order with total excess gap <= slop."""
    positions: dict[str, list[int]] = {}
    for pos, (t, _s, _e) in enumerate(tokens):
        positions.setdefault(t, []).append(pos)
    if any(t not in positions for t in terms):
        return []
    spans = []
    for p0 in positions[terms[0]]:
        cur = p0
        ok = True
        for t in terms[1:]:
            nxt = next((p for p in positions[t] if p > cur), None)
            if nxt is None:
                ok = False
                break
            cur = nxt
        if ok and (cur - p0) - (len(terms) - 1) <= slop:
            spans.append((p0, cur))
    return spans


def extract_weighted_terms(queries, tokens) -> dict:
    """WeightedSpanTermExtractor twin over the token stream."""
    out: dict[str, WeightedSpanTerm] = {}
    for q in queries:
        if q[0] == "term":
            boost = q[2] if len(q) > 2 else 1.0
            ex = out.get(q[1])
            if ex is None or ex.spans is not None:
                out[q[1]] = WeightedSpanTerm(boost)
        elif q[0] == "phrase":
            terms = list(q[1])
            slop = q[2] if len(q) > 2 else 0
            boost = q[3] if len(q) > 3 else 1.0
            spans = _phrase_spans(terms, slop, tokens)
            for t in terms:
                ex = out.get(t)
                if ex is not None and ex.spans is None:
                    continue  # a plain term entry wins (not sensitive)
                if ex is not None:
                    ex.spans = ex.spans + spans
                else:
                    out[t] = WeightedSpanTerm(boost, list(spans))
        else:
            raise ValueError(f"unknown query kind {q[0]!r}")
    return out


class TextFragment:
    __slots__ = ("start", "end", "score", "num")

    def __init__(self, start: int, num: int):
        self.start = start
        self.end = start
        self.score = 0.0
        self.num = num

    def follows(self, other: "TextFragment") -> bool:
        return self.start == other.end


def get_best_text_fragments(tokens, text: str, queries,
                            fragment_size: int = 100,
                            max_fragments: int = 1,
                            span_fragmenter: bool = True,
                            pre: str = "<B>", post: str = "</B>"):
    """-> (fragment strings best-score-first, scores) after contiguous
    merge — Highlighter.getBestTextFragments(merge=true)."""
    wst = extract_weighted_terms(queries, tokens)
    n = len(text)

    new_text: list[str] = []
    new_len = 0

    def emit(s: str) -> None:
        nonlocal new_len
        new_text.append(s)
        new_len += len(s)

    frags: list[TextFragment] = []
    current = TextFragment(0, 0)
    frags.append(current)
    found_terms: set[str] = set()
    frag_total = 0.0

    # fragmenter state
    frag_num = 1
    wait_for_pos = -1

    def is_new_fragment(term: str, position: int, end_offset: int) -> bool:
        nonlocal frag_num, wait_for_pos
        if wait_for_pos == position:
            wait_for_pos = -1
        elif wait_for_pos != -1:
            return False
        if span_fragmenter:
            w = wst.get(term)
            if w is not None and w.spans is not None:
                for s, e in w.spans:
                    if s == position:
                        wait_for_pos = e + 1
                        break
        is_new = end_offset >= fragment_size * frag_num
        if span_fragmenter:
            is_new = is_new and (n - end_offset) >= (fragment_size >> 1)
        if is_new:
            frag_num += 1
        return is_new

    def token_score(term: str, position: int) -> float:
        nonlocal frag_total
        w = wst.get(term)
        if w is None or not w.check_position(position):
            return 0.0
        if term not in found_terms:
            found_terms.add(term)
            frag_total += w.weight
        return w.weight

    # group state: (start, end, match_start, match_end, total)
    group = None
    last_end = 0

    def flush_group() -> None:
        nonlocal group, last_end
        g_start, g_end, m_start, m_end, tot = group
        token_text = text[m_start:m_end]
        marked = (pre + token_text + post) if tot > 0 else token_text
        if m_start > last_end:
            emit(text[last_end:m_start])
        emit(marked)
        last_end = max(m_end, last_end)
        group = None

    for position, (term, start, end) in enumerate(tokens):
        if group is not None and start >= group[1]:  # isDistinct
            flush_group()
            if is_new_fragment(term, position, end):
                current.score = frag_total
                current.end = new_len
                current = TextFragment(new_len, len(frags))
                frags.append(current)
                found_terms.clear()
                frag_total = 0.0
        score = token_score(term, position)
        if group is None:
            group = [start, end, start, end, score]
        else:
            group[0] = min(group[0], start)
            group[1] = max(group[1], end)
            if score > 0:
                if group[4] == 0:
                    group[2], group[3] = start, end
                else:
                    group[2] = min(group[2], start)
                    group[3] = max(group[3], end)
            group[4] += score
    current.score = frag_total
    if group is not None:
        flush_group()
    if last_end < n:
        emit(text[last_end:])
    current.end = new_len
    full = "".join(new_text)

    # top-N by (score desc, fragNum asc), then merge contiguous
    selected = sorted(frags, key=lambda f: (-f.score, f.num))[:max_fragments]
    merged = True
    while merged and len(selected) > 1:
        merged = False
        for i, a in enumerate(selected):
            for j, b in enumerate(selected):
                if i != j and a is not None and b is not None \
                        and b.follows(a):
                    a.end = b.end
                    a.score = max(a.score, b.score)
                    selected[j] = None
                    merged = True
        selected = [f for f in selected if f is not None]
    selected.sort(key=lambda f: (-f.score, f.num))
    return [(full[f.start:f.end], f.score) for f in selected]


def get_best_fragments(tokens, text: str, queries,
                       max_fragments: int = 2, separator: str = "...",
                       fragment_size: int = 100,
                       span_fragmenter: bool = True) -> str:
    """Highlighter.getBestFragments(stream, text, n, separator):
    join positive-score fragments."""
    frags = get_best_text_fragments(
        tokens, text, queries, fragment_size=fragment_size,
        max_fragments=max_fragments, span_fragmenter=span_fragmenter)
    return separator.join(s for s, score in frags if score > 0)


def get_best_fragment(tokens, text: str, queries,
                      fragment_size: int = 100,
                      span_fragmenter: bool = True) -> str | None:
    """None when nothing matched — Highlighter.getBestFragments only
    emits fragments with score > 0, so getBestFragment is null on a
    no-match document (Highlighter.java:352-356)."""
    frags = get_best_text_fragments(
        tokens, text, queries, fragment_size=fragment_size,
        max_fragments=1, span_fragmenter=span_fragmenter)
    if not frags or frags[0][1] <= 0:
        return None
    return frags[0][0]


_SIMPLE_RE = re.compile(r"[^\W\d_]+")


def simple_tokens(content: str):
    """MockTokenizer.SIMPLE + lowercase (the HighlighterTest analyzer)."""
    return [(m.group().lower(), m.start(), m.end())
            for m in _SIMPLE_RE.finditer(content)]
