"""PostingsHighlighter twin: sentence passages ranked by BM25-ish score.

Mirrors lucene/highlighter/src/java/org/apache/lucene/search/
postingshighlight/: sentences (UAX#29, analysis/sentence.py) are
treated as miniature documents; each passage scores
``norm(startOffset) * sum_t(weight(t) * tf(freq_t, passageLen))``
(PostingsHighlighter.java:443-445) with the made-up-but-pinned
PassageScorer formulas (PassageScorer.java:73-104):

  weight(t) = (k1+1) * ln(1 + (1 + contentLength/pivot + 0.5) /
                              (totalTermFreq_t + 0.5))
  tf(f, L)  = f / (f + k1*((1-b) + b*L/pivot))
  norm(s)   = 1 + 1/ln(pivot + s)        (k1=1.2, b=0.75, pivot=87)

Top-N passages are selected by score (ties by start offset), then
re-sorted by position and formatted by the DefaultPassageFormatter
contract (DefaultPassageFormatter.java:61-90): "... " between
non-adjacent passages, <b></b> around matches, overlapping matches
merged left-to-right.  A doc with no matches falls back to its first
maxPassages sentences (getEmptyHighlight:576-594).

The reference reads match offsets from the postings
(DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS); this twin re-derives them
by running the analyzer over the stored content with offsets — the
same (term, start, end) stream the index writer recorded, without
needing the offsets stored per posting.
"""

from __future__ import annotations

import math
import re

from ..analysis.sentence import DONE, SentenceBreakIterator


class PassageScorer:
    """PassageScorer.java:31-104 (defaults k1=1.2, b=0.75, pivot=87)."""

    def __init__(self, k1: float = 1.2, b: float = 0.75,
                 pivot: float = 87.0):
        self.k1 = k1
        self.b = b
        self.pivot = pivot

    def weight(self, content_length: int, total_term_freq: int) -> float:
        num_docs = 1 + content_length / self.pivot
        return (self.k1 + 1) * math.log(
            1 + (num_docs + 0.5) / (total_term_freq + 0.5))

    def tf(self, freq: int, passage_len: int) -> float:
        norm = self.k1 * ((1 - self.b) + self.b * passage_len / self.pivot)
        return freq / (freq + norm)

    def norm(self, passage_start: int) -> float:
        return 1 + 1 / math.log(self.pivot + passage_start)


class Passage:
    __slots__ = ("start", "end", "score", "matches")

    def __init__(self) -> None:
        self.start = -1
        self.end = -1
        self.score = 0.0
        self.matches: list[tuple[int, int]] = []


def format_passages(passages: list[Passage], content: str,
                    pre: str = "<b>", post: str = "</b>",
                    ellipsis: str = "... ") -> str:
    """DefaultPassageFormatter.format (DefaultPassageFormatter.java:61)."""
    out = []
    pos = 0
    for p in passages:
        if p.start > pos and pos > 0:
            out.append(ellipsis)
        pos = p.start
        for start, end in sorted(p.matches):
            if start > pos:
                out.append(content[pos:start])
            if end > pos:
                out.append(pre)
                out.append(content[max(pos, start):end])
                out.append(post)
                pos = end
        out.append(content[pos:max(pos, p.end)])
        pos = p.end
    return "".join(out)


# --- offset tokenizers (analyzer-with-offsets stand-ins) ---------------

_SIMPLE_RE = re.compile(r"[^\W\d_]+")
_WS_RE = re.compile(r"\S+")


def simple_offsets(content: str):
    """MockTokenizer.SIMPLE + lowercase: maximal letter runs."""
    return [(m.group().lower(), m.start(), m.end())
            for m in _SIMPLE_RE.finditer(content)]


def whitespace_offsets(content: str):
    """MockTokenizer.WHITESPACE + lowercase."""
    return [(m.group().lower(), m.start(), m.end())
            for m in _WS_RE.finditer(content)]


def standard_offsets(content: str):
    """The real StandardAnalyzer chain with offsets."""
    from ..analysis.standard import analyze_with_offsets
    terms, _pos, starts, ends = analyze_with_offsets(content)
    return list(zip(terms, starts, ends))


def postings_highlight(content: str, terms, max_passages: int = 1,
                       max_length: int = 10000,
                       tokenizer=simple_offsets,
                       scorer: PassageScorer | None = None,
                       bi: SentenceBreakIterator | None = None,
                       pre: str = "<b>", post: str = "</b>",
                       ellipsis: str = "... ") -> str:
    """Highlight one stored document (PostingsHighlighter.highlightDoc,
    PostingsHighlighter.java:446-560): walk term matches in offset
    order, extend the current passage to the enclosing sentence, add
    per-(term, passage) contributions, keep the top max_passages by
    score, emit in document order."""
    scorer = scorer or PassageScorer()
    content = content[:max_length]
    n = len(content)
    if bi is None:
        bi = SentenceBreakIterator(content)
    else:
        bi.set_text(content)
    term_set = set(terms)
    matches = [(s, e, t) for (t, s, e) in tokenizer(content)
               if t in term_set]
    # totalTermFreq per term (weight is doc-level, :481)
    ttf: dict[str, int] = {}
    for _s, _e, t in matches:
        ttf[t] = ttf.get(t, 0) + 1
    weights = {t: scorer.weight(n, f) for t, f in ttf.items()}

    if not matches:
        # getEmptyHighlight: the first max_passages sentences
        passages = []
        bi.first()
        pos = 0
        while len(passages) < max_passages:
            nxt = bi.next()
            if nxt == DONE:
                break
            p = Passage()
            p.start, p.end = pos, nxt
            passages.append(p)
            pos = nxt
        return format_passages(passages, content, pre, post, ellipsis)

    kept: list[Passage] = []   # the passage "queue" (size <= n)

    def finalize(cur: Passage) -> None:
        cur.score *= scorer.norm(cur.start)
        kept.append(cur)
        # the reference keeps a min-heap ordered (score asc, start asc)
        # and evicts its minimum — on score ties the EARLIER passage
        # is evicted (:497-505)
        kept.sort(key=lambda p: (p.score, p.start), reverse=True)
        del kept[max_passages:]

    current: Passage | None = None
    i = 0
    matches.sort(key=lambda m: (m[0], m[1]))
    while i < len(matches):
        start, end, term = matches[i]
        if current is None or start >= current.end:
            if current is not None:
                finalize(current)
            current = Passage()
            current.start = max(bi.preceding(start + 1), 0)
            current.end = min(bi.next(), n)
            if current.end == DONE:
                current.end = n
        # consume this term's occurrences within the current passage
        # as one burst (the OffsetsEnum loop, :538-556)
        freq = 0
        j = i
        while j < len(matches):
            s2, e2, t2 = matches[j]
            if t2 != term:
                j += 1
                continue
            if s2 >= current.end:
                break
            freq += 1
            current.matches.append((s2, e2))
            matches.pop(j)
        current.score += weights[term] * scorer.tf(
            freq, current.end - current.start)
        # i stays 0-anchored: the burst popped matches[i] (and every
        # same-term match inside the passage); the while re-reads the
        # next unconsumed match
    if current is not None:
        finalize(current)
    kept.sort(key=lambda p: p.start)
    return format_passages(kept, content, pre, post, ellipsis)


def highlight_df(df, terms, text_col: str = "text",
                 out_col: str = "snippet", max_passages: int = 1,
                 tokenizer=standard_offsets):
    """Spark surface: add a PostingsHighlighter snippet column to a
    fetched top-k DataFrame (narrow Arrow map, no shuffle)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    tl = list(terms)

    @F.pandas_udf(StringType())
    def _snip(s):
        return s.map(lambda t: postings_highlight(
            t or "", tl, max_passages=max_passages, tokenizer=tokenizer))

    return df.withColumn(out_col, _snip(F.col(text_col)))
