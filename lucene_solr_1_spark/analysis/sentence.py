"""UAX#29 sentence-break iterator.

Twin of the ``BreakIterator.getSentenceInstance(Locale.ROOT)`` the
reference's PostingsHighlighter segments passages with
(lucene/highlighter/src/java/org/apache/lucene/search/
postingshighlight/PostingsHighlighter.java:342 getBreakIterator).
Implemented directly from the published UAX#29 sentence-boundary
rules (SB1–SB12, Unicode 6.x wording):

  SB3   CR × LF
  SB4   (Sep | CR | LF) ÷
  SB5   X (Extend | Format)* -> X   (attachment, X not sot/Sep/CR/LF)
  SB6   ATerm × Numeric
  SB7   (Upper | Lower) ATerm × Upper
  SB8   ATerm Close* Sp* × (¬(OLetter|Upper|Lower|Sep|CR|LF|STerm|
        ATerm))* Lower
  SB8a  SATerm Close* Sp* × (SContinue | STerm | ATerm)
  SB9   SATerm Close* × (Close | Sp | Sep | CR | LF)
  SB10  SATerm Close* Sp* × (Sp | Sep | CR | LF)
  SB11  SATerm Close* Sp* (Sep | CR | LF)? ÷
  SB12  × Any

Class data comes from analysis/data/sb_ranges.json.gz (public UCD via
the `regex` package, tools/gen_sb_classes.py).  Offsets are Python
string (code point) indices; the highlighter's test texts are BMP so
these equal UTF-16 offsets.
"""

from __future__ import annotations

import bisect
import gzip
import json
import os
from functools import lru_cache

DONE = -1

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     "sb_ranges.json.gz")

(OTHER, CR, LF, EXTEND, SEP, FORMAT, SP, LOWER, UPPER, OLETTER, NUMERIC,
 ATERM, SCONTINUE, STERM, CLOSE) = range(15)

_NAMES = ["Other", "CR", "LF", "Extend", "Sep", "Format", "Sp", "Lower",
          "Upper", "OLetter", "Numeric", "ATerm", "SContinue", "STerm",
          "Close"]


@lru_cache(maxsize=1)
def _tables():
    with gzip.open(_DATA, "rt", encoding="ascii") as f:
        d = json.load(f)
    lows: list[int] = []
    highs: list[int] = []
    ids: list[int] = []
    pairs = []
    for name, ranges in d.items():
        cid = _NAMES.index(name)
        for lo, hi in ranges:
            pairs.append((lo, hi, cid))
    for lo, hi, cid in sorted(pairs):
        lows.append(lo)
        highs.append(hi)
        ids.append(cid)
    return lows, highs, ids


def sb_class(cp: int) -> int:
    lows, highs, ids = _tables()
    i = bisect.bisect_right(lows, cp) - 1
    if i >= 0 and cp <= highs[i]:
        return ids[i]
    return OTHER


_PARA = (SEP, CR, LF)
_SATERM = (STERM, ATERM)
_SKIP = (EXTEND, FORMAT)


def sentence_breaks(text: str) -> list[int]:
    """All sentence boundaries of `text`, including 0 and len(text).

    Linear time: the left ``SATerm Close* Sp*`` chain and the SB8
    forward lookahead are precomputed in single passes instead of
    being rescanned per position (an 8k-space run used to cost O(n²)).
    """
    n = len(text)
    if n == 0:
        return [0]
    cls = [sb_class(ord(c)) for c in text]

    # pb[i]: index of the base char at-or-left-of i (skip Extend/Format
    # per SB5), or -1
    pb = [0] * n
    prev = -1
    for i, c in enumerate(cls):
        if c not in _SKIP:
            prev = i
        pb[i] = prev

    # left-chain state after char i: (sat_index or -1, sp_seen) for the
    # grammar <- SATerm Close* Sp* read rightwards; Extend/Format
    # inherit, anything else clears
    SAT_NONE = (-1, False)
    chain = [SAT_NONE] * n
    state = SAT_NONE
    phase = ""  # "close" | "sp" while state is live
    for i, c in enumerate(cls):
        if c in _SKIP:
            pass
        elif c in _SATERM:
            state = (i, False)
            phase = "close"
        elif state[0] >= 0 and c == CLOSE and phase == "close":
            pass
        elif state[0] >= 0 and c == SP:
            state = (state[0], True)
            phase = "sp"
        else:
            state = SAT_NONE
            phase = ""
        chain[i] = state

    # SB8 lookahead: class of the first char at-or-right-of i whose
    # class is in the "relevant" set, or -1
    _RELEVANT = (OLETTER, UPPER, LOWER, SEP, CR, LF, STERM, ATERM)
    nxt = [-1] * (n + 1)
    for i in range(n - 1, -1, -1):
        nxt[i] = cls[i] if cls[i] in _RELEVANT else nxt[i + 1]

    out = [0]
    for i in range(1, n):
        left, right = cls[i - 1], cls[i]
        # SB3
        if left == CR and right == LF:
            continue
        # SB4
        if left in _PARA:
            out.append(i)
            continue
        # SB5: Extend/Format attach to the left
        if right in _SKIP:
            continue
        k, sp_seen = chain[i - 1]
        if k < 0:
            continue  # SB12: no SATerm context -> no break
        sat = cls[k]
        direct = pb[i - 1] == k  # no Close/Sp between SATerm and i
        # SB6: ATerm x Numeric (only when nothing between)
        if direct and sat == ATERM and right == NUMERIC:
            continue
        # SB7: (Upper|Lower) ATerm x Upper
        if direct and sat == ATERM and right == UPPER:
            p = pb[k - 1] if k > 0 else -1
            if p >= 0 and cls[p] in (UPPER, LOWER):
                continue
        # SB8: ATerm Close* Sp* x (not-in-set)* Lower
        if sat == ATERM and nxt[i] == LOWER:
            continue
        # SB8a: SATerm Close* Sp* x (SContinue|STerm|ATerm)
        if right in (SCONTINUE, STERM, ATERM):
            continue
        # SB9: SATerm Close* x (Close|Sp|Sep|CR|LF)
        if not sp_seen and right in (CLOSE, SP, SEP, CR, LF):
            continue
        # SB10: SATerm Close* Sp* x (Sp|Sep|CR|LF)
        if right in (SP, SEP, CR, LF):
            continue
        # SB11
        out.append(i)
    out.append(n)
    return out


class SentenceBreakIterator:
    """java.text.BreakIterator surface over precomputed boundaries:
    exactly the calls PostingsHighlighter makes (current/next/
    preceding), plus first()."""

    def __init__(self, text: str = ""):
        self.set_text(text)

    def set_text(self, text: str) -> None:
        self._bounds = sentence_breaks(text)
        self._pos = 0

    def first(self) -> int:
        self._pos = 0
        return 0

    def current(self) -> int:
        return self._bounds[self._pos]

    def next(self) -> int:
        if self._pos + 1 >= len(self._bounds):
            return DONE
        self._pos += 1
        return self._bounds[self._pos]

    def preceding(self, offset: int) -> int:
        """Last boundary strictly before `offset` (java.text
        semantics); DONE when offset <= first boundary."""
        i = bisect.bisect_left(self._bounds, offset) - 1
        if i < 0:
            self._pos = 0
            return DONE
        self._pos = i
        return self._bounds[i]


class WholeBreakIterator(SentenceBreakIterator):
    """postingshighlight/WholeBreakIterator.java: one passage spanning
    the entire content (the highlightAllText configuration)."""

    def set_text(self, text: str) -> None:
        self._bounds = [0, len(text)] if text else [0]
        self._pos = 0
