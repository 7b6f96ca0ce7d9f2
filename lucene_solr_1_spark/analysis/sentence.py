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
    """All sentence boundaries of `text`, including 0 and len(text)."""
    n = len(text)
    if n == 0:
        return [0]
    cls = [sb_class(ord(c)) for c in text]

    def prev_base(i: int) -> int:
        """Index of the base char governing position i's left context
        (skip Extend/Format per SB5), or -1."""
        j = i
        while j >= 0 and cls[j] in _SKIP:
            j -= 1
        return j

    def breaks_at(i: int) -> bool:
        left, right = cls[i - 1], cls[i]
        # SB3
        if left == CR and right == LF:
            return False
        # SB4
        if left in _PARA:
            return True
        # SB5: Extend/Format attach to the left
        if right in _SKIP:
            return False
        # walk the left chain (with SB5 skipping): Sp*, Close*, SATerm?
        j = prev_base(i - 1)
        sp_seen = False
        while j >= 0 and cls[j] == SP:
            sp_seen = True
            j = prev_base(j - 1)
        # SB11's optional (Sep|CR|LF) never precedes here — SB4 above
        # broke right after it already.
        k = j
        while k >= 0 and cls[k] == CLOSE:
            k = prev_base(k - 1)
        if k < 0 or cls[k] not in _SATERM:
            return False  # SB12: no SATerm context -> no break
        sat = cls[k]
        # SB6: ATerm x Numeric (only when nothing between)
        if not sp_seen and j == k and sat == ATERM and right == NUMERIC:
            return False
        # SB7: (Upper|Lower) ATerm x Upper
        if not sp_seen and j == k and sat == ATERM and right == UPPER:
            p = prev_base(k - 1)
            if p >= 0 and cls[p] in (UPPER, LOWER):
                return False
        # SB8: ATerm Close* Sp* x (not-in-set)* Lower
        if sat == ATERM:
            m = i
            while m < n and cls[m] not in (OLETTER, UPPER, LOWER, SEP, CR,
                                           LF, STERM, ATERM):
                m += 1
            if m < n and cls[m] == LOWER:
                return False
        # SB8a: SATerm Close* Sp* x (SContinue|STerm|ATerm)
        if right in (SCONTINUE, STERM, ATERM):
            return False
        # SB9: SATerm Close* x (Close|Sp|Sep|CR|LF)
        if not sp_seen and right in (CLOSE, SP, SEP, CR, LF):
            return False
        # SB10: SATerm Close* Sp* x (Sp|Sep|CR|LF)
        if right in (SP, SEP, CR, LF):
            return False
        # SB11
        return True

    out = [0]
    for i in range(1, n):
        if breaks_at(i):
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
