"""Compound word token filters (German/Scandinavian decompounding).

Python twins of the reference's compound module:

* DictionaryCompoundWordTokenFilter (ref: analysis/common/.../compound/
  DictionaryCompoundWordTokenFilter.java:40): brute-force dictionary
  scan — every dictionary subword of length [min_subword, max_subword]
  found anywhere in the token is emitted (or only the longest per
  start offset), stacked at the token's position after the original.
* HyphenationCompoundWordTokenFilter (ref: HyphenationCompoundWord
  TokenFilter.java:56): Liang's TeX hyphenation algorithm (the FOP
  port in compound/hyphenation/HyphenationTree.java:315) proposes
  split points; parts between hyphenation points are kept if they are
  in the dictionary (with the reference's genitive-s retry at
  length-1), or all of them when no dictionary is given.

The hyphenation pattern reader understands FOP's XML format
(<classes> normalization groups, <exceptions>, <patterns> with
interletter digits) — e.g. the Danish da_UTF8.xml the reference's own
tests use.
"""
from __future__ import annotations

import re

__all__ = ["HyphenationTree", "parse_hyphenation_xml",
           "dictionary_compound_tokens", "hyphenation_compound_tokens"]

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


class HyphenationTree:
    """Liang patterns: word gaps get the max digit of every matching
    pattern; odd values are hyphenation points
    (HyphenationTree.java:315, searchPatterns:233)."""

    def __init__(self, patterns: list[str], exceptions: list[str],
                 classes: list[str]):
        self.classmap: dict[str, str] = {}
        for group in classes:
            for ch in group:
                self.classmap[ch] = group[0]
        # pattern letters -> interletter values (len(letters)+1 ints)
        self.patterns: dict[str, tuple[int, ...]] = {}
        for pat in patterns:
            letters, values = self._parse_pattern(pat)
            self.patterns[letters] = values
        self._maxpat = max((len(k) for k in self.patterns), default=0)
        self.stoplist: dict[str, list[int]] = {}
        for exc in exceptions:
            parts = exc.split("-")
            points, j = [], 0
            for p in parts[:-1]:
                j += len(p)
                points.append(j)
            self.stoplist[exc.replace("-", "")] = points

    @staticmethod
    def _parse_pattern(pat: str) -> tuple[str, tuple[int, ...]]:
        letters, values = [], [0]
        for ch in pat:
            if ch.isdigit():
                values[-1] = int(ch)
            else:
                letters.append(ch)
                values.append(0)
        return "".join(letters), tuple(values)

    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """Split offsets [0, p1, ..., len] or None (no points / word
        contains a non-class letter after letters began)."""
        norm = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classmap.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        sw = "".join(norm)
        points = []
        if sw in self.stoplist:
            points = [j + ignore_at_beginning for j in self.stoplist[sw]
                      if remain <= j < n - push]
        else:
            dotted = "." + sw + "."
            il = [0] * (len(dotted) + 1)
            for i in range(len(dotted)):
                upper = min(self._maxpat, len(dotted) - i)
                for ln in range(1, upper + 1):
                    vals = self.patterns.get(dotted[i:i + ln])
                    if vals:
                        for k, v in enumerate(vals):
                            if v > il[i + k]:
                                il[i + k] = v
            # gap before normalized letter i is il[i+1]
            points = [i + ignore_at_beginning for i in range(n)
                      if (il[i + 1] & 1) and remain <= i <= n - push]
        if not points:
            return None
        return [0] + points + [n]


_CLASSES_RE = re.compile(r"<classes>(.*?)</classes>", re.S)
_PATTERNS_RE = re.compile(r"<patterns>(.*?)</patterns>", re.S)
_EXCEPTIONS_RE = re.compile(r"<exceptions>(.*?)</exceptions>", re.S)


def parse_hyphenation_xml(text: str) -> HyphenationTree:
    """FOP hyphenation XML (PatternParser.java:1): whitespace-separated
    entries inside <classes>/<patterns>/<exceptions>."""
    text = re.sub(r"<!--.*?-->", "", text, flags=re.S)

    def section(rx):
        m = rx.search(text)
        return m.group(1).split() if m else []

    return HyphenationTree(section(_PATTERNS_RE),
                           section(_EXCEPTIONS_RE),
                           section(_CLASSES_RE))


def dictionary_compound_tokens(
        tokens: list[str], dictionary: set[str],
        min_word_size: int = DEFAULT_MIN_WORD_SIZE,
        min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
        max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
        only_longest_match: bool = False) -> list[str]:
    """Original token first, then its dictionary subwords (stacked at
    posInc 0 in the reference)."""
    dic = {d.lower() for d in dictionary}
    out = []
    for t in tokens:
        out.append(t)
        if len(t) < min_word_size:
            continue
        low = t.lower()
        for i in range(0, len(t) - min_subword_size + 1):
            longest = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > len(t):
                    break
                if low[i:i + j] in dic:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = t[i:i + j]
                    else:
                        out.append(t[i:i + j])
            if only_longest_match and longest is not None:
                out.append(longest)
    return out


def hyphenation_compound_tokens(
        tokens: list[str], tree: HyphenationTree,
        dictionary: set[str] | None = None,
        min_word_size: int = DEFAULT_MIN_WORD_SIZE,
        min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
        max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
        only_longest_match: bool = False) -> list[str]:
    """Parts between hyphenation points, dictionary-gated when a
    dictionary is given (with the length-1 genitive-s retry)."""
    dic = {d.lower() for d in dictionary} if dictionary is not None \
        else None
    out = []
    for t in tokens:
        out.append(t)
        if len(t) < min_word_size:
            continue
        hyp = tree.hyphenate(t, 1, 1)
        if hyp is None:
            continue
        low = t.lower()
        for i in range(len(hyp)):
            start = hyp[i]
            longest = None
            for j in range(1, len(hyp) - i):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                cand = None
                if dic is None or low[start:start + part_len] in dic:
                    cand = t[start:start + part_len]
                elif low[start:start + part_len - 1] in dic:
                    cand = t[start:start + part_len - 1]
                if cand is not None:
                    if only_longest_match:
                        if longest is None or len(longest) < len(cand):
                            longest = cand
                    else:
                        out.append(cand)
            if only_longest_match and longest is not None:
                out.append(longest)
    return out
