"""Hunspell dictionary stemmer.

Python twin of the reference's hunspell module (ref: lucene/analysis/
common/src/java/org/apache/lucene/analysis/hunspell/
HunspellStemmer.java:33, HunspellDictionary.java:54,
HunspellStemFilter.java:41 — Lucene 4.4's self-contained reader for
.aff/.dic files, which conforms to the original hunspell algorithm
with recursive affix stripping).

Semantics preserved exactly:

* .aff parsing: PFX/SFX headers (cross-product flag + rule count),
  rules with strip ('0' -> empty), append with optional continuation
  flags after '/', condition anchored as a FULL match of ``.*cond``
  (suffix) / ``cond.*`` (prefix); AF flag aliases; FLAG modes
  ``UTF-8``/plain (one char per flag), ``num`` (comma-separated ints,
  non-digits scrubbed), ``long`` (the 4.4 quirk: the two chars' code
  points are ADDED, not concatenated).
* .dic parsing: first line is the entry count; flags after the last
  '/', tab starts a morph comment; later duplicate entries REPLACE
  earlier ones (the reference's words.put).
* stemming: the word itself if in the dictionary, plus every
  suffix/prefix strip whose condition passes and whose flag is on the
  dictionary entry; cross-product affixes recurse (cap 2) with the
  continuation-flag cross-check.
* filter: token replaced by its first stem, remaining stems stacked at
  the same position; unknown words pass through unchanged; `dedup`
  keeps first occurrence of each unique stem.

Validated against the reference's own HunspellStemmerTest /
HunspellStemFilterTest vectors over its test.aff/test.dic.
"""
from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "HunspellStemmer", "hunspell_tokens"]


class _Affix:
    __slots__ = ("flag", "strip", "append", "append_flags",
                 "condition", "cross_product")

    def __init__(self, flag, strip, append, append_flags, condition,
                 cross_product):
        self.flag = flag
        self.strip = strip
        self.append = append
        self.append_flags = append_flags      # frozenset | None
        self.condition = condition            # compiled, fullmatch
        self.cross_product = cross_product


class HunspellDictionary:
    """Parses .aff + .dic text (already decoded str)."""

    def __init__(self, aff_text: str, dic_text: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self._flag_mode = "simple"
        self._aliases: list[str] = []
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self.words: dict[str, frozenset | None] = {}
        self._parse_aff(aff_text)
        self._parse_dic(dic_text)

    # -- flags ---------------------------------------------------------
    def _parse_flags(self, raw: str) -> tuple[str, ...]:
        if self._flag_mode == "num":
            return tuple(chr(int(re.sub(r"[^0-9]", "", p)))
                         for p in raw.strip().split(","))
        if self._flag_mode == "long":
            # DoubleASCIIFlagParsingStrategy: SUM of the two code points
            return tuple(chr(ord(raw[i]) + ord(raw[i + 1]))
                         for i in range(0, len(raw) - 1, 2))
        return tuple(raw)

    def _alias(self, part: str) -> str:
        return self._aliases[int(part) - 1] if self._aliases else part

    # -- .aff ----------------------------------------------------------
    def _parse_aff(self, text: str):
        lines = iter(text.splitlines())
        for line in lines:
            if line.startswith("AF"):
                args = line.split()
                if len(args) > 1 and args[1].isdigit() and \
                        not self._aliases:
                    continue    # count line
                if len(args) > 1:
                    self._aliases.append(args[1])
            elif line.startswith("PFX"):
                self._parse_affix(line, lines, self.prefixes,
                                  prefix=True)
            elif line.startswith("SFX"):
                self._parse_affix(line, lines, self.suffixes,
                                  prefix=False)
            elif line.startswith("FLAG"):
                mode = line[5:].strip()
                self._flag_mode = {"num": "num", "long": "long"}.get(
                    mode, "simple")

    def _parse_affix(self, header, lines, table, prefix):
        args = header.split()
        cross = args[2] == "Y"
        for _ in range(int(args[3])):
            rule = next(lines).split()
            if len(rule) < 5:
                continue
            flag = self._parse_flags(rule[1])[0]
            strip = "" if rule[2] == "0" else rule[2]
            affix_arg = rule[3]
            append_flags = None
            sep = affix_arg.rfind("/")
            if sep != -1:
                append_flags = frozenset(
                    self._parse_flags(self._alias(affix_arg[sep + 1:])))
                affix_arg = affix_arg[:sep]
            cond = rule[4]
            pat = re.compile((cond + ".*") if prefix else (".*" + cond))
            table.setdefault(self._key(affix_arg), []).append(
                _Affix(flag, strip, affix_arg, append_flags, pat, cross))

    # -- .dic ----------------------------------------------------------
    def _parse_dic(self, text: str):
        lines = text.splitlines()
        for line in lines[1:]:                 # first line = count
            if not line:
                continue
            sep = line.rfind("/")
            if sep == -1:
                entry, flags = line, None
            else:
                end = line.find("\t", sep)
                if end == -1:
                    end = len(line)
                flags = frozenset(self._parse_flags(
                    self._alias(line[sep + 1:end])))
                entry = line[:sep]
            if self.ignore_case:
                entry = entry.lower()
            self.words[entry] = flags          # later entries replace

    def lookup_word(self, w: str):
        """(found, flags) — flags None means a no-flags entry.  The
        reference's CharArrayMap compares case-insensitively when
        ignoreCase (entries are already lowercased at parse time)."""
        if self.ignore_case:
            w = w.lower()
        if w in self.words:
            return True, self.words[w]
        return False, None

    def _key(self, s: str) -> str:
        return s.lower() if self.ignore_case else s


class HunspellStemmer:
    """Recursive affix stripping (HunspellStemmer.java:118)."""

    def __init__(self, dictionary: HunspellDictionary,
                 recursion_cap: int = 2):
        self.d = dictionary
        self.cap = recursion_cap

    def stem(self, word: str) -> list[str]:
        stems = []
        if self.d.lookup_word(word)[0]:
            stems.append(word)
        stems.extend(self._stem(word, None, 0))
        return stems

    def unique_stems(self, word: str) -> list[str]:
        out, seen = [], set()
        for s in self.stem(word):
            k = s.lower() if self.d.ignore_case else s
            if k not in seen:
                seen.add(k)
                out.append(s)
        return out

    def _stem(self, word: str, flags, depth: int) -> list[str]:
        stems = []
        n = len(word)
        for i in range(n):                       # suffixes, longest first
            for suffix in self.d.suffixes.get(self.d._key(word[i:]), ()):
                if flags is None or suffix.flag in flags:
                    stripped = word[:n - len(suffix.append)] + suffix.strip
                    stems.extend(self._apply(stripped, suffix, depth))
        for i in range(n - 1, -1, -1):           # prefixes
            for prefix in self.d.prefixes.get(self.d._key(word[:i]), ()):
                if flags is None or prefix.flag in flags:
                    stripped = prefix.strip + word[len(prefix.append):]
                    stems.extend(self._apply(stripped, prefix, depth))
        return stems

    def _apply(self, stripped: str, affix: _Affix, depth: int):
        if self.d.ignore_case:
            stripped = stripped.lower()
        if not affix.condition.fullmatch(stripped):
            return []
        stems = []
        found, wflags = self.d.lookup_word(stripped)
        if found and wflags is not None and affix.flag in wflags:
            stems.append(stripped)
        if affix.cross_product and depth < self.cap:
            # appendFlags None (no '/<flags>' on the rule) cross-checks
            # as "allow all" — hasCrossCheckedFlag(flag, null) == true
            stems.extend(self._stem(stripped, affix.append_flags,
                                    depth + 1))
        return stems


def hunspell_tokens(tokens: list[str], dictionary: HunspellDictionary,
                    dedup: bool = True,
                    recursion_cap: int = 2) -> list[str]:
    """HunspellStemFilter contract: first stem replaces the token, the
    rest stack at posInc 0; unknown words pass through."""
    stemmer = HunspellStemmer(dictionary, recursion_cap)
    out = []
    for t in tokens:
        stems = (stemmer.unique_stems(t) if dedup else stemmer.stem(t))
        out.extend(stems if stems else [t])
    return out
