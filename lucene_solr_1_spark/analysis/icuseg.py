"""ICUTokenizer twin: script-run segmentation + per-script break rules.

Mirrors the reference's lucene/analysis/icu segmentation stack
(lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
segmentation/*.java) re-expressed over the from-scratch RBBI engine
(analysis/rbbi.py):

  * ScriptIterator (ScriptIterator.java:96-133): splits text into
    ISO-15924 script runs; Common/Inherited merge into the surrounding
    run and non-spacing marks inherit their base character's script
    (UTR #24).
  * CompositeBreakIterator (CompositeBreakIterator.java:58-67): per
    run, delegates to the script's break iterator and re-bases the
    boundaries.
  * DefaultICUTokenizerConfig (DefaultICUTokenizerConfig.java:86-96):
    UAX#29 Default rules for most scripts; custom tailorings for
    Hebrew (punctuation), Khmer / Myanmar (syllables), Lao (syllables
    + the LaoBreakIterator pushback pass), and the Thai dictionary
    break iterator (analysis/thai.py, already reference-exact).
  * LaoBreakIterator (LaoBreakIterator.java:129-158, 199-212): greedy
    rule matches can strand an illegal trailing consonant; on a
    status-0 lookahead the last consonant is pushed back onto the next
    syllable iff both halves re-verify as legal syllables.  Combining
    marks are canonical-order-bubbled first (ccReorder).
  * ICUTokenizer.incrementTokenBuffer (ICUTokenizer.java:201-222):
    status-0 segments are skipped; token type from getType(script,
    ruleStatus).

Script values come from analysis/data/uscript_ranges.json.gz (current
public UCD via tools/gen_uscript.py) rather than ICU 49's Unicode 6.1
tables; codepoints whose Script property changed between the two UCD
versions may segment differently — none of the reference's own test
texts are affected.

Rule grammars are loaded from analysis/data/rbbi_rules.json.gz
(vendored rule DATA, tools/gen_rbbi_rules.py).
"""

from __future__ import annotations

import gzip
import json
import os
import unicodedata
from functools import lru_cache

import pandas as pd

from . import rbbi
from . import uniprops as up
from .thai import thai_breaks

DONE = rbbi.DONE

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     "rbbi_rules.json.gz")


@lru_cache(maxsize=1)
def rule_sources() -> dict:
    with gzip.open(_DATA, "rt", encoding="utf-8") as f:
        return json.load(f)


@lru_cache(maxsize=16)
def _compiled(name: str) -> rbbi.BreakRules:
    return rbbi.compile_rules(rule_sources()[name])


# ---------------------------------------------------------------------------
# ScriptIterator
# ---------------------------------------------------------------------------

def script_runs(cps: list[int]) -> list[tuple[int, int, int]]:
    """-> [(start, limit, script_id)] over code-point indices.

    ScriptIterator.java:96-133: within a run, Common/Inherited chars
    and non-spacing marks (gc=Mn) continue it; the run's script code
    upgrades from Common/Inherited to the first concrete script seen.
    """
    runs = []
    n = len(cps)
    index = 0
    limit_pos = 0
    while limit_pos < n:
        script = up.SCRIPT_COMMON
        start = limit_pos
        while index < n:
            cp = cps[index]
            sc = up.script_of(cp)
            same = (script <= up.SCRIPT_INHERITED
                    or sc <= up.SCRIPT_INHERITED or sc == script)
            if same or unicodedata.category(chr(cp)) == "Mn":
                index += 1
                if script <= up.SCRIPT_INHERITED and sc > up.SCRIPT_INHERITED:
                    script = sc
            else:
                break
        limit_pos = index
        runs.append((start, limit_pos, script))
    return runs


# ---------------------------------------------------------------------------
# break-iterator wrappers (BreakIteratorWrapper.java)
# ---------------------------------------------------------------------------

class _RBBIWrapper:
    """Rule-based iterator over one script run (RBBIWrapper)."""

    def __init__(self, rules: rbbi.BreakRules):
        self._it = rbbi.RuleBasedBreakIterator(rules)

    def set_text(self, cps: list[int]) -> None:
        self._it.set_text(cps)
        self._it.first()

    def current(self) -> int:
        return self._it.current()

    def next(self) -> int:
        return self._it.next()

    def get_rule_status(self) -> int:
        return self._it.get_rule_status()


class _ThaiWrapper:
    """Dictionary iterator + computed status (BIWrapper:118-165).

    The reference's calcStatus reads the codepoint at the SEGMENT
    START on every loop iteration (BreakIteratorWrapper.java:149 reads
    `charAt(..., begin)` while `i` advances), so in effect the first
    codepoint decides: digit -> WORD_NUMBER, letter -> WORD_LETTER,
    else WORD_NONE.  Twinned as-is.
    """

    def __init__(self) -> None:
        self._bounds: list[int] = [0]
        self._pos = 0
        self._cps: list[int] = []

    def set_text(self, cps: list[int]) -> None:
        self._cps = cps
        text = "".join(map(chr, cps))
        self._bounds = thai_breaks(text) if text else [0]
        self._pos = 0
        self._status = 0

    def current(self) -> int:
        return self._bounds[self._pos]

    def next(self) -> int:
        if self._pos + 1 >= len(self._bounds):
            self._status = 0
            return DONE
        begin = self._bounds[self._pos]
        self._pos += 1
        c = chr(self._cps[begin]) if begin < len(self._cps) else ""
        if c.isdigit():
            self._status = 100
        elif c.isalpha():
            self._status = 200
        else:
            self._status = 0
        return self._bounds[self._pos]

    def get_rule_status(self) -> int:
        return self._status


class _LaoWrapper:
    """LaoBreakIterator twin (LaoBreakIterator.java:129-158).

    Rules match greedily; when the segment FOLLOWING a match has
    status 0 and BEGINS with a Lao character (`working.current()`
    right after `rules.next()` reads the char AT the new boundary,
    LaoBreakIterator.java:137 — NOT the match's last char), try
    pushing the match's last character back onto that following
    syllable: re-verify that the shortened previous syllable and the
    grown current syllable each match a rule with nonzero status
    (verifyPushBack:199-212).  Combining classes are bubble-sorted
    into canonical order first (ccReorder:215-235).
    """

    _lao_set = None

    def __init__(self) -> None:
        self._rules = rbbi.RuleBasedBreakIterator(_compiled("Lao"))
        self._verify = rbbi.RuleBasedBreakIterator(_compiled("Lao"))
        if _LaoWrapper._lao_set is None:
            _LaoWrapper._lao_set = list(
                up.scripts().ranges_of(up.script_id("Lao")))
        self._cps: list[int] = []
        self._working_offset = 0

    def set_text(self, cps: list[int]) -> None:
        cps = list(cps)
        # ccReorder: canonical-order bubble over combining classes
        reordered = True
        while reordered:
            prev_cc = 0
            reordered = False
            for i in range(len(cps)):
                cc = unicodedata.combining(chr(cps[i]))
                if 0 < cc < prev_cc:
                    cps[i], cps[i - 1] = cps[i - 1], cps[i]
                    reordered = True
                else:
                    prev_cc = cc
        self._cps = cps
        self._working_offset = 0
        self._rules.set_text(cps)
        self._rules.first()

    def current(self) -> int:
        cur = self._rules.current()
        return DONE if cur == DONE else self._working_offset + cur

    def get_rule_status(self) -> int:
        return self._rules.get_rule_status()

    def _verify_push_back(self, current: int, nxt: int) -> bool:
        shortened = nxt - current - 1
        v = self._verify
        v.set_text(self._cps[current:current + shortened])
        v.first()
        if v.next() != shortened or v.get_rule_status() == 0:
            return False
        v.set_text(self._cps[nxt - 1:])
        v.first()
        return v.next() != DONE and v.get_rule_status() != 0

    def next(self) -> int:
        current = self.current()
        nxt = self._rules.next()
        if nxt == DONE:
            return DONE
        nxt += self._working_offset
        status = self._rules.get_rule_status()
        c = self._cps[nxt] if nxt < len(self._cps) else -1
        following = self._rules.next()  # lookahead
        if following != DONE:
            if (self._rules.get_rule_status() == 0
                    and up.contains(self._lao_set, c)
                    and self._verify_push_back(current, nxt)):
                self._working_offset = nxt - 1
                self._rules.set_text(self._cps[self._working_offset:])
                self._rules.first()
                # restore the status of the (shortened) match just
                # returned so get_rule_status() reflects it
                self._rules._history[-1] = (0, status)
                return nxt - 1
            self._rules.previous()  # undo the lookahead
        return nxt


# ---------------------------------------------------------------------------
# config + composite iterator
# ---------------------------------------------------------------------------

WORD_IDEO = "<IDEOGRAPHIC>"
WORD_HIRAGANA = "<HIRAGANA>"
WORD_KATAKANA = "<KATAKANA>"
WORD_HANGUL = "<HANGUL>"
WORD_LETTER = "<ALPHANUM>"
WORD_NUMBER = "<NUM>"


class ICUTokenizerConfig:
    """DefaultICUTokenizerConfig twin; `rulefiles` maps a script name
    (long or short, e.g. 'Latn' / 'Cyrillic') to tailored rule SOURCE
    text, the ICUTokenizerFactory `rulefiles` customization
    (ICUTokenizerFactory.java:49-62)."""

    def __init__(self, rulefiles: dict | None = None):
        self._tailored: dict[int, rbbi.BreakRules] = {}
        for name, source in (rulefiles or {}).items():
            self._tailored[up.script_id(name)] = rbbi.compile_rules(source)
        s = up.script_id
        self._thai = s("Thai")
        self._hebrew = s("Hebrew")
        self._khmer = s("Khmer")
        self._lao = s("Lao")
        self._myanmar = s("Myanmar")
        self._hiragana = s("Hiragana")
        self._hangul = s("Hangul")

    def get_break_iterator(self, script: int):
        if script in self._tailored:
            return _RBBIWrapper(self._tailored[script])
        if script == self._thai:
            return _ThaiWrapper()
        if script == self._hebrew:
            return _RBBIWrapper(_compiled("Hebrew"))
        if script == self._khmer:
            return _RBBIWrapper(_compiled("Khmer"))
        if script == self._lao:
            return _LaoWrapper()
        if script == self._myanmar:
            return _RBBIWrapper(_compiled("Myanmar"))
        return _RBBIWrapper(_compiled("Default"))

    def get_type(self, script: int, status: int) -> str:
        if status == 400:
            return WORD_IDEO
        if status == 300:
            return WORD_HIRAGANA if script == self._hiragana \
                else WORD_KATAKANA
        if status == 200:
            return WORD_HANGUL if script == self._hangul else WORD_LETTER
        if status == 100:
            return WORD_NUMBER
        return "<OTHER>"


_default_config: ICUTokenizerConfig | None = None


def default_config() -> ICUTokenizerConfig:
    global _default_config
    if _default_config is None:
        _default_config = ICUTokenizerConfig()
    return _default_config


def tokenize(text: str, config: ICUTokenizerConfig | None = None,
             utf16_offsets: bool = True):
    """-> [(term, start, end, type, script_short_name)].

    Offsets are UTF-16 code-unit offsets (Lucene's convention) when
    utf16_offsets, else code-point offsets.  Segments with rule
    status 0 are skipped (ICUTokenizer.java:208-211).
    """
    cfg = config or default_config()
    cps = [ord(c) for c in text]
    # cumulative UTF-16 offset of each code-point index
    if utf16_offsets:
        off = [0] * (len(cps) + 1)
        for i, cp in enumerate(cps):
            off[i + 1] = off[i] + (2 if cp > 0xFFFF else 1)
    else:
        off = list(range(len(cps) + 1))
    out = []
    for start_run, limit_run, script in script_runs(cps):
        bi = cfg.get_break_iterator(script)
        bi.set_text(cps[start_run:limit_run])
        sname = up.script_short_name(script)
        start = bi.current()
        while True:
            end = bi.next()
            if end == DONE:
                break
            status = bi.get_rule_status()
            if status != 0:
                a, b = start_run + start, start_run + end
                out.append(("".join(map(chr, cps[a:b])),
                            off[a], off[b],
                            cfg.get_type(script, status), sname))
            start = end
    return out


def icu_tokenize_terms(text: str,
                       config: ICUTokenizerConfig | None = None
                       ) -> list[str]:
    """Just the term strings (the common analyzer-chain input)."""
    return [t[0] for t in tokenize(text, config, utf16_offsets=False)]


def icu_tokenize_series(texts: pd.Series,
                        config: ICUTokenizerConfig | None = None
                        ) -> pd.Series:
    """Arrow-batch kernel: Series[str] -> Series[list[str]] for
    mapInPandas / pandas_udf integration (the per-doc loop is pure
    Python but each call handles a whole Arrow batch)."""
    cfg = config or default_config()
    return texts.map(lambda t: icu_tokenize_terms(t or "", cfg))


def icu_tokenize_df(df, text_col: str = "text",
                    out_col: str = "icu_tokens", with_types: bool = False):
    """Spark surface: Arrow-batched ICU segmentation of a string column
    (narrow map, no shuffle; compiled DFAs build once per executor via
    the lru_cache singletons, repeated batch values dedup through
    segcache).  with_types emits 'term\\ttype' pairs so the token type
    survives the array column."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from .segcache import segment_series
    cache: dict = {}

    def _one(t):
        ts = tokenize(t, utf16_offsets=False)
        if with_types:
            return [f"{term}\t{typ}" for term, _s, _e, typ, _sc in ts]
        return [term for term, _s, _e, _typ, _sc in ts]

    # NOTE: no type hints — PEP-563 string annotations break pyspark's
    # hint sniffing (same caveat as ja_tokenize_df)
    @F.pandas_udf(ArrayType(StringType()))
    def _seg(s):
        return segment_series(s, _one, cache)

    return df.withColumn(out_col, _seg(F.col(text_col)))
