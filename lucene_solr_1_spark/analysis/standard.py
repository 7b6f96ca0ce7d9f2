"""StandardAnalyzer-equivalent analysis chain, vectorized over pandas.

Pipeline parity target (ref: lucene/analysis/common/src/java/org/apache/
lucene/analysis/standard/StandardAnalyzer.java:110-122 createComponents):

    StandardTokenizer (UAX#29 word break, maxTokenLength=255)
      -> StandardFilter (no-op for 4.x)
      -> LowerCaseFilter
      -> StopFilter (33-word English list, StopAnalyzer.java:48-60)

The tokenizer implements the FULL jflex word-break grammar
(StandardTokenizerImpl.jflex:120-185), with character classes taken
verbatim from the reference's generated DFA — analysis/wbclasses.py is
probed code point by code point out of the compiled automaton
(tools/gen_wb_classes.py + tools/ref_tokenizer.py), so every class is
the exact Unicode-6.1 set the reference ships, independent of the
host UCD version:

  * WORD: alternating letter runs and digit runs (WB5/9/10), where
    MidLetter|MidNumLet joins two LETTER runs — "foo.bar",
    "lucene.apache.org", "foo:bar", "U.S.A", "O'Reilly" are ONE token
    (WB6/7) — and MidNum|MidNumLet joins two DIGIT runs — "3.14",
    "1,234", "216.239.63.104" (WB11/12). ExtendNumLet (underscore &
    friends) attaches at token edges and bridges letter/digit/katakana
    segments: "a_b", "カナ_abc", "_foo_" (WB13a/b),
  * katakana emits as runs, bridgeable by ExtendNumLet (WB13),
  * combining marks and format controls (the exact 6.1 Extend|Format
    classes) absorb into the preceding token char — WB4,
  * Thai/Lao/Myanmar/Khmer & other LB:Complex_Context scripts emit as
    unbroken <SOUTHEAST_ASIAN> runs (no mark absorption — the class
    contains its own vowel signs),
  * CJK ideographs and hiragana emit one char per token (each
    absorbing trailing Extend/Format), hangul syllables as runs,
  * tokens longer than 255 chars are dropped (StandardAnalyzer.java:58).

Token-level parity with the compiled reference automaton is pinned by
tests/test_wb_parity.py over cached oracle corpora (goldens generated
by driving the reference's generated scanner directly); the reference's
golden Unicode tests for 11 scripts + Japanese/Korean/combining-mark
cases pass identically in the Python and JVM twins
(tests/test_analysis.py, tests/test_analysis_unicode.py).

Everything here is pandas/NumPy-vectorized — no per-row Python in the
Spark hot path (BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "TOKEN_RE",
    "tokenize_series",
    "analyze_flat",
    "analyze_series",
    "analyze_text",
]

# The exact 33-word list from StopAnalyzer.ENGLISH_STOP_WORDS_SET
# (ref: lucene/core/src/java/org/apache/lucene/analysis/core/StopAnalyzer.java:48-60)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# Character classes probed verbatim out of the reference's generated
# DFA (Unicode 6.1) — see wbclasses.py provenance header.
from . import wbclasses as _wb  # noqa: E402

_L = _wb.cls(_wb.LETTER_RANGES)        # ALetter incl. Hangul (solo WORD)
_DG = _wb.cls(_wb.DIGIT_RANGES)        # Numeric + fullwidth digits
_SEA = _wb.cls(_wb.SEA_RANGES)         # LB:Complex_Context runs
_CJK = _wb.cls(_wb.CJK_RANGES)         # one <IDEOGRAPHIC> per char
_HIRAGANA = _wb.cls(_wb.HIRAGANA_RANGES)
_KATAKANA = _wb.cls(_wb.KATAKANA_RANGES)
_EXTC = _wb.cls(_wb.EXT_RANGES)        # WB4 Extend|Format absorption
_ENL = _wb.cls(_wb.ENL_RANGES)         # ExtendNumLet (edge/bridge)
_MIDL = _wb.cls(_wb.MIDL_RANGES)       # MidLetter|MidNumLet (. : ' ...)
_MIDN = _wb.cls(_wb.MIDN_RANGES)       # MidNum|MidNumLet (. , ; ' ...)
_HANGUL = _wb.cls(_wb.HANGUL_RANGES)   # subset of LETTER (typing only)

# jflex WORD rule (StandardTokenizerImpl.jflex:142-156), transliterated
# with X-Ex = X (Extend|Format)* spelled as the trailing [EXT]* on every
# class. Segments:
#   LSEG: letter runs joined by MidLetter|MidNumLet   (WB5/6/7)
#   DSEG: digit runs joined by MidNum|MidNumLet       (WB8/11/12)
#   AD:   adjacent letter/digit segments concatenate  (WB9/10)
#   KSEG: katakana runs, ENL-bridgeable internally    (WB13/13a/13b)
#   WORD: ENL-prefixed/bridged/suffixed segments      (WB13a/13b)
_M = rf"[{_EXTC}]*"
_LL = rf"[{_L}]{_M}"
_DD = rf"[{_DG}]{_M}"
_KK = rf"[{_KATAKANA}]{_M}"
_UU = rf"[{_ENL}]{_M}"
_LSEG = rf"(?:{_LL})+(?:[{_MIDL}]{_M}(?:{_LL})+)*"
_DSEG = rf"(?:{_DD})+(?:[{_MIDN}]{_M}(?:{_DD})+)*"
_AD = rf"(?:{_LSEG}|{_DSEG})+"
_KSEG = rf"{_KK}(?:(?:{_UU})*{_KK})*"
_WORD = (rf"(?:{_UU})*(?:{_KSEG}|{_AD})"
         rf"(?:(?:{_UU})+(?:{_KSEG}|{_AD}))*(?:{_UU})*")

TOKEN_RE = re.compile(
    rf"{_WORD}"
    rf"|[{_SEA}]+"
    rf"|[{_CJK}]{_M}"
    rf"|[{_HIRAGANA}]{_M}"
)

# pure-class token-type probes (jflex rule order: NUM and the typing
# rules are subsets of WORD that win ties by priority, so a fullmatch
# on the emitted token is exactly the jflex tie-break)
_NUM_RE = re.compile(
    rf"(?:{_UU})*(?:{_DSEG})(?:(?:{_UU})+(?:{_DSEG}))*(?:{_UU})*")
_HANGUL_RE = re.compile(rf"(?:[{_HANGUL}]{_M})+")
_KATA_RE = re.compile(rf"(?:{_KK})+")
_SEA_RE = re.compile(rf"[{_SEA}]+")
_CJK_RE = re.compile(rf"[{_CJK}]{_M}")
_HIRA_RE = re.compile(rf"[{_HIRAGANA}]{_M}")

# StandardTokenizer.TOKEN_TYPES indices (StandardTokenizer.java:59-86)
ALPHANUM, NUM = 0, 6
SOUTHEAST_ASIAN, IDEOGRAPHIC, HIRAGANA_T, KATAKANA_T, HANGUL_T = 9, 10, 11, 12, 13


def token_type(tok: str) -> int:
    """Token type under the jflex rule order (typing rules are subsets
    of WORD and win ties by priority: NUM, HANGUL, KATAKANA, WORD)."""
    if _NUM_RE.fullmatch(tok):
        return NUM
    if _HANGUL_RE.fullmatch(tok):
        return HANGUL_T
    if _KATA_RE.fullmatch(tok):
        return KATAKANA_T
    if _SEA_RE.fullmatch(tok):
        return SOUTHEAST_ASIAN
    if _CJK_RE.fullmatch(tok):
        return IDEOGRAPHIC
    if _HIRA_RE.fullmatch(tok):
        return HIRAGANA_T
    return ALPHANUM


_STOP_ARR = np.array(sorted(ENGLISH_STOP_WORDS))

# Java-regex twin of TOKEN_RE for the JVM fast path.
#
# PERFORMANCE: Java's Pattern compiles a many-range literal class into
# a chained union of predicates, making every character test
# O(#ranges) (r3 measured: a single build task went from seconds to
# >27 min on a 313-range class). The exact-6.1 classes are therefore
# rendered JVM-side as CATEGORY classes (O(1) Character.getType
# lookups) corrected by small residue classes that only get evaluated
# when the category test passes: [\p{L}&&[^sub]] tests the ranges only
# for actual letters, never for punctuation/whitespace. The letter and
# digit classes additionally lead with an ASCII fast path ([a-zA-Z...])
# so English text never reaches the residue scan. Python's re compiles
# explicit ranges into bitmaps (fast), so TOKEN_RE keeps the exact
# range spellings; both twins express the same Unicode-6.1 classes and
# are parity-tested against the compiled reference automaton
# (tests/test_wb_parity.py).
_J_EXT = _wb.java_cls(_wb.JAVA_EXT_BASE, _wb.JAVA_EXT_SUB_RANGES,
                      _wb.JAVA_EXT_ADD_RANGES)
_J_L = "[a-zA-Z" + _wb.java_cls(_wb.JAVA_LETTER_BASE,
                                _wb.JAVA_LETTER_SUB_RANGES,
                                _wb.JAVA_LETTER_ADD_RANGES) + "]"
_J_D = "[0-9" + _wb.java_cls(_wb.JAVA_DIGIT_BASE,
                             _wb.JAVA_DIGIT_SUB_RANGES,
                             _wb.JAVA_DIGIT_ADD_RANGES) + "]"

_JM = f"{_J_EXT}*"
_JLL = f"{_J_L}{_JM}"
_JDD = f"{_J_D}{_JM}"
_JKK = f"[{_KATAKANA}]{_JM}"
_JUU = f"[{_ENL}]{_JM}"
_JLSEG = f"(?:{_JLL})+(?:[{_MIDL}]{_JM}(?:{_JLL})+)*"
_JDSEG = f"(?:{_JDD})+(?:[{_MIDN}]{_JM}(?:{_JDD})+)*"
_JAD = f"(?:{_JLSEG}|{_JDSEG})+"
_JKSEG = f"{_JKK}(?:(?:{_JUU})*{_JKK})*"
_JWORD = (f"(?:{_JUU})*(?:{_JKSEG}|{_JAD})"
          f"(?:(?:{_JUU})+(?:{_JKSEG}|{_JAD}))*(?:{_JUU})*")

JAVA_TOKEN_PATTERN = (
    f"(?U){_JWORD}"
    f"|[{_SEA}]+"
    f"|[{_CJK}]{_JM}"
    f"|[{_HIRAGANA}]{_JM}"
)


# ---- ASCII fast path (r6, guide §1.2 "per-task work") ----------------
#
# The full JAVA_TOKEN_PATTERN is the dominant cost of the index build's
# tokenize stage (measured: 16.3 s of a 50 s sf0.1 build was the
# regexp_extract_all alone). For a pure-ASCII row the pattern's
# Katakana / SEA / CJK / Hiragana alternatives and every Extend/Format
# absorption are unreachable, so restricting each character class to
# its ASCII intersection — computed from the SAME probed range tables,
# never hand-written — yields a radically simpler regex with IDENTICAL
# match semantics on ASCII input: Java regex alternation order and
# greediness are unchanged, and a class member outside ASCII can never
# participate in a match of ASCII text (parity pinned in
# tests/test_wb_parity.py::test_ascii_fast_path_parity).
# analyze_expr dispatches per row on an O(n) ASCII scan.

def _ascii_cls(ranges) -> str:
    return _wb.cls([(a, min(b, 0x7F)) for a, b in ranges if a <= 0x7F])


_A_L = _ascii_cls(_wb.LETTER_RANGES)      # a-zA-Z
_A_D = _ascii_cls(_wb.DIGIT_RANGES)      # 0-9
_A_ENL = _ascii_cls(_wb.ENL_RANGES)      # _
_A_MIDL = _ascii_cls(_wb.MIDL_RANGES)    # ' :
_A_MIDN = _ascii_cls(_wb.MIDN_RANGES)    # , ; . '
_A_EXT = _ascii_cls(_wb.EXT_RANGES)      # empty: no ASCII Extend/Format
assert _A_EXT == "", "ASCII Extend/Format appeared; regenerate fast path"
_AM = ""                                  # [EXT]* collapses to nothing
_A_LSEG = f"[{_A_L}]+(?:[{_A_MIDL}][{_A_L}]+)*"
_A_DSEG = f"[{_A_D}]+(?:[{_A_MIDN}][{_A_D}]+)*"
_A_AD = f"(?:{_A_LSEG}|{_A_DSEG})+"
_A_UU = f"[{_A_ENL}]"
ASCII_TOKEN_PATTERN = (
    f"(?:{_A_UU})*(?:{_A_AD})(?:(?:{_A_UU})+(?:{_A_AD}))*(?:{_A_UU})*"
)
_ASCII_ONLY_PATTERN = "^[\\x00-\\x7F]*$"


def analyze_expr(text_col, stop_filter: bool = True):
    """JVM-side StandardAnalyzer chain as a Column expression:
    regexp_extract_all (tokenize) -> lower -> length cap -> stop filter.
    Whole-stage-codegen'd — zero Python in the indexing hot path; the
    pandas implementation below stays as the spec/oracle twin.

    stop_filter=False keeps stopwords (the positional build filters them
    later so position increments are preserved, StopFilter contract)."""
    from pyspark.sql import functions as F
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    # per-row dispatch: the ASCII-restricted pattern is ~5x cheaper and
    # byte-identical on ASCII rows (see ASCII_TOKEN_PATTERN above);
    # when/otherwise evaluates only the taken branch per row
    toks = F.when(c.rlike(_ASCII_ONLY_PATTERN),
                  F.regexp_extract_all(c, F.lit(ASCII_TOKEN_PATTERN), 0)) \
            .otherwise(F.regexp_extract_all(c, F.lit(JAVA_TOKEN_PATTERN), 0))
    toks = F.transform(toks, F.lower)
    if stop_filter:
        toks = F.filter(toks, lambda t: (F.length(t) <= MAX_TOKEN_LENGTH)
                        & ~t.isin(*sorted(ENGLISH_STOP_WORDS)))
    else:
        toks = F.filter(toks, lambda t: F.length(t) <= MAX_TOKEN_LENGTH)
    return F.coalesce(toks, F.array())


def tokenize_series(texts: pd.Series) -> pd.Series:
    """UAX#29-subset word break, vectorized: Series[str] -> Series[list[str]].

    Nulls tokenize to []. Length cap applied here (tokenizer-level, as in
    the jflex scanner's maxTokenLength handling).
    """
    toks = texts.fillna("").str.findall(TOKEN_RE)
    # drop over-length tokens (rare; list-comp only touches offending rows)
    return toks.map(
        lambda ts: ts
        if all(len(t) <= MAX_TOKEN_LENGTH for t in ts)
        else [t for t in ts if len(t) <= MAX_TOKEN_LENGTH]
    )


def analyze_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Full StandardAnalyzer chain, flat output: (row_ids, tokens).

    row_ids[i] is the 0-based position in `texts` of tokens[i]; tokens are
    lowercased, length-capped, stop-filtered, in document order.

    Zipf-aware vectorization: tokens are factorized first so lowercase /
    length-cap / stopword checks run once per *distinct* raw token, not
    once per occurrence.
    """
    raw_lists = texts.fillna("").str.findall(TOKEN_RE)
    counts = raw_lists.str.len().to_numpy()
    n_rows = len(texts)
    if counts.sum() == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    flat = np.concatenate([np.asarray(ts, dtype=object) for ts in raw_lists])
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    codes, uniques = pd.factorize(flat)
    uni = pd.Series(uniques, dtype=object)
    lowered = uni.str.lower().to_numpy()
    ok = (uni.str.len().to_numpy() <= MAX_TOKEN_LENGTH) & ~np.isin(lowered, _STOP_ARR)
    keep = ok[codes]
    return row_ids[keep], lowered[codes[keep]]


def analyze_flat_with_positions(texts) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray, np.ndarray]:
    """``analyze_flat`` plus Lucene positions, for kernels that need
    phrase adjacency (the percolator): returns (row_ids, tokens,
    positions, dl) where positions include stop-filter holes
    (over-length tokens take no slot, exactly like
    ``analyze_with_positions``) and dl is the kept-token count per row.
    """
    texts = pd.Series(texts, dtype=object)
    n = len(texts)
    raw_lists = texts.fillna("").str.findall(TOKEN_RE)
    counts = raw_lists.str.len().to_numpy()
    empty = (np.empty(0, np.int64), np.empty(0, object),
             np.empty(0, np.int64), np.zeros(n, np.int64))
    if counts.sum() == 0:
        return empty
    flat = np.concatenate([np.asarray(ts, dtype=object) for ts in raw_lists])
    row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    codes, uniques = pd.factorize(flat)
    uni = pd.Series(uniques, dtype=object)
    lowered = uni.str.lower().to_numpy()
    lengths_ok = uni.str.len().to_numpy() <= MAX_TOKEN_LENGTH
    is_stop = np.isin(lowered, _STOP_ARR)
    # tokenizer-level drop first (no position slot), then positions,
    # then the stop filter (which keeps increments)
    keep1 = lengths_ok[codes]
    row1, code1 = row_ids[keep1], codes[keep1]
    if not len(row1):
        return empty
    idx = np.arange(len(row1), dtype=np.int64)
    new_row = np.r_[True, row1[1:] != row1[:-1]]
    row_start = np.maximum.accumulate(np.where(new_row, idx, 0))
    rawpos = idx - row_start
    keep2 = ~is_stop[code1]
    row2, rawpos2 = row1[keep2], rawpos[keep2]
    toks2 = lowered[code1[keep2]]
    dl = np.bincount(row2, minlength=n)
    return row2, toks2, rawpos2, dl


def analyze_series(texts: pd.Series) -> pd.Series:
    """Full StandardAnalyzer chain: tokenize -> lowercase -> stop filter.

    Returns Series[list[str]] aligned with the input index.
    """
    n = len(texts)
    row_ids, toks = analyze_flat(texts)
    out: list[list[str]] = [[] for _ in range(n)]
    bounds = np.searchsorted(row_ids, np.arange(n + 1))
    for i in range(n):
        out[i] = toks[bounds[i]: bounds[i + 1]].tolist()
    return pd.Series(out, index=texts.index)


def analyze_text(text: str) -> list[str]:
    """Single-string convenience wrapper (query analysis, tests)."""
    return analyze_series(pd.Series([text])).iloc[0]


def analyze_with_positions(text: str) -> tuple[list[str], list[int]]:
    """(tokens, positions): positions index the capped token stream
    INCLUDING stopwords (StopFilter keeps position increments,
    ref: core/StopFilter.java), stopwords then removed."""
    raw = [t for t in TOKEN_RE.findall(text or "") if len(t) <= MAX_TOKEN_LENGTH]
    toks, poss = [], []
    for i, t in enumerate(raw):
        lt = t.lower()
        if lt not in ENGLISH_STOP_WORDS:
            toks.append(lt)
            poss.append(i)
    return toks, poss


def analyze_with_offsets(text: str) -> tuple[list, list, list, list]:
    """(tokens, positions, start_offsets, end_offsets): the token
    stream with char offsets (OffsetAttribute, ref: analysis/
    tokenattributes/OffsetAttribute.java) — same pipeline as
    analyze_with_positions (cap-drop, stop-position increments), plus
    each kept token's [start, end) char span in the original text."""
    toks, poss, starts, ends = [], [], [], []
    i = 0
    for m in TOKEN_RE.finditer(text or ""):
        t = m.group(0)
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        lt = t.lower()
        if lt not in ENGLISH_STOP_WORDS:
            toks.append(lt)
            poss.append(i)
            starts.append(m.start())
            ends.append(m.end())
        i += 1
    return toks, poss, starts, ends
