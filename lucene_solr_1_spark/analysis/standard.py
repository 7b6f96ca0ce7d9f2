"""StandardAnalyzer-equivalent analysis chain, vectorized over pandas.

Pipeline parity target (ref: lucene/analysis/common/src/java/org/apache/
lucene/analysis/standard/StandardAnalyzer.java:110-122 createComponents):

    StandardTokenizer (UAX#29 word break, maxTokenLength=255)
      -> StandardFilter (no-op for 4.x)
      -> LowerCaseFilter
      -> StopFilter (33-word English list, StopAnalyzer.java:48-60)

The tokenizer implements the UAX#29 subset we pin, covering the full
letter/digit repertoire plus WB4 mark absorption:

  * a word is a run of letters/digits/underscore (``\\w`` — ALL Unicode
    scripts: Latin, Greek, Cyrillic, Armenian, Arabic, Aramaic/Syriac,
    Amharic/Ethiopic, Bengali, Farsi, Thai, Lao, Tibetan, ...),
  * combining marks (Mn/Mc/Me) and format controls (Cf minus ZWSP)
    attach to the preceding word character and stay in the token —
    UAX#29 WB4 "ignore Extend and Format" (analysis/ubreak.py holds the
    UCD-generated class),
  * an apostrophe (' or U+2019) joins two letter runs (MidLetter),
  * '.' or ',' joins two digit runs (MidNum/MidNumLet),
  * CJK ideographs AND hiragana are emitted one char per token, each
    absorbing trailing Extend/Format (jflex ``HanEx``/``HiraganaEx``,
    StandardTokenizerImpl.jflex:77-78; <IDEOGRAPHIC>/<HIRAGANA>
    single-char tokens),
  * katakana is emitted as RUNS — ``{KatakanaEx}+`` → one <KATAKANA>
    token (StandardTokenizerImpl.jflex:139-140; TestStandardAnalyzer
    testJapanese: "カタカナ" is ONE token). The class is WB:Katakana
    from Unicode 6.1 (incl. halfwidth forms FF66-FF9F, phonetic
    extensions, vertical repeat marks, voiced sound marks),
  * hangul syllables are \\w, so they tokenize as runs — matching the
    jflex ``{HangulEx}+`` rule (testKorean: "훈민정음" is one token),
  * tokens longer than 255 chars are dropped (StandardAnalyzer.java:58).

Documented divergences from the full jflex grammar: no word-joining
across ZWSP, MidLetter limited to the two apostrophes (not U+00B7 /
U+05F4 / the Unicode-6.1 katakana middle dot U+30FB), and no
ExtendNumLet (underscore) bridge between katakana and Latin runs
("カナ_abc" is two tokens here, one WORD token in jflex). The
reference's golden Unicode tests for ten non-Latin scripts
(TestStandardAnalyzer.java:59-110 — Armenian, Amharic, Arabic, Aramaic,
Bengali, Farsi, Greek, Thai, Lao, Tibetan) plus the Japanese/Korean/
combining-mark goldens (TestStandardAnalyzer.java:205-232) pass
identically in the Python and JVM twins (tests/test_analysis.py,
tests/test_analysis_unicode.py).

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

# Ideographic singles: radicals, iteration marks/numerals from the
# CJK-symbols block (NOT its punctuation - U+3002 etc. must drop,
# TestStandardAnalyzer testChinese), kana, unified ideographs +
# ext A, compatibility ideographs.
_CJK = ("⺀-⻿々〇〡-〩〸-〻㐀-䶿一-鿿豈-﫿"
        "\U00020000-\U0002A6DF\U0002A700-\U0002B81F\U0002F800-\U0002FA1F")

# Script:Hiragana — one char per <HIRAGANA> token, like Han
# (StandardTokenizerImpl.jflex:61,76,185; testJapanese "い" is its own
# token). U+3099/309A combining voiced marks are Extend, not Hiragana.
_HIRAGANA = "ぁ-ゖゝ-ゟ\U0001b001"

# WB:Katakana (Unicode 6.1) + KatakanaSupp (StandardTokenizerImpl.
# jflex:54): katakana block, halfwidth forms, phonetic extensions,
# circled/squared forms, vertical kana repeat marks, (semi-)voiced
# sound marks, prolonged sound mark. U+30FB KATAKANA MIDDLE DOT is
# WB:MidLetter, NOT Katakana — excluded. Emitted as RUNS
# ({KatakanaEx}+, jflex:139 — testJapanese "カタカナ" is ONE token).
_KATAKANA = ("〱-〵゛゜゠-ヺー-ヿ"
             "ㇰ-ㇿ㋐-㋾㌀-㍗ｦ-ﾟ"
             "\U0001b000")

from .ubreak import MARK_CLASS as _MARKS  # noqa: E402  (UCD class data)

# Building blocks: W = one word char (any script, minus the CJK /
# hiragana / katakana special classes), M* = WB4 absorption (combining
# marks + format controls stay in-token).
_W = rf"[^\W{_CJK}{_HIRAGANA}{_KATAKANA}]"
_WND = rf"[^\W\d_{_CJK}{_HIRAGANA}{_KATAKANA}]"  # letter (no digit/underscore)
_M = rf"[{_MARKS}]*"

# Katakana runs, one ideograph/hiragana per token (each absorbing
# trailing Extend/Format — testCombiningMarks), else a marked-\w run
# extended by MidLetter-apostrophe between letters and MidNum ./,
# between digits. Katakana run = [K][K|M]* ≡ jflex (K M*)+ with a
# single linear class test per char.
TOKEN_RE = re.compile(
    rf"[{_KATAKANA}][{_KATAKANA}{_MARKS}]*"
    rf"|[{_CJK}{_HIRAGANA}]{_M}"
    rf"|(?:{_W}{_M})+"
    rf"(?:['\u2019]{_WND}{_M}(?:{_W}{_M})*|[.,][0-9]{_M}(?:{_W}{_M})*)*"
)

_STOP_ARR = np.array(sorted(ENGLISH_STOP_WORDS))

# Java-regex port of TOKEN_RE for the JVM fast path ((?U) = Unicode
# character classes, matching Python's default \w semantics).
#
# PERFORMANCE: the mark class must NOT be spelled as the 313 literal
# ranges here — Java's Pattern compiles a many-range class into a
# chained union of predicates, making every character test O(#ranges)
# (measured: a single build task went from seconds to >27 min). Java's
# category classes compile to O(1) Character.getType lookups instead,
# so the JVM twin uses [\p{Mn}\p{Mc}\p{Me}\p{Cf}] minus ZWSP.
# Python's re compiles the explicit ranges into a bitmap (fast), so
# TOKEN_RE keeps them. The two sides use their runtime's UCD (JDK 17 ~
# Unicode 13, CPython 3.11 = 14.0) — identical on every script the
# golden tests pin; divergence is limited to code points added between
# those UCD versions.
# One COMBINED class "word char or mark" keeps the hot loop at a
# single class test per character (plain ASCII text never reaches the
# category predicates): token body = W C*, which generates the same
# language as (W M*)+ since C = W|M and every mix after the leading
# word char is reachable either way.
_JMARK = "[\\p{Mn}\\p{Mc}\\p{Me}\\p{Cf}&&[^\u200b]]"
_JC = f"[{_W}{_JMARK}]*"
JAVA_TOKEN_PATTERN = (  # word branch first: the common case short-circuits
    f"(?U){_W}{_JC}"
    f"(?:['\u2019]{_WND}{_JC}|[.,][0-9]{_JC})*"
    f"|[{_KATAKANA}][{_KATAKANA}{_JMARK}]*"
    f"|[{_CJK}{_HIRAGANA}]{_JMARK}*"
)


def analyze_expr(text_col, stop_filter: bool = True):
    """JVM-side StandardAnalyzer chain as a Column expression:
    regexp_extract_all (tokenize) -> lower -> length cap -> stop filter.
    Whole-stage-codegen'd — zero Python in the indexing hot path; the
    pandas implementation below stays as the spec/oracle twin.

    stop_filter=False keeps stopwords (the positional build filters them
    later so position increments are preserved, StopFilter contract)."""
    from pyspark.sql import functions as F
    toks = F.regexp_extract_all(text_col if not isinstance(text_col, str)
                                else F.col(text_col),
                                F.lit(JAVA_TOKEN_PATTERN), 0)
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
