"""Optional analysis stages beyond the StandardAnalyzer chain — the
engine's TokenFilter extension surface (SURVEY §2.I: swappable stages).

Analogs from lucene/analysis/common:
  ascii_fold         — ASCIIFoldingFilter (accented Latin -> ASCII)
  shingles           — ShingleFilter (word n-grams, used by MinHash dedup)
  ngrams             — NGramTokenFilter (char n-grams)
  edge_ngrams        — EdgeNGramTokenFilter (prefix grams, autocomplete)
  mapping_charfilter — MappingCharFilter (longest-match char rewrites)
  pattern_tokenize   — PatternTokenizer (split / group-extract)
  pattern_replace    — PatternReplaceFilter
  length_filter      — LengthFilter
  trim_filter        — TrimFilter
  keyword_tokenize   — KeywordTokenizer

Each has a JVM Column form (for indexing pipelines) and a plain-Python
form (for oracles/tests).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, functions as F


# ------------------------------------------------------------- python side

def ascii_fold_py(token: str) -> str:
    return (unicodedata.normalize("NFKD", token)
            .encode("ascii", "ignore").decode("ascii"))


def shingles_py(tokens: list[str], n: int = 2, sep: str = " ") -> list[str]:
    return [sep.join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def ngrams_py(token: str, n: int = 3) -> list[str]:
    return [token[i:i + n] for i in range(len(token) - n + 1)]


def edge_ngrams_py(token: str, min_n: int = 1, max_n: int = 5) -> list[str]:
    return [token[:k] for k in range(min_n, min(max_n, len(token)) + 1)]


# ---------------------------------------------------------------- JVM side

_FOLD_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ"
_FOLD_TO = "aaaaaaceeeeiiiinooooouuuuyy" + "oa"  # œ->o(e dropped), æ->a


def ascii_fold_expr(col: Column | str) -> Column:
    """translate()-based folding for the common Latin-1 range (the JVM
    fast path; the Python form handles full NFKD)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _FOLD_FROM, _FOLD_TO)


def shingles_expr(tokens: Column, n: int = 2, sep: str = " ") -> Column:
    """ShingleFilter as a higher-order expression over an array column."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(F.sequence(F.lit(0), F.size(tokens) - n),
                    lambda i: F.concat_ws(sep, F.slice(tokens, i + 1, n)))
    ).otherwise(F.array())


def edge_ngrams_expr(token: Column, min_n: int = 1, max_n: int = 5) -> Column:
    return F.filter(
        F.transform(F.sequence(F.lit(min_n), F.lit(max_n)),
                    lambda k: F.substring(token, 1, k)),
        lambda g: F.length(g) >= min_n)


# ------------------------------------------- word delimiter / CJK bigrams

_WD_SPLITS = [
    (r"([a-z])([A-Z])", r"\1 \2"),          # case transition: camelCase
    (r"([A-Za-z])([0-9])", r"\1 \2"),       # alpha -> digit boundary
    (r"([0-9])([A-Za-z])", r"\1 \2"),       # digit -> alpha boundary
]


def word_delimiter_py(token: str, catenate: bool = False,
                      preserve_original: bool = False) -> list[str]:
    """WordDelimiterFilter subset (ref: analysis/common/.../miscellaneous/
    WordDelimiterFilter.java): split on intra-word delimiters ([-_.]),
    case transitions and alpha/digit boundaries (generateWordParts +
    generateNumberParts + splitOnCaseChange + splitOnNumerics);
    catenate=True appends the delimiter-free concatenation (catenateAll);
    preserve_original=True keeps the input token first."""
    import re
    s = re.sub(r"[-_.]+", " ", token)
    for pat, rep in _WD_SPLITS:
        s = re.sub(pat, rep, s)
    parts = [p for p in s.split(" ") if p]
    out = ([token] if preserve_original and (len(parts) != 1 or parts[0] != token)
           else [])
    out.extend(parts)
    if catenate and len(parts) > 1:
        out.append("".join(parts))
    return out


def word_delimiter_expr(token: Column, catenate: bool = False) -> Column:
    """JVM Column form: regexp boundary insertion + split (whole-stage
    codegen); returns array<string> of subwords (+ catenation)."""
    s = F.regexp_replace(token, r"[-_.]+", " ")
    for pat, rep in _WD_SPLITS:
        s = F.regexp_replace(s, pat, rep.replace("\\1", "$1").replace("\\2", "$2"))
    parts = F.filter(F.split(s, " "), lambda p: p != F.lit(""))
    if not catenate:
        return parts
    cat = F.regexp_replace(token, r"[-_.]+", "")
    return F.when(F.size(parts) > 1, F.concat(parts, F.array(cat))) \
            .otherwise(parts)


# --------------------------------------------- pattern / mapping factories

def mapping_charfilter_py(text: str, mappings: dict[str, str]) -> str:
    """MappingCharFilter analog (ref: analysis/common/.../charfilter/
    MappingCharFilter.java + NormalizeCharMap.java): greedy
    longest-match-at-position, single left-to-right pass, replacement
    output is NOT rescanned (the FST semantics). Implemented as one
    regex alternation sorted longest-first — Python's re picks the
    first matching alternative at each position, so the sort gives
    leftmost-longest, and re.sub never rescans what it substituted."""
    import re as _re
    if not mappings:
        return text
    srcs = sorted(mappings, key=len, reverse=True)
    rx = _re.compile("|".join(_re.escape(s) for s in srcs))
    return rx.sub(lambda m: mappings[m.group(0)], text)


def mapping_charfilter_expr(col: Column | str,
                            mappings: dict[str, str]) -> Column:
    """JVM Column form: chained regexp_replace, longest source first.
    Caveat vs the Python/FST form: each later replace DOES see earlier
    replacement output, so exact parity requires that no replacement
    string contains any mapping source (true of fold/normalize maps —
    parity is property-tested on the fixture corpus in
    tests/test_components.py)."""
    import re as _re
    c = F.col(col) if isinstance(col, str) else col
    for s in sorted(mappings, key=len, reverse=True):
        c = F.regexp_replace(c, _re.escape(s),
                             mappings[s].replace("\\", "\\\\").replace("$", r"\$"))
    return c


def pattern_tokenize_py(text: str, pattern: str, group: int = -1) -> list[str]:
    """PatternTokenizer (ref: analysis/common/.../pattern/
    PatternTokenizer.java:43-56): group == -1 -> pattern is the token
    SEPARATOR (split semantics); group >= 0 -> emit that capture group
    of every match."""
    import re as _re
    if group < 0:
        return [t for t in _re.split(pattern, text) if t]
    return [m.group(group) for m in _re.finditer(pattern, text)
            if m.group(group)]


def pattern_tokenize_expr(col: Column | str, pattern: str,
                          group: int = -1) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if group < 0:
        return F.filter(F.split(c, pattern), lambda t: t != F.lit(""))
    return F.filter(F.regexp_extract_all(c, F.lit(pattern), F.lit(group)),
                    lambda t: t != F.lit(""))


def pattern_replace_py(tokens: list[str], pattern: str, repl: str,
                       replace_all: bool = True) -> list[str]:
    """PatternReplaceFilter (ref: analysis/common/.../pattern/
    PatternReplaceFilter.java:33-44); empty results are kept, as in
    the reference (it never removes tokens)."""
    import re as _re
    rx = _re.compile(pattern)
    return [rx.sub(repl, t, count=0 if replace_all else 1) for t in tokens]


def pattern_replace_expr(tokens: Column, pattern: str, repl: str) -> Column:
    return F.transform(tokens, lambda t: F.regexp_replace(t, pattern, repl))


def length_filter_py(tokens: list[str], min_len: int, max_len: int) -> list[str]:
    """LengthFilter (ref: analysis/common/.../miscellaneous/
    LengthFilter.java:30-40): keep tokens with min <= len <= max."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def length_filter_expr(tokens: Column, min_len: int, max_len: int) -> Column:
    return F.filter(tokens, lambda t: (F.length(t) >= min_len)
                    & (F.length(t) <= max_len))


def trim_filter_py(tokens: list[str]) -> list[str]:
    """TrimFilter (ref: analysis/common/.../miscellaneous/TrimFilter.java)."""
    return [t.strip() for t in tokens]


def trim_filter_expr(tokens: Column) -> Column:
    return F.transform(tokens, lambda t: F.trim(t))


def keyword_tokenize_py(text: str) -> list[str]:
    """KeywordTokenizer (ref: analysis/core/.../KeywordTokenizer.java):
    the whole input is one token (empty input -> no tokens)."""
    return [text] if text else []


def keyword_tokenize_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.array(c)).otherwise(F.array())


_CJK_RANGE = r"一-鿿㐀-䶿぀-ヿ가-힯"


def cjk_bigrams_py(tokens: list[str]) -> list[str]:
    """CJKBigramFilter analog (ref: analysis/common/.../cjk/
    CJKBigramFilter.java): tokens made of CJK codepoints are re-emitted
    as overlapping character bigrams (a lone CJK char stays a unigram);
    non-CJK tokens pass through."""
    import re
    cjk = re.compile(f"^[{_CJK_RANGE}]+$")
    out = []
    for t in tokens:
        if cjk.match(t) and len(t) >= 2:
            out.extend(t[i:i + 2] for i in range(len(t) - 1))
        else:
            out.append(t)
    return out


def cjk_bigrams_expr(tokens: Column) -> Column:
    """JVM form over array<string>."""
    def per_token(t):
        is_cjk = t.rlike(f"^[{_CJK_RANGE}]+$") & (F.length(t) >= 2)
        bigrams = F.transform(F.sequence(F.lit(1), F.length(t) - 1),
                              lambda i: F.substring(t, i, 2))
        return F.when(is_cjk, bigrams).otherwise(F.array(t))
    return F.flatten(F.transform(tokens, per_token))


# --------------------------------------------------------- common grams

def common_grams(tokens: list[str], common: set[str],
                 separator: str = "_") -> list[str]:
    """CommonGramsFilter (ref: lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java:53-126): index-side — emit every unigram, and
    for each adjacent pair where EITHER member is a common word, overlay
    the bigram "prev_current" at the previous token's position
    (posIncrement 0 in the reference; list order here: gram directly
    after its first member). Makes phrase queries over stopword-heavy
    text cheap: the bigram's postings replace a positional intersection
    with the (huge) stopword posting list."""
    out: list[str] = []
    prev: str | None = None
    for t in tokens:
        if prev is not None and (prev in common or t in common):
            out.append(f"{prev}{separator}{t}")
        out.append(t)
        prev = t
    return out


def common_grams_query(tokens: list[str], common: set[str],
                       separator: str = "_") -> list[str]:
    """CommonGramsQueryFilter (ref: commongrams/CommonGramsQueryFilter
    .java:73-84 javadoc example): query-side — output bigrams whenever
    possible; a unigram only when it is a member of no bigram.
    "the rain in spain falls mainly" (common: the, in) ->
    ["the_rain", "rain_in", "in_spain", "falls", "mainly"]."""
    n = len(tokens)
    used = [False] * n
    for i in range(n - 1):
        if tokens[i] in common or tokens[i + 1] in common:
            used[i] = used[i + 1] = True
    out: list[str] = []
    for i in range(n):
        if i < n - 1 and (tokens[i] in common or tokens[i + 1] in common):
            out.append(f"{tokens[i]}{separator}{tokens[i + 1]}")
        if not used[i]:
            out.append(tokens[i])
    return out


def keep_words(tokens: list[str], keep: set[str]) -> list[str]:
    """KeepWordFilter (ref: miscellaneous/KeepWordFilter.java:30):
    inverse of StopFilter — only listed words survive."""
    return [t for t in tokens if t in keep]


def type_token_filter(tokens: list[str], types: list[str],
                      keep_types: set[str], use_white_list: bool = True
                      ) -> list[str]:
    """TypeTokenFilter (ref: core/TypeTokenFilter.java:28): keep (or
    drop) tokens by their lexical type (the StandardTokenizer type
    attribute — ALPHANUM/NUM/CJK...)."""
    if use_white_list:
        return [t for t, ty in zip(tokens, types) if ty in keep_types]
    return [t for t, ty in zip(tokens, types) if ty not in keep_types]


# ------------------------------------------------------------ elision

# FrenchAnalyzer.DEFAULT_ARTICLES (ref: analysis/common/.../fr/
# FrenchAnalyzer.java:68; util/ElisionFilter.java:33)
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"])


def elision_py(tokens: list[str],
               articles: frozenset = FRENCH_ARTICLES) -> list[str]:
    """ElisionFilter (ref: util/ElisionFilter.java:33): strip a leading
    article + apostrophe ("l'avion" -> "avion", "qu'il" -> "il"); both
    ASCII ' and U+2019 count. Non-elided tokens pass through."""
    out = []
    for t in tokens:
        for apos in ("'", "’"):
            i = t.find(apos)
            if i > 0 and t[:i].lower() in articles:
                t = t[i + 1:]
                break
        out.append(t)
    return out


def elision_expr(col: Column,
                 articles: frozenset = FRENCH_ARTICLES) -> Column:
    """JVM twin over an array<string> column."""
    pat = "(?i)^(" + "|".join(sorted(articles)) + ")['’]"
    return F.transform(col, lambda t: F.regexp_replace(t, pat, ""))


def turkish_lowercase_py(token: str) -> str:
    """Turkish-aware lowercase (ref: analysis/common/.../tr/
    TurkishLowerCaseFilter.java:53): I -> {dotless i}, unless a
    combining-dot-above follows (possibly after other combining marks),
    in which case I -> i and every combining dot in that run is
    removed; other chars take the SIMPLE per-codepoint lowercase
    (Character.toLowerCase), so {I WITH DOT ABOVE} -> i (not i + dot)
    and capital sigma never takes the final-sigma form."""
    import unicodedata
    out = []
    i = 0
    n = len(token)
    i_or_after = False
    while i < n:
        ch = token[i]
        i_or_after = (ch == "I"
                      or (i_or_after
                          and unicodedata.category(ch) == "Mn"))
        if i_or_after:
            if ch == "\u0307":          # combining dot above: swallow
                i += 1
                continue
            if ch == "I":
                j = i + 1                # dot after (only) marks?
                before_dot = False
                while j < n and unicodedata.category(token[j]) == "Mn":
                    if token[j] == "\u0307":
                        before_dot = True
                        break
                    j += 1
                if before_dot:
                    out.append("i")
                else:
                    out.append("\u0131")
                    i_or_after = False
                i += 1
                continue
        out.append(_simple_lower(ch))
        i += 1
    return "".join(out)


def _simple_lower(ch: str) -> str:
    # simple (1:1) case mapping: the two chars whose full lowercase
    # diverges from Character.toLowerCase
    if ch == "\u0130":
        return "i"
    low = ch.lower()
    return low if len(low) == 1 else low[0]


def turkish_lowercase_expr(col: Column | str) -> Column:
    """JVM twin of turkish_lowercase_py as one Catalyst expression.
    Sentinel rewrite: capital I before a (mark-run +) combining dot is
    tagged, the run's dots are deleted through a bounded lookbehind,
    remaining capital I becomes dotless; {I WITH DOT ABOVE} and capital
    sigma are pre-translated to their simple lowercase so the final
    lower() cannot apply the full/contextual mappings."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "I(?=\\p{Mn}*\u0307)", "\u0000")
    c = F.regexp_replace(c, "(?<=\u0000\\p{Mn}{0,9})\u0307", "")
    c = F.translate(c, "\u0000I\u0130\u03a3", "i\u0131i\u03c3")
    return F.lower(c)


# ------------------------------------------------ misc token filters (r4)

def reverse_string_py(tokens: list[str]) -> list[str]:
    """ReverseStringFilter (ref: analysis/common/.../reverse/
    ReverseStringFilter.java:46): reverse each token's characters.
    The indexing half of Solr's ReversedWildcardFilter — see
    search/revwildcard.py for the leading-wildcard query rewrite."""
    return [t[::-1] for t in tokens]


def reverse_string_expr(tokens: Column) -> Column:
    return F.transform(tokens, F.reverse)


def capitalization_py(tokens: list[str],
                      only_first_word: bool = True,
                      force_first_letter: bool = True,
                      keep: set[str] | None = None,
                      min_word_length: int = 0) -> list[str]:
    """CapitalizationFilter default semantics (miscellaneous/
    CapitalizationFilter.java:87): per space-separated word, keep-list
    words pass through (except a forced first letter on word 1);
    otherwise Title-case words >= min_word_length; with
    only_first_word, words after the first are lowercased."""
    out = []
    for t in tokens:
        words = t.split(" ")
        res = []
        for i, w in enumerate(words):
            if not w:
                res.append(w)
                continue
            if keep and w.lower() in keep:
                if i == 0 and force_first_letter:
                    w = w[0].upper() + w[1:]
                res.append(w)
            elif (i == 0 or not only_first_word) \
                    and len(w) >= min_word_length:
                res.append(w[0].upper() + w[1:].lower())
            else:
                res.append(w.lower())
        out.append(" ".join(res))
    return out


def remove_duplicates_py(tokens: list[str],
                         pos_incs: list[int] | None = None) -> list[str]:
    """RemoveDuplicatesTokenFilter (miscellaneous/RemoveDuplicates
    TokenFilter.java:33): drop a token whose term already occurred AT
    THE SAME POSITION (posInc 0). Without explicit increments, stacked
    synonyms are adjacent in the list model, so equal-adjacent tokens
    are the posInc-0 duplicates."""
    out: list[str] = []
    if pos_incs is not None:
        seen: set[str] = set()
        for t, inc in zip(tokens, pos_incs):
            if inc > 0:
                seen = set()
            if t in seen:
                continue
            seen.add(t)
            out.append(t)
        return out
    for t in tokens:
        if out and out[-1] == t:
            continue
        out.append(t)
    return out


def apostrophe_py(tokens: list[str]) -> list[str]:
    """ApostropheFilter (the Turkish possessive strip that ships with
    later reference lines; factory-compatible): drop the apostrophe and
    everything after it (Turkey'de -> Turkey)."""
    out = []
    for t in tokens:
        i = min((t.find(c) for c in "'’＇" if c in t),
                default=-1)
        out.append(t[:i] if i >= 0 else t)
    return out


def hyphenated_words_py(tokens: list[str]) -> list[str]:
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:
    57): a token ending in '-' joins the following token with the
    hyphen removed (line-break de-hyphenation); a trailing unpaired
    hyphenated token keeps its hyphen stripped."""
    out: list[str] = []
    pending: str | None = None
    for t in tokens:
        if pending is not None:
            out.append(pending + t)
            pending = None
            continue
        if t.endswith("-") and len(t) > 1:
            pending = t[:-1]
        else:
            out.append(t)
    if pending is not None:
        out.append(pending)
    return out


def limit_token_count_py(tokens: list[str], max_tokens: int) -> list[str]:
    """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java):
    index only the first max_tokens tokens of a field."""
    return tokens[:max_tokens]


def limit_token_count_expr(tokens: Column, max_tokens: int) -> Column:
    return F.slice(tokens, 1, max_tokens)


def english_possessive_py(tokens: list[str]) -> list[str]:
    """EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:56):
    strip trailing 's / ’s / ＇s (case-insensitive s)."""
    out = []
    for t in tokens:
        if len(t) >= 2 and t[-2] in "'’＇" and t[-1] in "sS":
            out.append(t[:-2])
        else:
            out.append(t)
    return out


def english_possessive_expr(tokens: Column) -> Column:
    return F.transform(
        tokens, lambda t: F.regexp_replace(t, "['’＇][sS]$", ""))


# halfwidth kana -> fullwidth (U+FF65-FF9F), with the two voice marks
# kept raw for the combine step (CJKWidthFilter.java:47-55)
_KANA_NORM = [
    0x30fb, 0x30f2, 0x30a1, 0x30a3, 0x30a5, 0x30a7, 0x30a9, 0x30e3,
    0x30e5, 0x30e7, 0x30c3, 0x30fc, 0x30a2, 0x30a4, 0x30a6, 0x30a8,
    0x30aa, 0x30ab, 0x30ad, 0x30af, 0x30b1, 0x30b3, 0x30b5, 0x30b7,
    0x30b9, 0x30bb, 0x30bd, 0x30bf, 0x30c1, 0x30c4, 0x30c6, 0x30c8,
    0x30ca, 0x30cb, 0x30cc, 0x30cd, 0x30ce, 0x30cf, 0x30d2, 0x30d5,
    0x30d8, 0x30db, 0x30de, 0x30df, 0x30e0, 0x30e1, 0x30e2, 0x30e4,
    0x30e6, 0x30e8, 0x30e9, 0x30ea, 0x30eb, 0x30ec, 0x30ed, 0x30ef,
    0x30f3, 0x3099, 0x309a,
]
# combining deltas over U+30A6-30FD (CJKWidthFilter.java:88-103)
_KANA_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0,
    1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_HALF_VOICED = [0] * 88
for _i in (41, 44, 47, 50, 53):
    _KANA_HALF_VOICED[_i] = 2


def cjk_width_py(token: str) -> str:
    """CJKWidthFilter (ref: analysis/common/.../cjk/CJKWidthFilter.java:38):
    fold fullwidth ASCII (U+FF01-FF5E) to basic latin, halfwidth
    katakana (U+FF65-FF9F) to fullwidth kana; a halfwidth voice mark
    (U+FF9E/FF9F) combines into the preceding kana when a composed
    form exists, else falls back to the combining mark U+3099/309A."""
    out: list[str] = []
    for ch in token:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_HALF_VOICED if cp == 0xFF9F
                         else _KANA_VOICED)[prev - 0x30A6]
                    if d:
                        out[-1] = chr(prev + d)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def cjk_width_expr(col: Column | str) -> Column:
    """JVM twin of cjk_width_py: two translate() passes (fullwidth
    ASCII, plain kana) then composed-voice-mark regexp folds — stays in
    whole-stage codegen, no Python in the scan path."""
    full = "".join(chr(c) for c in range(0xFF01, 0xFF5F))
    half = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))
    c = F.translate(F.col(col) if isinstance(col, str) else col,
                    full, half)
    # voiced/half-voiced combinations first (two-char -> one composed)
    for src_cp, delta_tab, mark in (
            (0xFF9E, _KANA_VOICED, "ﾞ"),
            (0xFF9F, _KANA_HALF_VOICED, "ﾟ")):
        pairs = [(chr(0x30A6 + i), chr(0x30A6 + i + d))
                 for i, d in enumerate(delta_tab) if d]
        # halfwidth kana must be normalized before the base can
        # combine, so fold single kana first for the pair regex
        src = "".join(p[0] for p in pairs)
        for base, composed in pairs:
            c = F.regexp_replace(
                c, _halfwidth_to_full_regex(base) + mark, composed)
    kana_src = "".join(chr(c_) for c_ in range(0xFF65, 0xFFA0))
    kana_dst = "".join(chr(c_) for c_ in _KANA_NORM)
    return F.translate(c, kana_src, kana_dst)


def _halfwidth_to_full_regex(base_kana: str) -> str:
    """Regex matching the fullwidth kana OR its halfwidth source(s)."""
    alts = [base_kana]
    cp = ord(base_kana)
    for i, norm in enumerate(_KANA_NORM):
        if norm == cp:
            alts.append(chr(0xFF65 + i))
    return "(" + "|".join(alts) + ")"
