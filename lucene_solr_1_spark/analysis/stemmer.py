"""Porter stemmer + synonym mapping — TokenFilter stages (SURVEY §2.I).

Analogs from the reference:
  porter_stem  — PorterStemFilter / PorterStemmer (lucene/analysis/common/
                 src/java/org/apache/lucene/analysis/en/PorterStemmer.java,
                 a direct translation of M. Porter's 1980 public-domain
                 algorithm; like the reference, words shorter than 3
                 characters pass through unchanged)
  synonyms     — SynonymFilter (analysis/common/.../synonym/SynonymFilter
                 .java) restricted to single-token rules, in both replace
                 and expand modes.

Scale design: stemming is applied at the **vocabulary level** — stem the
distinct terms of a batch (or the term dictionary itself), then map the
token stream through the result. The per-batch dictionary is orders of
magnitude smaller than the token stream (Zipf), so the pure-Python rule
cascade runs O(|vocab|), not O(|tokens|), inside an Arrow-batched stage.
The same trick powers index-time stemming: stem the postings table's
term column and re-aggregate — no re-tokenization pass over 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F

__all__ = ["porter_stem", "porter2_stem", "stem_vocab", "stem_token_lists",
           "synonyms_py", "synonym_expr"]

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V] (Porter 1980 §2)."""
    m, prev_c = 0, None
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if prev_c and not c:
            pass
        elif prev_c is not None and prev_c is False and c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    """Classic Porter algorithm; ASCII lowercase input expected."""
    w = word
    if len(w) < 3:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            hit = w = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            hit = w = w[:-3]
        if hit is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w[-1] == "l":
        w = w[:-1]
    return w


def _stem_fn(algorithm: str):
    if algorithm == "porter":
        return porter_stem
    if algorithm in ("porter2", "snowball", "english"):
        return porter2_stem
    if algorithm in ("german", "snowball_german"):
        # full Snowball German (SnowballFilter.java:53 with
        # GermanStemmer), vocabulary-validated — analysis/snowball.py
        from .snowball import german_stem
        return german_stem
    if algorithm == "kstem":
        # Krovetz dictionary stemmer (KStemFilter.java:49),
        # oracle-validated — analysis/kstem.py
        from .kstem import kstem
        return kstem
    if algorithm in ("polish", "stempel"):
        # Stempel Egothor-trie stemmer with the StempelFilter length
        # gate baked in (stempel/StempelFilter.java:63),
        # oracle-validated — analysis/stempel.py
        from .stempel import polish_stem
        return polish_stem
    if algorithm in ("swedish", "snowball_swedish",
                     "danish", "snowball_danish",
                     "norwegian", "snowball_norwegian",
                     "french", "snowball_french",
                     "spanish", "snowball_spanish",
                     "italian", "snowball_italian",
                     "portuguese", "snowball_portuguese",
                     "russian", "snowball_russian",
                     "dutch", "snowball_dutch",
                     "german2", "snowball_german2",
                     "romanian", "snowball_romanian",
                     "finnish", "snowball_finnish",
                     "hungarian", "snowball_hungarian",
                     "turkish", "snowball_turkish",
                     "kp", "snowball_kp",
                     "lovins", "snowball_lovins"):
        from . import snowball
        lang = algorithm.split("_")[-1]
        return {"swedish": snowball.swedish_stem,
                "danish": snowball.danish_stem,
                "norwegian": snowball.norwegian_stem,
                "french": snowball.french_stem,
                "spanish": snowball.spanish_stem,
                "italian": snowball.italian_stem,
                "portuguese": snowball.portuguese_stem,
                "russian": snowball.russian_stem,
                "dutch": snowball.dutch_stem,
                "german2": snowball.german2_stem,
                "romanian": snowball.romanian_stem,
                "finnish": snowball.finnish_stem,
                "hungarian": snowball.hungarian_stem,
                "turkish": snowball.turkish_stem,
                "kp": snowball.kp_stem,
                "lovins": snowball.lovins_stem}[lang]
    if algorithm in ("armenian", "snowball_armenian",
                     "basque", "snowball_basque",
                     "catalan", "snowball_catalan",
                     "irish", "snowball_irish"):
        # contributed Snowball stemmers (tartarus/ext completion),
        # oracle-validated — analysis/snowball2.py
        from . import snowball2
        lang = algorithm.split("_")[-1]
        return {"armenian": snowball2.armenian_stem,
                "basque": snowball2.basque_stem,
                "catalan": snowball2.catalan_stem,
                "irish": snowball2.irish_stem}[lang]
    fn = _LIGHT_STEMMERS.get(algorithm)
    if fn is None:
        raise ValueError(f"unknown stemmer {algorithm!r}")
    return fn


def stem_vocab(terms, algorithm: str = "porter",
               protected: set[str] | None = None,
               overrides: dict[str, str] | None = None) -> dict[str, str]:
    """term -> stem for a vocabulary (the O(|vocab|) path).

    `protected` terms pass through unstemmed (KeywordMarkerFilter, ref:
    analysis/common/.../miscellaneous/SetKeywordMarkerFilter.java:29 —
    KEYWORD attribute short-circuits downstream stemmers). `overrides`
    force a specific stem (StemmerOverrideFilter, ref: miscellaneous/
    StemmerOverrideFilter.java:37 — its FST map consulted before the
    algorithmic stemmer). Override wins over protection, matching the
    chain order StemmerOverride -> KeywordMarker -> stemmer."""
    fn = _stem_fn(algorithm)
    protected = protected or set()
    overrides = overrides or {}

    def one(t: str) -> str:
        if t in overrides:
            return overrides[t]
        if t in protected:
            return t
        return fn(t)

    return {t: one(t) for t in terms}


def stem_token_lists(token_lists: pd.Series,
                     algorithm: str = "porter") -> pd.Series:
    """Vocabulary-trick stemming of a Series of token lists: stem each
    distinct term once, then map the stream through the table."""
    lens = token_lists.str.len().fillna(0).astype(np.int64)
    if int(lens.sum()) == 0:
        return token_lists
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in token_lists if len(t)])
    codes, uniq = pd.factorize(flat)
    fn = _stem_fn(algorithm)
    stemmed = np.array([fn(t) for t in uniq], dtype=object)
    out_flat = stemmed[codes]
    bounds = np.concatenate(([0], np.cumsum(lens.to_numpy())))
    return pd.Series([out_flat[bounds[i]:bounds[i + 1]].tolist()
                      for i in range(len(token_lists))],
                     index=token_lists.index)


# ----------------------------------------------------------- synonyms

def synonyms_py(tokens: list[str], mapping: dict[str, str] | dict[str, list[str]],
                expand: bool = False) -> list[str]:
    """SynonymFilter, single-token rules. replace: token -> mapping[token]
    (identity when absent). expand: keep the token and append its
    synonyms (SynonymFilter's keepOrig side)."""
    if not expand:
        return [mapping.get(t, t) for t in tokens]
    out = []
    for t in tokens:
        out.append(t)
        syn = mapping.get(t)
        if syn is None:
            continue
        out.extend(syn if isinstance(syn, list) else [syn])
    return out


def synonym_expr(tokens: Column, mapping: dict[str, str],
                 expand: bool = False) -> Column:
    """JVM Column form over an array<string> column: a map literal +
    transform/flatten — stays inside whole-stage codegen."""
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    if not expand:
        return F.transform(tokens, lambda t: F.coalesce(m[t], t))
    return F.flatten(F.transform(
        tokens,
        lambda t: F.when(m[t].isNotNull(), F.array(t, m[t]))
                   .otherwise(F.array(t))))


# ---------------------------------------------------------------------------
# EnglishMinimalStemmer — the S-stemmer of Harman 1991 "How Effective Is
# Suffixing?" (ref: lucene/analysis/common/src/java/org/apache/lucene/
# analysis/en/EnglishMinimalStemmer.java:24-43; factory
# EnglishMinimalStemFilterFactory). Plural-only stripping: exact port of
# the published rule table, twinned as a Python function and a JVM
# Column expression (parity-tested).

def english_minimal_stem(w: str) -> str:
    """s-plural stemmer: caresses->caresse? no — see rules:
    len<3 or no trailing 's' -> unchanged; '..us'/'..ss' -> unchanged;
    '..ies' (len>3, not preceded by a/e) -> '..y'; '..[iaou]es' ->
    unchanged; otherwise drop the final 's'."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c2 = w[-2]
    if c2 in ("u", "s"):
        return w
    if c2 == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "u"):
            return w
    return w[:-1]


# same rules as a SQL expression string over a token column name —
# usable in both Spark SQL and DuckDB (shared by the contract twins)
ENGLISH_MINIMAL_STEM_SQL = """
CASE
  WHEN LENGTH({t}) < 3 OR SUBSTR({t}, -1, 1) <> 's' THEN {t}
  WHEN SUBSTR({t}, -2, 1) IN ('u', 's') THEN {t}
  WHEN SUBSTR({t}, -2, 1) = 'e' AND LENGTH({t}) > 3
       AND SUBSTR({t}, -3, 1) = 'i'
       AND SUBSTR({t}, -4, 1) NOT IN ('a', 'e')
    THEN SUBSTR({t}, 1, LENGTH({t}) - 3) || 'y'
  WHEN SUBSTR({t}, -2, 1) = 'e' AND SUBSTR({t}, -3, 1) IN ('i', 'a', 'o', 'u')
    THEN {t}
  ELSE SUBSTR({t}, 1, LENGTH({t}) - 1)
END
""".strip()


def english_minimal_stem_expr(tokens: Column) -> Column:
    """JVM-side twin over an array<string> column (whole-stage codegen)."""
    def one(t):
        c2 = F.substring(t, -2, 1)
        c3 = F.substring(t, -3, 1)
        c4 = F.substring(t, -4, 1)
        n = F.length(t)
        return (
            F.when((n < 3) | (F.substring(t, -1, 1) != "s"), t)
            .when(c2.isin("u", "s"), t)
            .when((c2 == "e") & (n > 3) & (c3 == "i") & ~c4.isin("a", "e"),
                  F.concat(F.substring(t, F.lit(1), n - 3), F.lit("y")))
            .when((c2 == "e") & c3.isin("i", "a", "o", "u"), t)
            .otherwise(F.substring(t, F.lit(1), n - 1)))
    return F.transform(tokens, one)


# ---------------------------------------------------------------------------
# Porter2 — the Snowball English stemmer (ref: lucene/analysis/common/
# src/java/org/apache/lucene/analysis/snowball/SnowballFilter.java with
# the generated org/tartarus/snowball/ext/EnglishStemmer.java; factory
# SnowballPorterFilterFactory language="English"). Implemented from the
# PUBLIC algorithm specification (snowballstem.org "The English (Porter2)
# stemming algorithm") — not a port of the generated Java.

_P2_VOWELS = frozenset("aeiouy")
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_END = frozenset("cdeghkmnrt")

_P2_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXCEPTIONS2 = frozenset(
    "inning outing canning herring earring proceed exceed succeed".split())


def _p2_regions(w: str) -> tuple[int, int]:
    """(R1 start, R2 start). Special prefixes per the spec."""
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if w[i] not in _P2_VOWELS and w[i - 1] in _P2_VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _P2_VOWELS and w[i - 1] in _P2_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _p2_is_short_syllable(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive of the consonant)."""
    # (a) vowel at i-1 followed by non-vowel (not w/x/Y) preceded by non-vowel
    if i >= 2:
        return (w[i - 1] in "aeiouy" and w[i] not in _P2_VOWELS
                and w[i] not in "wxY" and w[i - 2] not in _P2_VOWELS)
    # (b) vowel at start of word followed by a non-vowel
    if i == 1:
        return w[0] in "aeiouy" and w[1] not in _P2_VOWELS
    return False


def _p2_is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _p2_is_short_syllable(w, len(w) - 1)


def porter2_stem(word: str) -> str:
    """Snowball English (Porter2). Lowercase input expected (the analyzer
    lowercases first). Words of length <= 2 are unchanged."""
    w = word
    if len(w) <= 2:
        return w
    # step 0 prelude: strip apostrophe forms
    if w.startswith("'"):
        w = w[1:]
    if w.endswith("'s'"):
        w = w[:-3]
    elif w.endswith("'s"):
        w = w[:-2]
    elif w.endswith("'"):
        w = w[:-1]
    if w in _P2_EXCEPTIONS:
        return _P2_EXCEPTIONS[w]
    if len(w) <= 2:
        return w
    # mark consonant-y as Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _p2_regions(w)

    def in_r1(suf):
        return len(w) - len(suf) >= r1

    def in_r2(suf):
        return len(w) - len(suf) >= r2

    def has_vowel(part):
        # 'Y' is the consonant-y marker — it must NOT count as a vowel
        return any(c in "aeiouy" for c in part)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if has_vowel(w[:-2]):      # vowel not immediately before the s
            w = w[:-1]
    if w in _P2_EXCEPTIONS2:
        return w.replace("Y", "y")
    # step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: len(w) - len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                if has_vowel(stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_P2_DOUBLES):
                        w = w[:-1]
                    elif _p2_is_short(w, r1):
                        w += "e"
                    r1, r2 = _p2_regions(w)   # regions shrink with the word
                break
    # step 1c: y/Y -> i when preceded by a non-vowel that isn't first char
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _P2_VOWELS):
        w = w[:-1] + "i"
    # step 2 (longest suffix among; condition = in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _P2_LI_END:
                        w = w[:-2]
                else:
                    w = w[: len(w) - len(suf)] + rep
                r1, r2 = _p2_regions(w)
            break
    # step 3 (in R1; 'ative' requires R2)
    step3 = [("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
             ("ical", "ic"), ("ness", ""), ("ful", "")]
    for suf, rep in step3:
        if w.endswith(suf):
            if in_r1(suf) and (suf != "ative" or in_r2(suf)):
                w = w[: len(w) - len(suf)] + rep
                r1, r2 = _p2_regions(w)
            break
    # step 4 (in R2)
    step4 = ["ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic"]
    for suf in step4:
        if w.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: len(w) - len(suf)]
                r1, r2 = _p2_regions(w)
            break
    # step 5
    if w.endswith("e"):
        if in_r2("e") or (in_r1("e")
                          and not _p2_is_short_syllable(w, len(w) - 2)):
            w = w[:-1]
    elif w.endswith("l"):
        if in_r2("l") and len(w) > 1 and w[-2] == "l":
            w = w[:-1]
    return w.replace("Y", "y")


# --------------------------------------- UniNE light stemmers (de, es)

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_END = set("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """GermanLightStemmer (ref: lucene/analysis/common/.../de/
    GermanLightStemmer.java:56-139 — Savoy's UniNE light German
    algorithm): fold umlauts/accents to base vowels, then two plural/
    case-suffix passes (-ern/-em/-en/-er/-es/-e/-s then -est/-er/-en/
    -st)."""
    s = word.translate(_DE_FOLD)
    # step 1
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and len(s) >= 2 and s[-2] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif n > 3 and s.endswith("e"):
        s = s[:-1]
    elif n > 3 and s.endswith("s") and s[-2] in _DE_ST_END:
        s = s[:-1]
    # step 2
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and (s.endswith("er") or s.endswith("en")):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _DE_ST_END:
        s = s[:-2]
    return s


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer (ref: lucene/analysis/common/.../es/
    SpanishLightStemmer.java:62-108 — Savoy CLEF-2001): words shorter
    than 5 chars unchanged; fold accents; strip final -o/-a/-e; for
    final -s handle -eses, -ces (c->z), -os/-as/-es."""
    if len(word) < 5:
        return word
    s = word.translate(_ES_FOLD)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s" and len(s) >= 4:
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


_LIGHT_STEMMERS = {"german_light": german_light_stem,
                   "spanish_light": spanish_light_stem}


_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = set("aeiouy")


def finnish_light_stem(word: str) -> str:
    """FinnishLightStemmer (ref: lucene/analysis/common/.../fi/
    FinnishLightStemmer.java:66-259 — Savoy CLEF-2003): words < 4 chars
    unchanged; fold ä/å/ö; strip clitics (-kin/-ko recursively,
    -dellinen/-dellisuus), case endings (step2/step3), then two
    normalization passes (suffix vowels; collapse doubled k/p/t)."""
    if len(word) < 4:
        return word
    s = word.translate(_FI_FOLD)

    # step1: clitic particles, recursive like the Java tail-recursion
    while True:
        if len(s) > 8 and s.endswith("kin"):
            s = s[:-3]
            continue
        if len(s) > 8 and s.endswith("ko"):
            s = s[:-2]
            continue
        break
    if len(s) > 11:
        if s.endswith("dellinen"):
            s = s[:-8]
        elif s.endswith("dellisuus"):
            s = s[:-9]

    # step2
    n = len(s)
    if n > 5:
        if s.endswith(("lla", "tse", "sti")):
            s = s[:-3]
        elif s.endswith("ni"):
            s = s[:-2]
        elif s.endswith("aa"):
            s = s[:-1]

    # step3 (first matching rule wins, like the Java return chain)
    n = len(s)
    if n > 8 and s.endswith("nnen"):
        s = s[:-4] + "s"
    elif n > 8 and s.endswith("ntena"):
        s = s[:-5] + "s"
    elif n > 8 and s.endswith("tten"):
        s = s[:-4]
    elif n > 8 and s.endswith("eiden"):
        s = s[:-5]
    elif n > 6 and s.endswith(("neen", "niin", "seen", "teen", "inen")):
        s = s[:-4]
    elif n > 6 and s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
        s = s[:-3]
    elif n > 6 and s.endswith("den"):
        s = s[:-3] + "s"
    elif n > 6 and s.endswith("ksen"):
        s = s[:-4] + "s"
    elif n > 6 and s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi",
                               "lle")):
        s = s[:-3]
    elif n > 5 and s.endswith(("na", "ne")):
        s = s[:-2]
    elif n > 5 and s.endswith("nei"):
        s = s[:-3]
    elif n > 4 and s.endswith(("ja", "ta")):
        s = s[:-2]
    elif n > 4 and s[-1] == "a":
        s = s[:-1]
    elif n > 4 and s[-1] == "n" and s[-2] in _FI_VOWELS:
        s = s[:-2]
    elif n > 4 and s[-1] == "n":
        s = s[:-1]

    # norm1
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"
    if len(s) > 4 and s.endswith(("ei", "at")):
        s = s[:-2]
    elif len(s) > 3 and s[-1] in "tsjeai":
        s = s[:-1]

    # norm2: trailing e/o/u (len>8), trailing i (len>4), then collapse
    # doubled k/p/t runs
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4 and s[-1] == "i":
        s = s[:-1]
    if len(s) > 4:
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c in "kpt":
                continue
            out.append(c)
        s = "".join(out)
    return s


_LIGHT_STEMMERS["finnish_light"] = finnish_light_stem


_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: str) -> str:
    """FrenchLightStemmer.norm (FrenchLightStemmer.java:229-266): fold
    accents, collapse consecutive duplicate letters, strip -ie, then
    trailing r / e / e / doubled final letter — each under a len>4
    guard evaluated as in the Java."""
    if len(s) > 4:
        s = s.translate(_FR_FOLD)
        out = [s[0]]
        for c in s[1:]:
            if c != out[-1]:
                out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s.endswith("r"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if s.endswith("e"):
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2]:
            s = s[:-1]
    return s


def french_light_stem(word: str) -> str:
    """FrenchLightStemmer (ref: lucene/analysis/common/.../fr/
    FrenchLightStemmer.java:66-226 — Savoy's UniNE light French
    algorithm): plural x/s stripping, then an ordered suffix cascade
    (-issement→-ir, -issant→-ir, -ivement→-if, -ficatrice/-ficateur→
    -fier, -catrice/-cateur→-quer, -atrice/-ateur→-er, -trice→-teur,
    -ième, -teuse/-teur→-ter, -euse, -ère→-er, -ive→-if, folle/molle→
    fou/mou, -nnelle/-nnel→-n, -ète→-et, -ique, -esse, -inage,
    -isation (+ual→uel), -isateur, -ation, -ition), each feeding the
    norm pass. Accents fold inside norm, so the cascade matches the
    accented endings exactly like the reference."""
    s = word
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s = s[:-2] + "l"        # aux -> al (chevaux -> cheval)
        else:
            s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    if len(s) > 9 and s.endswith("issement"):
        return _fr_norm(s[:-6][:-1] + "r")          # -issement -> -ir
    if len(s) > 8 and s.endswith("issant"):
        return _fr_norm(s[:-4][:-1] + "r")          # -issant -> -ir
    if len(s) > 6 and s.endswith("ement"):
        s = s[:-4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-2] + "f"                        # -ivement -> -if
        return _fr_norm(s)
    if len(s) > 11 and s.endswith("ficatrice"):
        return _fr_norm(s[:-5][:-2] + "er")         # -> -fier
    if len(s) > 10 and s.endswith("ficateur"):
        return _fr_norm(s[:-4][:-2] + "er")         # -> -fier
    if len(s) > 9 and s.endswith("catrice"):
        s = s[:-3]
        return _fr_norm(s[:-4] + "quer")            # -> -quer
    if len(s) > 8 and s.endswith("cateur"):
        s = s[:-2]
        return _fr_norm(s[:-4] + "quer")            # -> -quer
    if len(s) > 8 and s.endswith("atrice"):
        return _fr_norm(s[:-4][:-2] + "er")         # -> -er
    if len(s) > 7 and s.endswith("ateur"):
        return _fr_norm(s[:-3][:-2] + "er")         # -> -er
    if len(s) > 6 and s.endswith("trice"):
        s = s[:-1]
        s = s[:-3] + "eur"                          # -trice -> -teur (falls through)
    if len(s) > 5 and s.endswith("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and s.endswith("teuse"):
        return _fr_norm(s[:-2][:-1] + "r")          # -teuse -> -ter
    if len(s) > 6 and s.endswith("teur"):
        return _fr_norm(s[:-1][:-1] + "r")          # -teur -> -ter
    if len(s) > 5 and s.endswith("euse"):
        return _fr_norm(s[:-2])                     # -euse -> -eu
    if len(s) > 8 and s.endswith("ère"):
        s = s[:-1]
        return _fr_norm(s[:-2] + "e" + s[-1])       # -ère -> -er
    if len(s) > 7 and s.endswith("ive"):
        return _fr_norm(s[:-2] + "f")               # -ive -> -if
    if len(s) > 4 and (s.endswith("folle") or s.endswith("molle")):
        return _fr_norm(s[:-2][:-1] + "u")          # folle/molle -> fou/mou
    if len(s) > 9 and s.endswith("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and s.endswith("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and s.endswith("ète"):
        s = s[:-1]
        s = s[:-2] + "e" + s[-1]                    # -ète -> -et (falls through)
    if len(s) > 8 and s.endswith("ique"):
        s = s[:-4]                                  # falls through
    if len(s) > 8 and s.endswith("esse"):
        return _fr_norm(s[:-3])
    if len(s) > 7 and s.endswith("inage"):
        return _fr_norm(s[:-3])
    if len(s) > 9 and s.endswith("isation"):
        s = s[:-7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "e" + s[-1]                # -ual -> -uel
        return _fr_norm(s)
    if len(s) > 9 and s.endswith("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and s.endswith("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and s.endswith("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


_LIGHT_STEMMERS["french_light"] = french_light_stem


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca")
                  or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if s.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemmer (ref: lucene/analysis/common/.../pt/
    PortugueseLightStemmer.java:66-205 — Savoy UniNE): words < 4 chars
    unchanged; plural/adverb suffix removal (with the -ões/-ães → -ão,
    -eis → -el, -ns → -m restorations), feminine normalization to the
    masculine citation form, final -e/-a/-o strip, then accent fold."""
    if len(word) < 4:
        return word
    s = _pt_remove_suffix(word)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_FOLD)


_LIGHT_STEMMERS["portuguese_light"] = portuguese_light_stem


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = set("aeiouy")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return s[:-3]
        if s.endswith(("al", "el")) and s[-3] not in _HU_VOWELS \
                and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return s[:-2]
        if s.endswith(("on", "en")) and s[-3] not in _HU_VOWELS:
            return s[:-2]
        if s[-1] in "tn":
            return s[:-1]
        if s[-1] in "ae" and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s.endswith(("atok", "otok", "etek")):
            return s[:-4]
        if s.endswith(("itek", "itok")):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s.endswith(("unk", "tok", "tek")):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s.endswith(("am", "em", "om", "ad",
                                                   "ed", "od", "uk")):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s.endswith(("nk", "ja", "je")):
            return s[:-2]
        if s.endswith(("im", "id", "ik")):
            return s[:-2]
    if n > 3:
        if s[-1] in "ae" and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if s[-1] in "md" and s[-2] in _HU_VOWELS:
            return s[:-1]
        if s[-1] == "i":
            return s[:-1]
    return s


def hungarian_light_stem(word: str) -> str:
    """HungarianLightStemmer (ref: lucene/analysis/common/.../hu/
    HungarianLightStemmer.java:65-230 — Savoy UniNE): fold accented
    vowels first, then remove case endings, possessive suffixes, the
    plural -k (dropping a linking a/o/e), and a final a/e/i/o vowel."""
    s = word.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    if len(s) > 3 and s[-1] == "k":          # removePlural
        s = s[:-2] if (s[-2] in "aoe" and len(s) > 4) else s[:-1]
    if len(s) > 3 and s[-1] in "aeio":       # normalize
        s = s[:-1]
    return s


_LIGHT_STEMMERS["hungarian_light"] = hungarian_light_stem


def swedish_light_stem(word: str) -> str:
    """SwedishLightStemmer (ref: lucene/analysis/common/.../sv/
    SwedishLightStemmer.java:66-108 — Savoy CLEF-2003): possessive -s,
    then one suffix strip from the ordered ending tables, longest group
    first, then a final t/a/e/n strip."""
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and s.endswith(("elser", "heten")):
        return s[:-5]
    if n > 6 and s.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return s[:-4]
    if n > 5 and s.endswith(("are", "ast", "het")):
        return s[:-3]
    if n > 4 and s.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


_LIGHT_STEMMERS["swedish_light"] = swedish_light_stem


def french_minimal_stem(word: str) -> str:
    """FrenchMinimalStemmer (ref: lucene/analysis/common/.../fr/
    FrenchMinimalStemmer.java:56-72 — Savoy UniNE minimal): words of 6+
    chars lose a final x (aux -> al), else strip s/r/e/é in that fixed
    cascade, then collapse a doubled final letter."""
    s = word
    if len(s) < 6:
        return s
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s = s[:-2] + "l"
            return s
        return s[:-1]
    for ch in "sreé":
        if s[-1] == ch:
            s = s[:-1]
    if s[-1] == s[-2]:
        s = s[:-1]
    return s


_LIGHT_STEMMERS["french_minimal"] = french_minimal_stem


def german_minimal_stem(word: str) -> str:
    """GermanMinimalStemmer (ref: lucene/analysis/common/.../de/
    GermanMinimalStemmer.java:56-87 — Savoy morphologie-légère): fold
    umlauts, then one plural/case strip (-nen, then en/se/es/er pairs,
    then single n/e/s/r)."""
    s = word
    if len(s) < 5:
        return s
    s = s.translate(_DE_MIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s.endswith(("en", "se", "es", "er")):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


_DE_MIN_FOLD = str.maketrans("äöü", "aou")
_LIGHT_STEMMERS["german_minimal"] = german_minimal_stem


def norwegian_light_stem(word: str, nynorsk: bool = False) -> str:
    """NorwegianLightStemmer (ref: lucene/analysis/common/.../no/
    NorwegianLightStemmer.java:75-156, BOKMAAL flags by default):
    possessive -s, then ONE strip from the ordered ending ladder
    (length-7 heter/heten ... down to single a/e/n), with the
    Bokmaal/Nynorsk endings gated by the flag."""
    bok, nyn = not nynorsk, nynorsk
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and ((bok and s.endswith(("heter", "heten")))
                  or (nyn and s.endswith("heita"))):
        return s[:-5]
    if n > 8 and nyn and s.endswith(("heiter", "leiken", "leikar")):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (bok and s.endswith("het"))):
        return s[:-3]
    if n > 6 and nyn and s.endswith(("heit", "semd", "leik")):
        return s[:-4]
    if n > 7 and s.endswith(("elser", "elsen")):
        return s[:-5]
    if n > 6 and ((bok and s.endswith(("ende", "este", "eren")))
                  or (nyn and s.endswith(("ande", "aste", "aren")))
                  or s.endswith("else")):
        return s[:-4]
    if n > 5 and ((bok and s.endswith(("ere", "est")))
                  or (nyn and s.endswith(("are", "ast", "ane")))
                  or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (s.endswith(("er", "en", "et", "te"))
                  or (nyn and s.endswith("ar"))
                  or (bok and s.endswith("st"))):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


_LIGHT_STEMMERS["norwegian_light"] = norwegian_light_stem
_LIGHT_STEMMERS["nynorsk_light"] = lambda w: norwegian_light_stem(
    w, nynorsk=True)


_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï",
                         "aaaaooooeeeeuuuuiiii")


def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer (ref: lucene/analysis/common/.../it/
    ItalianLightStemmer.java:56-108 — Savoy UniNE): fold accents, then
    strip the final vowel with its i/h linking letter (-ie/-he -> 2,
    -e -> 1, etc.)."""
    s = word
    if len(s) < 6:
        return s
    s = s.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last in "ao":
        return s[:-2] if prev == "i" else s[:-1]
    return s


_LIGHT_STEMMERS["italian_light"] = italian_light_stem


_RU_L3PLUS = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
              "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_L2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
          "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
          "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(word: str) -> str:
    """RussianLightStemmer (ref: lucene/analysis/common/.../ru/
    RussianLightStemmer.java:60-137 — Savoy UniNE): case-ending ladder
    (-иями/-оями, the 3-char table, the 2-char table, single vowels/й),
    then normalize a trailing ь/и or doubled н."""
    s = word
    n = len(s)
    if n > 6 and s.endswith(("иями", "оями")):
        s = s[:-4]
    elif n > 5 and s.endswith(_RU_L3PLUS):
        s = s[:-3]
    elif n > 4 and s.endswith(_RU_L2):
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    if len(s) > 3:
        if s[-1] in "ьи":
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


_LIGHT_STEMMERS["russian_light"] = russian_light_stem


# per-language light stemmers + normalizer-backed stems
# (analysis/lang_filters.py — reference's hand-written filter set)
def _lang_filter_stems():
    from . import lang_filters as lff
    return {
        "czech": lff.czech_stem,
        "bulgarian": lff.bulgarian_stem,
        "latvian": lff.latvian_stem,
        "hindi": lambda w: lff.hindi_stem(lff.hindi_normalize(w)),
        "hindi_stem": lff.hindi_stem,
        "indonesian": lff.indonesian_stem,
        "arabic": lambda w: lff.arabic_stem(lff.arabic_normalize(w)),
        "arabic_stem": lff.arabic_stem,
        "norwegian_minimal": _norwegian_minimal,
        "greek": _greek,
        "greek_stem": _greek_stem_raw,
    }


def _greek(w: str) -> str:
    # GreekAnalyzer order: GreekLowerCaseFilter then GreekStemmer
    # (el/GreekAnalyzer.java:120) — vector-validated vs TestGreekStemmer
    from .greek_stem import greek_stem
    from .lang_filters import greek_lowercase
    return greek_stem(greek_lowercase(w))


def _greek_stem_raw(w: str) -> str:
    from .greek_stem import greek_stem
    return greek_stem(w)


def _norwegian_minimal(word: str, nynorsk: bool = False) -> str:
    """NorwegianMinimalStemmer (no/NorwegianMinimalStemmer.java:55,
    Bokmaal flags by default): genitive s, then plural/definite
    endings with minimum lengths."""
    w = word
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    if len(w) > 5 and (w.endswith("ene") or (nynorsk and w.endswith("ane"))):
        return w[:-3]
    if len(w) > 4 and (w.endswith(("er", "en", "et"))
                       or (nynorsk and w.endswith("ar"))):
        return w[:-2]
    if len(w) > 3 and w[-1] in "ae":
        return w[:-1]
    return w


for _name, _fn in _lang_filter_stems().items():
    _LIGHT_STEMMERS[_name] = _fn


# RSLP rule-table family (analysis/rslp.py — Portuguese Orengo +
# Galician; each 0-mismatch vs the reference's test vocabularies)
def _rslp_stems():
    from . import brazilian, rslp
    return {
        "portuguese_rslp": rslp.portuguese_rslp_stem,
        "portuguese_minimal": rslp.portuguese_minimal_stem,
        "galician": rslp.galician_stem,
        "galician_minimal": rslp.galician_minimal_stem,
        "brazilian": brazilian.brazilian_stem,
    }


for _name, _fn in _rslp_stems().items():
    _LIGHT_STEMMERS[_name] = _fn
