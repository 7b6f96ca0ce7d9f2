"""Script-specific normalization filters — exact twins of the
reference's algorithmic normalizers:

- ``arabic_normalize``   — ArabicNormalizer.java:60-91 (alef/yeh/teh
  marbuta folding, tatweel + harakat deletion);
- ``persian_normalize``  — PersianNormalizer.java:56-82 (farsi yeh /
  keheh / heh variants folding, hamza-above deletion);
- ``hindi_normalize``    — HindiNormalizer.java:49-180 (dead-n ->
  bindu, nukta forms, virama/ZWJ deletion, chandra + long-vowel
  shortening);
- ``indic_normalize``    — IndicNormalizer.java: per-script canonical
  compositions over 9 Indic blocks, driven by the decomposition table
  extracted mechanically from the reference
  (tools/gen_indic_table.py -> data/indic_decompositions.json);
- ``irish_lowercase``    — IrishLowerCaseFilter.java:43-67 (n-/t-
  prefix hyphenation before an uppercase vowel, then lowercase);
- ``keyword_repeat``     — KeywordRepeatFilter semantics for the
  list-pipeline: emit (token, stemmed(token)) pairs, deduplicated
  like RemoveDuplicatesTokenFilter would at the same position;
- ``limit_token_position``— LimitTokenPositionFilter: keep tokens
  whose position is <= the configured maximum.
"""
from __future__ import annotations

import json
import pathlib
from functools import lru_cache

_DATA = pathlib.Path(__file__).resolve().parent / "data"

# --- Arabic (ArabicNormalizer.java) ---------------------------------------

_AR_MAP = {0x0622: "ا", 0x0623: "ا", 0x0625: "ا",  # alef forms
           0x0649: "ي",                                      # dotless yeh
           0x0629: "ه"}                                      # teh marbuta
_AR_DELETE = {0x0640, 0x064B, 0x064C, 0x064D, 0x064E, 0x064F, 0x0650,
              0x0651, 0x0652}  # tatweel + harakat


def arabic_normalize(token: str) -> str:
    out = []
    for ch in token:
        cp = ord(ch)
        if cp in _AR_DELETE:
            continue
        out.append(_AR_MAP.get(cp, ch))
    return "".join(out)


# --- Persian (PersianNormalizer.java) -------------------------------------

_FA_MAP = {0x06CC: "ي", 0x06D2: "ي",   # farsi yeh, yeh barree
           0x06A9: "ك",                      # keheh -> kaf
           0x06C0: "ه", 0x06C1: "ه"}    # heh yeh / heh goal
_FA_DELETE = {0x0654}                             # hamza above


def persian_normalize(token: str) -> str:
    out = []
    for ch in token:
        cp = ord(ch)
        if cp in _FA_DELETE:
            continue
        out.append(_FA_MAP.get(cp, ch))
    return "".join(out)


# --- Hindi (HindiNormalizer.java) -----------------------------------------

_HI_MAP = {
    0x0901: "ं",                                    # candrabindu
    0x0929: "न", 0x0931: "र", 0x0934: "ळ",  # nukta forms
    0x0958: "क", 0x0959: "ख", 0x095A: "ग",
    0x095B: "ज", 0x095C: "ड", 0x095D: "ढ",
    0x095E: "फ", 0x095F: "य",
    0x0945: "े", 0x0946: "े",                  # chandra/short e
    0x0949: "ो", 0x094A: "ो",
    0x090D: "ए", 0x090E: "ए",
    0x0911: "ओ", 0x0912: "ओ",
    0x0972: "अ",
    0x0906: "अ", 0x0908: "इ", 0x090A: "उ",  # long->short ind.
    0x0960: "ऋ", 0x0961: "ऌ", 0x0910: "ए",
    0x0914: "ओ",
    0x0940: "ि", 0x0942: "ु", 0x0944: "ृ",  # long->short dep.
    0x0963: "ॢ", 0x0948: "े", 0x094C: "ो",
}
_HI_DELETE = {0x093C, 0x200D, 0x200C, 0x094D}


def hindi_normalize(token: str) -> str:
    chars = list(token)
    out = []
    i = 0
    n = len(chars)
    while i < n:
        cp = ord(chars[i])
        if cp == 0x0928 and i + 1 < n and ord(chars[i + 1]) == 0x094D:
            out.append("ं")  # dead n -> bindu, consume the virama
            i += 2
            continue
        if cp in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(cp, chars[i]))
        i += 1
    return "".join(out)


# --- Indic (IndicNormalizer.java) -----------------------------------------

_INDIC_FLAGS = {0x0900: 1, 0x0980: 2, 0x0A00: 4, 0x0A80: 8, 0x0B00: 16,
                0x0B80: 32, 0x0C00: 64, 0x0C80: 128, 0x0D00: 256}


@lru_cache(maxsize=1)
def _indic_table() -> list[list[int]]:
    with open(_DATA / "indic_decompositions.json") as f:
        return json.load(f)


def _indic_block(cp: int) -> int | None:
    base = cp & ~0x7F
    return base if base in _INDIC_FLAGS else None


def indic_normalize(token: str) -> str:
    """IndicNormalizer.normalize/compose (IndicNormalizer.java:247-289):
    compose split vowel signs into canonical letters per script."""
    table = _indic_table()
    text = list(token)
    i = 0
    while i < len(text):
        cp = ord(text[i])
        base = _indic_block(cp)
        if base is None:
            i += 1
            continue
        flag = _INDIC_FLAGS[base]
        ch0 = cp - base
        if i + 1 >= len(text):
            break
        cp1 = ord(text[i + 1])
        if _indic_block(cp1) != base:
            i += 1
            continue
        ch1 = cp1 - base
        ch2 = -1
        if i + 2 < len(text):
            cp2 = ord(text[i + 2])
            if cp2 == 0x200D:
                ch2 = 0xFF
            elif _indic_block(cp2) == base:
                ch2 = cp2 - base
        for row in table:
            if row[0] == ch0 and (row[4] & flag):
                if row[1] == ch1 and (row[2] < 0 or row[2] == ch2):
                    text[i] = chr(base + row[3])
                    del text[i + 1]
                    if row[2] >= 0:
                        del text[i + 1]
                    break
        i += 1
    return "".join(text)


# --- Irish lowercase (IrishLowerCaseFilter.java) --------------------------

_GA_UPPER_VOWELS = set("AEIOUÁÉÍÓÚ")


def irish_lowercase(token: str) -> str:
    if (len(token) > 1 and token[0] in ("n", "t")
            and token[1] in _GA_UPPER_VOWELS):
        token = token[0] + "-" + token[1:]
    return token.lower()


# --- KeywordRepeat + LimitTokenPosition -----------------------------------

def keyword_repeat(tokens: list[str], stem_fn) -> list[str]:
    """KeywordRepeatFilter + stemmer + RemoveDuplicates composition:
    each token yields the original AND its stem at the same position
    (original first, as the keyword-flagged copy is emitted first);
    duplicates at a position collapse."""
    out = []
    for t in tokens:
        s = stem_fn(t)
        out.append(t)
        if s != t:
            out.append(s)
    return out


def limit_token_position(tokens: list[str], max_position: int) -> list[str]:
    """LimitTokenPositionFilter (1-based positions, posInc=1 stream)."""
    return tokens[:max_position]
