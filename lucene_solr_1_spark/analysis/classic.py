"""ClassicTokenizer + ClassicFilter (the pre-3.1 StandardAnalyzer
grammar).

Python twin of the reference's classic grammar (ref: lucene/analysis/
common/src/java/org/apache/lucene/analysis/standard/
ClassicTokenizerImpl.jflex:1, ClassicTokenizer.java:147,
ClassicFilter.java:49): recognizes ALPHANUM, APOSTROPHE (o'reilly),
ACRONYM (u.s.a.), COMPANY (at&t, excite@home), EMAIL, HOST, NUM
(alphanumerics joined by _-/., with at least one digit segment) and CJ
single chars; everything else is a delimiter.

jflex picks the LONGEST match across all rules, earliest rule on ties
— emulated by trying every rule alternative at each position and
keeping (max length, min rule index).  ACRONYM_DEP (deprecated
mixed-alphanumeric acronyms like "wbuwb.wb.wbu.") is retyped <HOST>
with the trailing dot dropped, exactly as ClassicTokenizer's
incrementToken does.  ClassicFilter strips a trailing 's from
APOSTROPHE tokens and all dots from ACRONYM tokens.
"""
from __future__ import annotations

import re

__all__ = ["classic_tokenize", "classic_filter", "classic_analyze",
           "CLASSIC_STOPWORDS"]

_CJ = ("㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
       "㌀-㍿㐀-䶿一-鿿豈-﫿"
       "･-ﾟ")
_L = rf"(?:(?![{_CJ}])[^\W\d_])"          # [:letter:] minus CJ
_THAI = "฀-๙"
_AN = rf"(?:{_L}|[{_THAI}]|\d)+"          # ALPHANUM
_ALPHA = rf"{_L}+"
_HD = rf"(?:{_L}|\d)*\d(?:{_L}|\d)*"      # HAS_DIGIT
_P = r"[_\-/.,]"

# (type, alternatives) in the jflex rule order; ACRONYM_DEP last
_RULES: list[tuple[str, list[str]]] = [
    ("<ALPHANUM>", [_AN]),
    ("<APOSTROPHE>", [rf"{_ALPHA}(?:'{_ALPHA})+"]),
    ("<ACRONYM>", [rf"{_L}\.(?:{_L}\.)+"]),
    ("<COMPANY>", [rf"{_ALPHA}[&@]{_ALPHA}"]),
    ("<EMAIL>", [rf"{_AN}(?:[.\-_]{_AN})*@{_AN}(?:[.\-]{_AN})+"]),
    ("<HOST>", [rf"{_AN}(?:\.{_AN})+"]),
    ("<NUM>", [rf"{_AN}{_P}{_HD}(?:{_P}{_AN}{_P}{_HD})+",
               rf"{_HD}{_P}{_AN}(?:{_P}{_HD}{_P}{_AN})+",
               rf"{_AN}(?:{_P}{_HD}{_P}{_AN})+",
               rf"{_HD}(?:{_P}{_AN}{_P}{_HD})+",
               rf"{_AN}{_P}{_HD}",
               rf"{_HD}{_P}{_AN}"]),
    ("<CJ>", [rf"[{_CJ}]"]),
    ("<ACRONYM_DEP>", [rf"{_AN}\.(?:{_AN}\.)+"]),
]
_COMPILED = [(i, typ, re.compile(alt))
             for i, (typ, alts) in enumerate(_RULES)
             for alt in alts]

CLASSIC_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on "
    "or such that the their then there these they this to was will "
    "with".split())


def classic_tokenize(text: str, max_token_length: int = 255,
                     with_types: bool = False):
    """Token list (or (token, type) pairs) per the classic grammar."""
    out = []
    pos, n = 0, len(text)
    while pos < n:
        best_len, best_rule, best_typ = 0, len(_COMPILED), None
        for idx, typ, pat in _COMPILED:
            m = pat.match(text, pos)
            if m:
                ln = m.end() - pos
                if ln > best_len or (ln == best_len and idx < best_rule):
                    best_len, best_rule, best_typ = ln, idx, typ
        if best_len == 0:
            pos += 1
            continue
        tok = text[pos:pos + best_len]
        pos += best_len
        if len(tok) > max_token_length:
            continue
        if best_typ == "<ACRONYM_DEP>":
            tok, best_typ = tok[:-1], "<HOST>"
        out.append((tok, best_typ) if with_types else tok)
    return out


def classic_filter(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """ClassicFilter: drop 's from <APOSTROPHE>, dots from <ACRONYM>."""
    out = []
    for tok, typ in pairs:
        if (typ == "<APOSTROPHE>" and len(tok) >= 2
                and tok[-2] == "'" and tok[-1] in "sS"):
            tok = tok[:-2]
        elif typ == "<ACRONYM>":
            tok = tok.replace(".", "")
        out.append((tok, typ))
    return out


def classic_analyze(text: str, stopwords: frozenset = CLASSIC_STOPWORDS,
                    max_token_length: int = 255) -> list[str]:
    """ClassicAnalyzer chain (ClassicAnalyzer.java:55): ClassicTokenizer
    -> ClassicFilter -> LowerCase -> Stop."""
    pairs = classic_filter(
        classic_tokenize(text, max_token_length, with_types=True))
    return [t.lower() for t, _ in pairs if t.lower() not in stopwords]
