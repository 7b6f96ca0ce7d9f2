"""Beider-Morse Phonetic Matching (BMPM) encoder.

Python twin of the engine behind the reference's BeiderMorseFilter
(ref: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/BeiderMorseFilter.java:1, which delegates to Apache
commons-codec's org.apache.commons.codec.language.bm.PhoneticEngine).
Implements the published BMPM algorithm (Beider & Morse, "Phonetic
Matching: A Better Soundex", AVOTAYNU XXIV/1 2008) with the
commons-codec rule tables extracted as data
(analysis/data/bm_rules.json.gz, tools/gen_bm_rules.py):

1. guess the candidate language set from spelling (regex accept/deny
   rules over the whole name),
2. transliterate to a phoneme lattice with the language-specific rule
   file (longest-file-order rule whose pattern + left/right contexts
   match; each rule may fan a phoneme out into language-restricted
   alternatives, capped at ``max_phonemes``),
3. normalize with the common + language-specific final rules
   (approx or exact flavor), merging alternatives that collapse to the
   same text (language-set union, text-sorted output).

Context patterns use the engine's restricted-regex fast paths
(left context is end-anchored, right context start-anchored) with a
real-regex fallback, mirroring Rule.pattern's contract.

Oracle-validated against commons-codec's own PhoneticEngine (on the
Spark classpath) — see tests/test_beidermorse.py.
"""
from __future__ import annotations

import gzip
import json
import os
import re
from functools import lru_cache

__all__ = ["bm_encode", "bm_phonemes"]

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data",
                          "bm_rules.json.gz")

MAX_PHONEMES = 20

# PhoneticEngine.NAME_PREFIXES (order only matters for 'de la' vs 'de';
# commons-codec iterates a HashSet — matched against the oracle)
_NAME_PREFIXES = {
    "gen": ["dela", "dal", "del", "des", "di", "do", "dos", "du", "da",
            "de", "de la", "van", "von", "della"],
    "ash": ["bar", "ben", "da", "de", "van", "von"],
    "sep": ["al", "el", "da", "dal", "de", "del", "dela", "de la",
            "della", "des", "di", "do", "dos", "du", "van", "von"],
}

# language set: None = ANY, frozenset = specific (empty = dead branch)


def _restrict(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def _merge(a, b):
    """LanguageSet.merge — deliberately ASYMMETRIC, matching
    commons-codec (verified against the bytecode): ANY.merge(x) returns
    x (the ANY side is forgotten), SomeLanguages.merge(ANY) returns
    ANY, empty merges to the other side, else set union.  The
    asymmetry is observable: a final-rules text collision between an
    unrestricted branch and a language-tagged one inherits the TAGGED
    set, which then kills later language-gated alternatives."""
    if a is None:
        return b
    if b is None:
        return None
    if not b:
        return a
    if not a:
        return b
    return a | b


@lru_cache(maxsize=1)
def _data():
    with gzip.open(_DATA_PATH, "rt", encoding="utf-8") as f:
        return json.load(f)


def _compile_context(raw: str, left: bool):
    """Rule.pattern with the constructor's anchoring: the left context
    gets '$' appended (must match at the end of the prefix), the right
    context '^' prepended (must match at the start of the suffix)."""
    regex = (raw + "$") if left else ("^" + raw)
    starts = regex.startswith("^")
    ends = regex.endswith("$")
    content = regex[1 if starts else 0: len(regex) - 1 if ends else
                    len(regex)]
    if "[" not in content:
        if starts and ends:
            if not content:
                return lambda s: len(s) == 0
            return lambda s, c=content: s == c
        if (starts or ends) and not content:
            return lambda s: True
        if starts:
            return lambda s, c=content: s.startswith(c)
        if ends:
            return lambda s, c=content: s.endswith(c)
    elif content.startswith("[") and content.endswith("]"):
        box = content[1:-1]
        if "[" not in box:
            want = not box.startswith("^")
            if not want:
                box = box[1:]
            if starts and ends:
                return (lambda s, b=box, w=want:
                        len(s) == 1 and (s[0] in b) == w)
            if starts:
                return (lambda s, b=box, w=want:
                        len(s) > 0 and (s[0] in b) == w)
            if ends:
                return (lambda s, b=box, w=want:
                        len(s) > 0 and (s[-1] in b) == w)
    pat = re.compile(regex)
    return lambda s, p=pat: p.search(s) is not None


def _parse_phoneme(ph: str):
    open_ = ph.find("[")
    if open_ >= 0:
        if not ph.endswith("]"):
            raise ValueError(f"phoneme {ph!r}: unclosed language set")
        return (ph[:open_], frozenset(ph[open_ + 1:-1].split("+")))
    return (ph, None)


def _parse_phoneme_expr(ph: str):
    """'(a|b[lang]|)' -> alternatives; Java split drops trailing empty
    fields, then a leading/trailing '|' adds one empty alternative."""
    if ph.startswith("("):
        if not ph.endswith(")"):
            raise ValueError(f"phoneme expr {ph!r}: unclosed paren")
        body = ph[1:-1]
        # Java's split drops TRAILING empty fields only: a leading '|'
        # yields one empty alternative via the kept "" field; a trailing
        # '|' yields one via the explicit add below (never both).
        parts = body.split("|")
        while parts and parts[-1] == "":
            parts.pop()
        out = [_parse_phoneme(p) for p in parts]
        if parts and body.endswith("|"):
            out.append(("", None))
        return out
    return [_parse_phoneme(ph)]


@lru_cache(maxsize=None)
def _rule_map(nt: str, rt: str, lang: str):
    """First-char -> rules in file order, contexts compiled."""
    lines = _data()["rules"][nt][rt].get(lang)
    if lines is None:
        lines = []
    by_first: dict[str, list] = {}
    for pattern, lctx, rctx, phexpr in lines:
        rule = (pattern, _compile_context(lctx, True),
                _compile_context(rctx, False), _parse_phoneme_expr(phexpr))
        by_first.setdefault(pattern[:1], []).append(rule)
    return by_first


@lru_cache(maxsize=None)
def _lang_rules(nt: str):
    return [(re.compile(pat), frozenset(langs), accept)
            for pat, langs, accept in _data()["lang_rules"][nt]]


def _guess_languages(nt: str, text: str):
    langs = set(_data()["languages"][nt])
    t = text.lower()
    for pat, rl, accept in _lang_rules(nt):
        if pat.search(t):
            if accept:
                langs &= rl
            else:
                langs -= rl
    return frozenset(langs) if langs else None


def _apply_expr(phonemes, expr, max_phonemes):
    """PhonemeBuilder.apply: cross every current phoneme with every
    expression alternative, dropping language-incompatible joins,
    stopping dead at the cap."""
    out = []
    for text, langs in phonemes:
        for rtext, rlangs in expr:
            merged = _restrict(langs, rlangs)
            if merged is None or merged:
                if len(out) < max_phonemes:
                    out.append((text + rtext, merged))
                    if len(out) >= max_phonemes:
                        return out
    return out


def _rules_pass(input_: str, rules, phonemes, append_unmatched,
                max_phonemes):
    """One left-to-right scan: at each position take the first rule (file
    order) whose pattern + contexts match; advance by its length, else
    one char (optionally appending the literal char — final-rules
    behavior)."""
    i = 0
    n = len(input_)
    while i < n:
        found = False
        plen = 1
        for pattern, lctx, rctx, expr in rules.get(input_[i], ()):
            plen = len(pattern)
            if (input_.startswith(pattern, i) and rctx(input_[i + plen:])
                    and lctx(input_[:i])):
                phonemes = _apply_expr(phonemes, expr, max_phonemes)
                found = True
                break
        if not found:
            plen = 1
            if append_unmatched:
                ch = input_[i]
                phonemes = [(t + ch, ls) for t, ls in phonemes]
        i += plen
    return phonemes


def _apply_final_rules(phonemes, rules, max_phonemes):
    """Re-encode each phoneme's text through the final-rule set, then
    merge alternatives with identical text (language union), ordered by
    text (Phoneme.COMPARATOR)."""
    if not rules:
        return phonemes
    merged: dict[str, object] = {}
    for text, langs in phonemes:
        sub = _rules_pass(text, rules, [("", langs)], True, max_phonemes)
        for t, ls in sub:
            if t in merged:
                merged[t] = _merge(merged[t], ls)
            else:
                merged[t] = ls
    return [(t, merged[t]) for t in sorted(merged)]


_NT_FULL = {"generic": "gen", "ashkenazi": "ash", "sephardic": "sep"}


def bm_encode(input_: str, name_type: str = "gen",
              rule_type: str = "approx", concat: bool = True,
              max_phonemes: int = MAX_PHONEMES,
              languages: frozenset | None = None) -> str:
    """PhoneticEngine.encode: '|'-joined phoneme alternatives; name
    prefixes fan out into '(without)-(attached)' variants.  `languages`
    forces the origin-language set (BeiderMorseFilter's optional
    LanguageSet); prefix recursion re-guesses, as the engine's
    single-arg self-calls do."""
    nt = _NT_FULL.get(name_type, name_type)
    if rule_type not in ("approx", "exact"):
        raise ValueError(f"rule_type {rule_type!r}: use approx/exact")
    lang_set = (languages if languages is not None
                else _guess_languages(nt, input_))
    lang_key = (next(iter(lang_set)) if lang_set is not None
                and len(lang_set) == 1 else "any")
    rules = _rule_map(nt, "rules", lang_key)
    final1 = _rule_map(nt, rule_type, "common")
    final2 = _rule_map(nt, rule_type, lang_key)

    input_ = input_.lower().replace("-", " ").strip()

    if nt == "gen":
        if input_.startswith("d'"):
            rem = input_[2:]
            return (f"({bm_encode(rem, nt, rule_type, concat, max_phonemes)})"
                    f"-({bm_encode('d' + rem, nt, rule_type, concat, max_phonemes)})")
        for pfx in _NAME_PREFIXES[nt]:
            if input_.startswith(pfx + " "):
                rem = input_[len(pfx) + 1:]
                return (f"({bm_encode(rem, nt, rule_type, concat, max_phonemes)})"
                        f"-({bm_encode(pfx + rem, nt, rule_type, concat, max_phonemes)})")

    words = input_.split()
    if nt == "sep":
        words2 = [w.split("'")[-1] for w in words]
        words2 = [w for w in words2 if w not in _NAME_PREFIXES["sep"]]
    elif nt == "ash":
        words2 = [w for w in words if w not in _NAME_PREFIXES["ash"]]
    else:
        words2 = words
    if concat:
        input_ = " ".join(words2)
    elif len(words2) == 1:
        input_ = words[0]
    else:
        return "-".join(bm_encode(w, nt, rule_type, concat, max_phonemes)
                        for w in words2)

    phonemes = _rules_pass(input_, rules, [("", lang_set)], False,
                           max_phonemes)
    phonemes = _apply_final_rules(phonemes, final1, max_phonemes)
    phonemes = _apply_final_rules(phonemes, final2, max_phonemes)
    return "|".join(t for t, _ in phonemes)


def bm_phonemes(input_: str, name_type: str = "gen",
                rule_type: str = "approx", concat: bool = True,
                max_phonemes: int = MAX_PHONEMES,
                languages: frozenset | None = None) -> list[str]:
    """The filter-facing view: phoneme tokens in encounter order,
    duplicates preserved (BeiderMorseFilter.java:44 emits every
    ``[^()|-]+`` run of the encoding — first run replaces the input
    token, the rest stack at position increment 0)."""
    enc = bm_encode(input_, name_type, rule_type, concat, max_phonemes,
                    languages)
    return re.findall(r"[^()|\-]+", enc)
