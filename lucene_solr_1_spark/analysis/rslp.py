"""RSLP rule-table stemming: Portuguese (Orengo) + Galician.

Analog of the reference's RSLP family (SURVEY.md §2.B):

  * ``PortugueseStemFilter`` — full RSLP, ref:
    lucene/analysis/common/src/java/org/apache/lucene/analysis/pt/
    PortugueseStemmer.java:28 (step order Plural -> Adverb -> Feminine
    -> Augmentative -> Noun / Verb / Vowel, then accent removal).
  * ``PortugueseMinimalStemFilter`` — RSLP-S, the Plural step only
    (pt/PortugueseMinimalStemmer.java:31).
  * ``GalicianStemFilter`` — "Regras do lematizador para o galego",
    ref: gl/GalicianStemmer.java:30 (Plural -> Unification -> Adverb ->
    Augmentative-to-fixpoint -> Noun / Verb -> Vowel, accent removal).
  * ``GalicianMinimalStemFilter`` — Plural step only
    (gl/GalicianMinimalStemmer.java:30).

The engine implements the semantics of RSLPStemmerBase.java:90-246
from the published algorithm description (Orengo & Huyck, SPIRE 2001):
a *step* is an ordered rule list entered only if the word is long
enough and ends with one of the step's entry suffixes; the FIRST
matching rule fires (longest listed first in the table itself) and the
step exits.  A *rule* removes its suffix when the remaining stem has at
least ``min`` chars and the word is not in the rule's exception list
(whole-word or ends-with, per step flag), then appends an optional
replacement.

The rule TABLES are data — regenerated from the reference's published
text resources by tools/gen_rslp_rules.py (provenance documented
there), shipped as analysis/data/rslp_rules.json.gz.

Scale: token -> token pure functions; production path is the same
vocabulary trick as every other stemmer (stem_vocab -> broadcast map),
so cost is O(|vocab|), never per-row Python.

Validation: 0 mismatches against the reference's own test
vocabularies — ptrslptestdata.zip / ptminimaltestdata.zip (32,016
pairs each) and gltestdata.zip (9,416 pairs); tests/test_rslp.py.
"""

from __future__ import annotations

import gzip
import json
import os

_DATA = os.path.join(os.path.dirname(__file__), "data", "rslp_rules.json.gz")

with gzip.open(_DATA, "rt", encoding="utf-8") as _f:
    _RAW = json.load(_f)


def _compile(steps: dict) -> dict:
    out = {}
    for name, st in steps.items():
        rules = []
        for suffix, minstem, repl, exc in st["rules"]:
            rules.append((suffix, minstem, repl,
                          frozenset(exc) if st["whole_word_exceptions"]
                          else tuple(exc)))
        out[name] = {"min": st["min"], "whole": st["whole_word_exceptions"],
                     "conds": tuple(st["conds"]), "rules": rules}
    return out


_STEPS = {lang: _compile(steps) for lang, steps in _RAW.items()}


def _apply_step(word: str, step: dict) -> str:
    if len(word) < step["min"]:
        return word
    conds = step["conds"]
    if conds and not word.endswith(conds):
        return word
    whole = step["whole"]
    for suffix, minstem, repl, exc in step["rules"]:
        if word.endswith(suffix) and len(word) - len(suffix) >= minstem:
            if whole:
                if word in exc:
                    continue
            elif exc and word.endswith(exc):
                continue
            return word[:len(word) - len(suffix)] + repl
    return word


_PT_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
    "aaaaaaceeeeiiiinooooouuuuyy")
_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


def portuguese_rslp_stem(token: str) -> str:
    """Full RSLP (PortugueseStemmer.java:46-76 step order)."""
    s = _STEPS["pt"]
    w = _apply_step(token, s["Plural"])
    w = _apply_step(w, s["Adverb"])
    w = _apply_step(w, s["Feminine"])
    w = _apply_step(w, s["Augmentative"])
    w2 = _apply_step(w, s["Noun"])
    if w2 == w:                      # noun suffix not removed
        w2 = _apply_step(w, s["Verb"])
        if w2 == w:                  # verb suffix not removed
            w2 = _apply_step(w, s["Vowel"])
    return w2.translate(_PT_ACCENTS)


def portuguese_minimal_stem(token: str) -> str:
    """RSLP-S: the Plural step only (PortugueseMinimalStemmer.java:35)."""
    return _apply_step(token, _STEPS["pt"]["Plural"])


def galician_stem(token: str) -> str:
    """Full Galician RSLP (GalicianStemmer.java:46-73 step order)."""
    s = _STEPS["gl"]
    w = _apply_step(token, s["Plural"])
    w = _apply_step(w, s["Unification"])
    w = _apply_step(w, s["Adverb"])
    while True:                      # augmentative to fixpoint
        w2 = _apply_step(w, s["Augmentative"])
        if w2 == w:
            break
        w = w2
    w2 = _apply_step(w, s["Noun"])
    if w2 == w:
        w2 = _apply_step(w, s["Verb"])
    w = _apply_step(w2, s["Vowel"])
    return w.translate(_GL_ACCENTS)


def galician_minimal_stem(token: str) -> str:
    """Plural step only (GalicianMinimalStemmer.java:34)."""
    return _apply_step(token, _STEPS["gl"]["Plural"])
