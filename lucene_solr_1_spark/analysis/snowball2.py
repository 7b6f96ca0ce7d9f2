"""Contributed Snowball stemmers: Armenian, Basque, Catalan, Irish.

Completes the reference's 23-language tartarus set (ref:
lucene/analysis/common/src/java/org/tartarus/snowball/ext/ — the other
19 live in analysis/snowball.py, analysis/kstem.py).  These four are
"contributed" Snowball algorithms: uniform among-programs (longest
suffix/prefix match -> region-gated delete/replace), so instead of the
per-language hand-expansion used for the core languages they run on a
small shared engine with the linguists' rule TABLES held as data
(analysis/_snowball_contrib_tables.py, regenerated from the reference's
generated Java by tools/gen_snowball_contrib.py).

Semantics implemented from the published Snowball framework
(snowballstem.org; SnowballProgram.java:1 for cursor/limit discipline):

* ``find_among_b``: longest table suffix ending at the current end
  whose start lies inside the backward search window.
* gates ``R1/R2/RV``: the match START must sit at/after the mark.
* backward slices move the working end to the match start (Snowball
  leaves ``cursor = bra``), so repeat() loops (Basque) continue matching
  at the cut point and never re-scan replacement text.
* region marks are positions in the pre-suffix-stripping word; suffix
  slices never touch positions before ``bra`` so they stay valid.

Validated 0-mismatch against the reference's own generated stemmers
(compiled and run via tools/gen_snowball_contrib_vocab.py) over fuzz
vocabularies that exercise every among entry.
"""
from __future__ import annotations

from functools import lru_cache

from ._snowball_contrib_tables import DATA

__all__ = ["armenian_stem", "basque_stem", "catalan_stem", "irish_stem"]


@lru_cache(maxsize=None)
def _by_len(lang: str, table: str) -> tuple:
    """Table entries grouped by suffix length, longest first."""
    entries = DATA[lang]["tables"][table]
    buckets: dict[int, dict[str, int]] = {}
    for s, var in entries:
        buckets.setdefault(len(s), {})[s] = var
    return tuple(sorted(buckets.items(), reverse=True))


def _match_b(w: str, end: int, lb: int, lang: str, table: str):
    """Longest suffix of w[:end] from the table with start >= lb."""
    for ln, bucket in _by_len(lang, table):
        if ln > end - lb:
            continue
        var = bucket.get(w[end - ln:end])
        if var is not None:
            return end - ln, var
    return None


def _match_f(w: str, pos: int, lang: str, table: str):
    """Longest table prefix at pos (empty entries match anywhere)."""
    for ln, bucket in _by_len(lang, table):
        if pos + ln > len(w):
            continue
        var = bucket.get(w[pos:pos + ln])
        if var is not None:
            return pos + ln, var
    return None


def _gate_ok(gate, start: int, marks: dict) -> bool:
    return gate is None or start >= marks[gate]


def _apply_b(w: str, end: int, lb: int, lang: str, rname: str,
             marks: dict):
    """One backward routine: (new_word, new_end) or None on failure."""
    r = DATA[lang]["routines"][rname]
    m = _match_b(w, end, lb, lang, r["table"])
    if m is None:
        return None
    start, var = m
    if not _gate_ok(r["pre_gate"], start, marks):
        return None
    gate, (kind, repl) = r["cases"][var]
    if not _gate_ok(gate, start, marks):
        return None
    if kind == "del":
        return w[:start] + w[end:], start
    return w[:start] + repl + w[end:], start   # "from"


def _std_p1_p2(w: str, v: frozenset) -> tuple[int, int]:
    """Standard R1/R2 marks: after the first (second) vowel-then-
    non-vowel sequence (gopast pairs in the generated mark_regions)."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in v:
        i += 1
    while i < n and w[i] in v:
        i += 1
    if i < n:
        p1 = i + 1
        j = i + 1
        while j < n and w[j] not in v:
            j += 1
        while j < n and w[j] in v:
            j += 1
        if j < n:
            p2 = j + 1
    return p1, p2


# ------------------------------------------------------------ Armenian

def armenian_stem(word: str) -> str:
    """Snowball Armenian (ref: tartarus/ext/ArmenianStemmer.java:13).

    Marks: pV = after the first vowel; p2 = after the second
    vowel..non-vowel run past pV.  Backward window floored at pV
    (setlimit tomark pV), then one pass each of ending (R2-gated),
    verb, adjective, noun — all plain longest-suffix deletes.
    """
    w = word
    v = frozenset(DATA["armenian"]["groups"]["g_v"])
    n = len(w)
    pv = p2 = n
    i = 0
    while i < n and w[i] not in v:
        i += 1
    if i < n:
        pv = i + 1
        j = pv
        while j < n and w[j] in v:
            j += 1
        # past the non-vowel run, past the next vowel, past the next
        # non-vowel (gopast x4 in r_mark_regions)
        while j < n and w[j] not in v:
            j += 1
        while j < n and w[j] in v:
            j += 1
        if j < n:
            p2 = j + 1
    marks = {"R2": p2}
    end = len(w)
    for rname in ("r_ending", "r_verb", "r_adjective", "r_noun"):
        res = _apply_b(w, end, pv, "armenian", rname, marks)
        if res is not None:
            w, end = res
    return w


# -------------------------------------------------------------- Basque

def basque_stem(word: str) -> str:
    """Snowball Basque (ref: tartarus/ext/BasqueStemmer.java:13).

    Romance RV/R1/R2 marks, then repeat(aditzak) -> repeat(izenak) ->
    adjetiboak, the working end following each cut point (repeat does
    not reset the cursor between routines).
    """
    from .snowball import _es_regions_generic
    w = word
    v = set(DATA["basque"]["groups"]["g_v"])
    rv, p1, p2 = _es_regions_generic(w, v)
    marks = {"RV": rv, "R1": p1, "R2": p2}
    end = len(w)
    for rname in ("r_aditzak", "r_izenak"):
        while True:
            res = _apply_b(w, end, 0, "basque", rname, marks)
            if res is None:
                break
            w, end = res
    res = _apply_b(w, end, 0, "basque", "r_adjetiboak", marks)
    if res is not None:
        w, end = res
    return w


# ------------------------------------------------------------- Catalan

def catalan_stem(word: str) -> str:
    """Snowball Catalan (ref: tartarus/ext/CatalanStemmer.java:13).

    R1/R2 marks, then attached_pronoun -> (standard_suffix or
    verb_suffix) -> residual_suffix backward (each starting at the
    current word end), then a forward cleaning scan that folds accented
    vowels and the middle dot.
    """
    w = word
    v = frozenset(DATA["catalan"]["groups"]["g_v"])
    marks = dict(zip(("R1", "R2"), _std_p1_p2(w, v)))
    for step in (("r_attached_pronoun",),
                 ("r_standard_suffix", "r_verb_suffix"),
                 ("r_residual_suffix",)):
        for rname in step:                      # 'or': first success wins
            res = _apply_b(w, len(w), 0, "catalan", rname, marks)
            if res is not None:
                w = res[0]
                break
    # cleaning: repeat( [substring] among(accented -> plain | '' next) )
    r = DATA["catalan"]["routines"]["r_cleaning"]
    out, pos = [], 0
    while pos < len(w):
        ket, var = _match_f(w, pos, "catalan", r["table"])
        _, (kind, repl) = r["cases"][var]
        if kind == "next":
            out.append(w[pos])
            pos += 1
        else:
            out.append(repl)
            pos = ket
    return "".join(out)


# --------------------------------------------------------------- Irish

def irish_stem(word: str) -> str:
    """Snowball Irish (ref: tartarus/ext/IrishStemmer.java:13).

    initial_morph strips/normalizes initial mutations (prefix among at
    position 0) BEFORE regions are marked; pV = after the first vowel,
    R1/R2 standard; then noun_sfx -> deriv -> verb_sfx backward.
    """
    w = word
    pre = DATA["irish"]["routines"]["r_initial_morph"]
    m = _match_f(w, 0, "irish", pre["table"])
    if m is not None:
        ket, var = m
        _, (kind, repl) = pre["cases"][var]
        w = (repl if kind == "from" else "") + w[ket:]
    v = frozenset(DATA["irish"]["groups"]["g_v"])
    n = len(w)
    pv = n
    i = 0
    while i < n and w[i] not in v:
        i += 1
    if i < n:
        pv = i + 1
    p1, p2 = _std_p1_p2(w, v)
    marks = {"RV": pv, "R1": p1, "R2": p2}
    for rname in ("r_noun_sfx", "r_deriv", "r_verb_sfx"):
        res = _apply_b(w, len(w), 0, "irish", rname, marks)
        if res is not None:
            w = res[0]
    return w
