"""ICUTransformFilter twin: a from-scratch transliteration engine.

Mirrors lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUTransformFilter.java, whose work is delegated to ICU's
``Transliterator``.  Implemented here from the published ICU
transform-rule syntax and runtime contract (ICU User Guide,
"Transforms / General"):

  * ``Transliterator.createFromRules``: conversion rules
    ``pre } key | post > replacement ;`` (contexts optional, ``{`` /
    ``}`` delimit ante/post context, ``|`` in the replacement sets
    the resume cursor), variables ``$name = ...;``, UnicodeSets via
    the shared parser in analysis/rbbi.py / uniprops.py, quoted
    literals and escapes.  The runtime scans left-to-right; at each
    position the FIRST matching rule fires, its replacement is
    spliced in, and the cursor resumes after the replacement (or at
    the ``|`` mark) — output text IS visible to later pre-contexts
    but is not itself re-keyed unless the cursor is moved back, which
    reproduces ICU's ``a > b; b > c;`` -> "abacadaba" = "bcbcbdbcb".
  * ``Transliterator.getInstance``: compound IDs ``A; B; C`` with
    optional per-segment UnicodeSet filters (``[:Mn:] Remove``).
    The system transforms provided are the ALGORITHMIC ones
    derivable from the UCD: NFC/NFD/NFKC/NFKD, CaseFold/Lower/Upper,
    Katakana-Hiragana / Hiragana-Katakana (codepoint offset over the
    shared kana block, long-vowel and iteration marks carried),
    Fullwidth-Halfwidth / Halfwidth-Fullwidth (<wide>/<narrow>
    compatibility decompositions, NFD-split voiced kana), Remove,
    Null, Any-Upper/Lower aliases.  Table-driven transforms
    (Traditional-Simplified, Any-Latin, Han-Latin) need CLDR
    transform-rule data that is not in the reference snapshot; their
    IDs raise with a clear message but compile fine when the caller
    registers rule text for them (register_rules), keeping the
    engine data-pluggable like analysis/morfologik.py.
  * ``source_set()``: the affected-character set the reference's
    ICUTransformFilter constructor computes to skip untouched tokens
    (ICUTransformFilter.java:70-85 optimizer, asserted by
    TestICUTransformFilter.testOptimizer/testOptimizerSurrogate).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from . import rbbi
from . import uniprops as up


# ---------------------------------------------------------------------------
# rule parsing
# ---------------------------------------------------------------------------

class _Rule:
    __slots__ = ("pre", "key", "post", "repl", "cursor")

    def __init__(self, pre, key, post, repl, cursor):
        self.pre = pre        # list of matchers (applied backwards)
        self.key = key        # list of matchers
        self.post = post      # list of matchers
        self.repl = repl      # list of code points
        self.cursor = cursor  # resume offset into repl, or None


def _strip_comments(text: str) -> str:
    out = []
    for line in text.splitlines():
        j = line.find("#")
        out.append(line if j < 0 else line[:j])
    return "\n".join(out)


class _RuleScanner(rbbi._Scanner):
    pass


def _parse_atoms(sc: _RuleScanner, stop: str) -> tuple[list, int | None]:
    """Parse a sequence of matcher atoms until a char in `stop`.
    Each atom is a frozenset-free matcher: ('cp', int) or
    ('set', ranges).  Returns (atoms, cursor_index or None)."""
    atoms: list = []
    cursor = None
    while True:
        sc.skip_ws()
        c = sc.peek()
        if c == "" or c in stop:
            return atoms, cursor
        if c == "|":
            cursor = len(atoms)
            sc.i += 1
            continue
        if c == "'":
            j = sc.s.index("'", sc.i + 1)
            lit = sc.s[sc.i + 1:j]
            sc.i = j + 1
            if not lit:  # '' = a literal quote
                atoms.append(("cp", ord("'")))
            else:
                atoms.extend(("cp", ord(ch)) for ch in lit)
            continue
        if c == "\\":
            nxt = sc.s[sc.i + 1]
            if nxt in "pP":
                atoms.append(("set", rbbi.parse_set(sc)))
            else:
                sc.i += 1
                atoms.append(("cp", rbbi._parse_escape(sc)))
            continue
        if c == "[":
            atoms.append(("set", rbbi.parse_set(sc)))
            continue
        if c == "$":
            name = rbbi._read_var_name(sc)
            val = sc.vars[name]
            atoms.extend(val)
            continue
        if c == ".":
            sc.i += 1
            atoms.append(("set", ((0, up.MAX_CP),)))
            continue
        atoms.append(("cp", ord(c)))
        sc.i += len(c)


def parse_rules(text: str) -> list[_Rule]:
    text = _strip_comments(text)
    variables: dict = {}
    sc = _RuleScanner(text, variables)
    rules: list[_Rule] = []
    while True:
        sc.skip_ws()
        if sc.i >= len(sc.s):
            return rules
        if sc.s.startswith("::", sc.i):
            raise ValueError(
                "compound ::ID lines are handled by get_instance(), "
                "not createFromRules twin")
        if sc.peek() == "$":
            save = sc.i
            name = rbbi._read_var_name(sc)
            sc.skip_ws()
            if sc.peek() == "=":
                sc.i += 1
                atoms, _ = _parse_atoms(sc, ";")
                if sc.peek() != ";":
                    raise sc.error("expected ; after variable")
                sc.i += 1
                variables[name] = atoms
                continue
            sc.i = save
        # rule: [pre {] key [} post] > repl ;
        first, _ = _parse_atoms(sc, "{}>;")
        pre: list = []
        post: list = []
        if sc.peek() == "{":
            sc.i += 1
            pre = first
            first, _ = _parse_atoms(sc, "}>;")
        key = first
        if sc.peek() == "}":
            sc.i += 1
            post, _ = _parse_atoms(sc, ">;")
        if sc.peek() != ">":
            raise sc.error("expected > in rule")
        sc.i += 1
        repl_atoms, cursor = _parse_atoms(sc, ";")
        if sc.peek() != ";":
            raise sc.error("expected ; after rule")
        sc.i += 1
        repl = []
        for kind, v in repl_atoms:
            if kind != "cp":
                raise ValueError("sets are not valid in replacements")
            repl.append(v)
        rules.append(_Rule(pre, key, post, repl, cursor))


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def _match_atom(atom, cp: int) -> bool:
    kind, v = atom
    return cp == v if kind == "cp" else up.contains(v, cp)


class RuleTransliterator:
    """createFromRules twin: ordered conversion rules over code points."""

    def __init__(self, rules: list[_Rule]):
        self.rules = rules

    def source_set(self) -> tuple:
        """Union of the rule KEY first-atoms — the characters that can
        trigger a change (the getSourceSet the reference's filter uses
        to build its skip filter)."""
        acc: list = []
        for r in self.rules:
            for atom in r.key:
                kind, v = atom
                acc = up.union(acc, [(v, v)] if kind == "cp" else list(v))
        return tuple(acc)

    def transliterate(self, text: str) -> str:
        cps = [ord(c) for c in text]
        i = 0
        while i < len(cps):
            fired = False
            for r in self.rules:
                k = len(r.key)
                if i + k > len(cps):
                    continue
                if not all(_match_atom(a, cps[i + j])
                           for j, a in enumerate(r.key)):
                    continue
                # ante context against already-produced text
                if len(r.pre) > i:
                    continue
                if not all(_match_atom(a, cps[i - len(r.pre) + j])
                           for j, a in enumerate(r.pre)):
                    continue
                if i + k + len(r.post) > len(cps):
                    continue
                if not all(_match_atom(a, cps[i + k + j])
                           for j, a in enumerate(r.post)):
                    continue
                cps[i:i + k] = r.repl
                i += len(r.repl) if r.cursor is None else r.cursor
                fired = True
                break
            if not fired:
                i += 1
        return "".join(map(chr, cps))


class FunctionTransliterator:
    """A system transform backed by a plain string function."""

    def __init__(self, fn, source=None):
        self.fn = fn
        self._source = source

    def source_set(self):
        return self._source  # None = unknown/all

    def transliterate(self, text: str) -> str:
        return self.fn(text)


class FilteredTransliterator:
    """Per-segment UnicodeSet filter: only runs of filtered-in chars
    are passed to the wrapped transform."""

    def __init__(self, flt: tuple, inner):
        self.flt = flt
        self.inner = inner

    def source_set(self):
        s = self.inner.source_set()
        return None if s is None else tuple(
            up.intersect(list(s), list(self.flt)))

    def transliterate(self, text: str) -> str:
        out = []
        run: list[str] = []
        for ch in text:
            if up.contains(self.flt, ord(ch)):
                run.append(ch)
            else:
                if run:
                    out.append(self.inner.transliterate("".join(run)))
                    run = []
                out.append(ch)
        if run:
            out.append(self.inner.transliterate("".join(run)))
        return "".join(out)


class CompoundTransliterator:
    def __init__(self, parts: list):
        self.parts = parts

    def source_set(self):
        acc: list = []
        for p in self.parts:
            s = p.source_set()
            if s is None:
                return None
            acc = up.union(acc, list(s))
        return tuple(acc)

    def transliterate(self, text: str) -> str:
        for p in self.parts:
            text = p.transliterate(text)
        return text


# --- algorithmic system transforms ---

def _kata_to_hira(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        # katakana small A..VU and KA..KE extensions map by -0x60
        if 0x30A1 <= cp <= 0x30F6 or cp in (0x30FD, 0x30FE):
            out.append(chr(cp - 0x60))
        else:
            out.append(ch)
    return "".join(out)


def _hira_to_kata(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if 0x3041 <= cp <= 0x3096 or cp in (0x309D, 0x309E):
            out.append(chr(cp + 0x60))
        else:
            out.append(ch)
    return "".join(out)


@lru_cache(maxsize=1)
def _narrow_reverse() -> dict:
    """full form -> halfwidth char, from <narrow> decompositions."""
    rev = {}
    for cp in range(0xFF61, 0xFFEF):
        d = unicodedata.decomposition(chr(cp))
        if d.startswith("<narrow> "):
            full = int(d.split()[1], 16)
            rev[full] = cp
    return rev


def _fullwidth_to_halfwidth(text: str) -> str:
    rev = _narrow_reverse()
    out = []
    for ch in unicodedata.normalize("NFD", text):
        cp = ord(ch)
        d = unicodedata.decomposition(ch)
        if d.startswith("<wide> "):            # fullwidth ASCII etc.
            out.append(chr(int(d.split()[1], 16)))
        elif cp in rev:                        # kana/hangul to halfwidth
            out.append(chr(rev[cp]))
        elif cp == 0x3099:                     # combining voiced marks
            out.append("ﾞ")
        elif cp == 0x309A:
            out.append("ﾟ")
        else:
            out.append(ch)
    return "".join(out)


def _halfwidth_to_fullwidth(text: str) -> str:
    out = []
    for ch in text:
        d = unicodedata.decomposition(ch)
        if d.startswith("<narrow> "):
            out.append(chr(int(d.split()[1], 16)))
        elif d.startswith("<wide> "):
            out.append(ch)
        elif 0x21 <= ord(ch) <= 0x7E:
            out.append(chr(ord(ch) + 0xFEE0))
        else:
            out.append(ch)
    return unicodedata.normalize("NFC", "".join(out))


_SYSTEM = {
    "nfc": lambda t: unicodedata.normalize("NFC", t),
    "nfd": lambda t: unicodedata.normalize("NFD", t),
    "nfkc": lambda t: unicodedata.normalize("NFKC", t),
    "nfkd": lambda t: unicodedata.normalize("NFKD", t),
    "casefold": str.casefold,
    "lower": str.lower,
    "upper": str.upper,
    "any-lower": str.lower,
    "any-upper": str.upper,
    "katakana-hiragana": _kata_to_hira,
    "hiragana-katakana": _hira_to_kata,
    "fullwidth-halfwidth": _fullwidth_to_halfwidth,
    "halfwidth-fullwidth": _halfwidth_to_fullwidth,
    "remove": lambda t: "",
    "null": lambda t: t,
    "any-null": lambda t: t,
}

_REGISTERED_RULES: dict[str, str] = {}


def register_rules(transform_id: str, rule_text: str) -> None:
    """Make a table-driven transform available by ID from caller-
    provided CLDR rule text (the data-pluggable path)."""
    _REGISTERED_RULES[transform_id.strip().lower()] = rule_text


def create_from_rules(rules: str) -> RuleTransliterator:
    return RuleTransliterator(parse_rules(rules))


_DATA_BLOCKED = ("traditional-simplified", "simplified-traditional",
                 "any-latin", "han-latin", "latin-katakana",
                 "cyrillic-latin", "greek-latin")


def get_instance(transform_id: str):
    """Transliterator.getInstance twin over compound filtered IDs."""
    parts = []
    for seg in transform_id.split(";"):
        seg = seg.strip()
        if not seg:
            continue
        flt = None
        if seg.startswith("[") or seg.startswith("\\p") \
                or seg.startswith("\\P"):
            sc = _RuleScanner(seg, {})
            flt = rbbi.parse_set(sc)
            seg = seg[sc.i:].strip()
        key = seg.lower()
        if key in _REGISTERED_RULES:
            t = create_from_rules(_REGISTERED_RULES[key])
        elif key in _SYSTEM:
            t = FunctionTransliterator(_SYSTEM[key])
        elif key in _DATA_BLOCKED:
            raise NotImplementedError(
                f"transform {seg!r} needs CLDR transform-rule data that "
                "is not in the reference snapshot; provide the public "
                "rule text via register_rules() to enable it")
        else:
            raise KeyError(f"unknown transform id {seg!r}")
        parts.append(t if flt is None else FilteredTransliterator(flt, t))
    if len(parts) == 1:
        return parts[0]
    return CompoundTransliterator(parts)


def icu_transform_filter(tokens: list[str], transform) -> list[str]:
    """ICUTransformFilter over a token list, with the reference's
    skip-filter optimization: tokens containing no source-set char
    pass through untouched (ICUTransformFilter.java:70-85)."""
    src = transform.source_set()
    out = []
    for tok in tokens:
        if src is not None and not any(up.contains(src, ord(c))
                                       for c in tok):
            out.append(tok)
        else:
            out.append(transform.transliterate(tok))
    return out
