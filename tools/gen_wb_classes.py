"""Generate exact Unicode-6.1 word-break classes from the reference DFA.

Probes the reference's GENERATED StandardTokenizerImpl automaton (via
tools/ref_tokenizer.py, compiled straight from /root/reference) with
four contexts per code point over the full BMP + all astral code
points assigned in CPython's UCD (a superset of Unicode 6.1's):

    "{c}"      -> does c emit a token alone, and with which type?
    "a{c}"     -> is c absorbed into a preceding word char (WB4
                  Extend/Format)?
    "a{c}b"    -> does c join two letters (WB6/7 MidLetter|MidNumLet)?
    "1{c}2"    -> does c join two digits (WB11/12 MidNum|MidNumLet)?
    "a{c}1"    -> does c bridge letter->digit (WB13a/b ExtendNumLet)?
    "{c}a"     -> can c LEAD a token (separates ExtendNumLet, which
                  attaches at token edges, from absorbed Extend marks)?

and writes lucene_solr_1_spark/analysis/wbclasses.py: per-class
code-point ranges that ARE the reference automaton's character
classes (no UCD-version guessing).  The classes:

    LETTER   solo <ALPHANUM>/<HANGUL> token (jflex ALetter incl. Hangul)
    HANGUL   solo <HANGUL> (subset of LETTER, typing only)
    DIGIT    solo <NUM> (jflex Numeric + fullwidth digits)
    SEA      solo <SOUTHEAST_ASIAN> (LB:Complex_Context runs)
    CJK      solo <IDEOGRAPHIC> (one char per token)
    HIRAGANA solo <HIRAGANA> (one char per token)
    KATAKANA solo <KATAKANA> (runs)
    EXT      absorbed into the preceding token char (Extend|Format)
    ENL      ExtendNumLet: edge-attaching / bridging connector
    MIDL     MidLetter|MidNumLet: joins letter runs
    MIDN     MidNum|MidNumLet: joins digit runs

Usage:  python tools/gen_wb_classes.py   (writes the module in place)
"""

from __future__ import annotations

import json
import os
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.ref_tokenizer import tokenize_many  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_solr_1_spark", "analysis", "wbclasses.py")
CACHE = "/tmp/wb_probe_cache.json"

TYPE_NAMES = {0: "ALPHANUM", 6: "NUM", 9: "SEA", 10: "IDEOGRAPHIC",
              11: "HIRAGANA", 12: "KATAKANA", 13: "HANGUL"}


def candidates():
    cps = [c for c in range(0x20, 0x10000) if not (0xD800 <= c <= 0xDFFF)]
    for c in range(0x10000, 0x110000):
        if unicodedata.category(chr(c)) not in ("Cn", "Co", "Cs"):
            cps.append(c)
    return cps


def probe(cps):
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return {int(k): v for k, v in json.load(f).items()}
    texts = []
    for cp in cps:
        ch = chr(cp)
        texts += [ch, "a" + ch, "a" + ch + "b", "1" + ch + "2",
                  "a" + ch + "1", ch + "a"]
    out = {}
    # batch to bound pipe memory
    B = 200_000
    res = []
    for i in range(0, len(texts), B):
        res += tokenize_many(texts[i:i + B], which="standard")
    assert len(res) == len(texts)
    for i, cp in enumerate(cps):
        ch = chr(cp)
        solo, a_c, acb, n12, ac1, ca = res[6 * i:6 * i + 6]
        rec = {}
        if solo and solo[0][3] == ch:
            rec["solo"] = solo[0][0]
        # raw WB4 probe — true also for word chars (WB5/8 joins); the
        # classifier separates those by solo type
        rec["absorb"] = len(a_c) == 1 and a_c[0][3] == "a" + ch
        rec["ml"] = len(acb) == 1 and acb[0][3] == "a" + ch + "b"
        rec["mn"] = len(n12) == 1 and n12[0][3] == "1" + ch + "2"
        rec["enl"] = len(ac1) == 1 and ac1[0][3] == "a" + ch + "1"
        rec["lead"] = len(ca) == 1 and ca[0][3] == ch + "a"
        if rec.get("solo") is not None or rec["absorb"] or rec["ml"] \
                or rec["mn"] or rec["enl"]:
            out[cp] = rec
    with open(CACHE, "w") as f:
        json.dump(out, f)
    return out


def to_ranges(cps):
    rs = []
    for c in sorted(cps):
        if rs and c == rs[-1][1] + 1:
            rs[-1][1] = c
        else:
            rs.append([c, c])
    return [(a, b) for a, b in rs]


def main():
    cps = candidates()
    print(f"probing {len(cps)} code points x5 contexts ...")
    data = probe(cps)
    print(f"classified {len(data)} code points")

    cls = {k: set() for k in ("LETTER", "HANGUL", "DIGIT", "SEA", "CJK",
                              "HIRAGANA", "KATAKANA", "EXT", "ENL",
                              "MIDL", "MIDN")}
    for cp, rec in data.items():
        solo = rec.get("solo")
        if solo in (0, 13):
            cls["LETTER"].add(cp)
            if solo == 13:
                cls["HANGUL"].add(cp)
        elif solo == 6:
            cls["DIGIT"].add(cp)
        elif solo == 9:
            cls["SEA"].add(cp)
        elif solo == 10:
            cls["CJK"].add(cp)
        elif solo == 11:
            cls["HIRAGANA"].add(cp)
        elif solo == 12:
            cls["KATAKANA"].add(cp)
        elif solo is not None:
            raise AssertionError(f"unexpected solo type {solo} at {hex(cp)}")
        # the jflex classes OVERLAP: a char can be LB:Complex_Context
        # (solo -> SEA run) AND WB:Extend (absorbs into a preceding
        # word char inside the WORD rule) — e.g. U+1A60 TAI THAM SAKOT,
        # U+17DD KHMER ATTHACAN. EXT/ENL/MID membership is therefore
        # decided independently of the solo class; word-class solo
        # types are excluded because their "a{c}" join is WB5/8/13,
        # not WB4 absorption.
        if solo not in (0, 6, 12, 13):
            if rec["absorb"] and rec.get("lead"):
                cls["ENL"].add(cp)  # edge-attaching connector (WB13a/b)
            elif rec["absorb"]:
                cls["EXT"].add(cp)
            else:
                if rec["ml"]:
                    cls["MIDL"].add(cp)
                if rec["mn"]:
                    cls["MIDN"].add(cp)

    lines = [
        '"""GENERATED by tools/gen_wb_classes.py — do not edit by hand.',
        "",
        "Exact character classes of the reference StandardTokenizer DFA",
        "(lucene/analysis/common/.../standard/StandardTokenizerImpl.java,",
        "the generated jflex automaton, Unicode 6.1), probed code point by",
        "code point over the full BMP plus all assigned astral planes.",
        "Range data (not code) derived from the reference's generated",
        "tables; regenerate with:  python tools/gen_wb_classes.py",
        '"""',
        "",
        "# class sizes: " + ", ".join(
            f"{k}={len(v)}" for k, v in cls.items()),
        "",
    ]
    for name, cpset in cls.items():
        rs = to_ranges(cpset)
        lines.append(f"{name}_RANGES = [")
        row = []
        for a, b in rs:
            row.append(f"(0x{a:X},0x{b:X})")
            if len(row) == 6:
                lines.append("    " + ",".join(row) + ",")
                row = []
        if row:
            lines.append("    " + ",".join(row) + ",")
        lines.append("]")
        lines.append("")
    # ---- Java-twin classes: category tests first (O(1) per char in
    # Java's Pattern — the r3 lesson: literal many-range classes make
    # every char test O(#ranges)), with small residue corrections so
    # the JVM regexp matches the exact 6.1 classes.  Residues are
    # computed against CPython's UCD as a proxy for the JDK's; a char
    # subtracted that the JDK never matches is a harmless no-op, and
    # the ref classes (Unicode 6.1) predate both UCDs.
    def pyset(pred):
        s = set()
        for c in range(0x20, 0x110000):
            if 0xD800 <= c <= 0xDFFF:
                continue
            if pred(chr(c)):
                s.add(c)
        return s

    cat = unicodedata.category
    j_letter_base = pyset(lambda ch: cat(ch).startswith("L") or cat(ch) == "Nl")
    j_digit_base = pyset(lambda ch: cat(ch) == "Nd")
    j_ext_base = pyset(lambda ch: cat(ch) in ("Mn", "Mc", "Me", "Cf"))

    other = cls["CJK"] | cls["HIRAGANA"] | cls["KATAKANA"] | cls["SEA"]
    java = {
        # letters exclude the CJK/kana/SEA classes (handled by their own
        # alternatives) — subtract them as literal ranges (few) and the
        # post-6.1 additions as residues
        "LETTER": ("[\\p{L}\\p{Nl}]", j_letter_base, cls["LETTER"]),
        "DIGIT": ("[\\p{Nd}]", j_digit_base, cls["DIGIT"]),
        "EXT": ("[\\p{Mn}\\p{Mc}\\p{Me}\\p{Cf}]", j_ext_base, cls["EXT"]),
    }
    lines.append("# Java Pattern twins: '<base-class>&&[^<sub>]' unioned with <add>,")
    lines.append("# where base is a JDK category class (O(1) char test) and the")
    lines.append("# residues correct it to the exact Unicode-6.1 reference class.")
    for name, (base, base_set, ref_set) in java.items():
        sub = to_ranges(base_set - ref_set)
        add = to_ranges(ref_set - base_set)
        lines.append(f"JAVA_{name}_BASE = {base!r}")
        lines.append(f"JAVA_{name}_SUB_RANGES = {sub!r}")
        lines.append(f"JAVA_{name}_ADD_RANGES = {add!r}")
        lines.append("")
        print(f"  java {name}: sub {len(sub)} ranges "
              f"({len(base_set - ref_set)} cps), add {len(add)} ranges "
              f"({len(ref_set - base_set)} cps)")

    lines += [
        "def cls(ranges):",
        '    """Render ranges as a regex character-class body."""',
        "    out = []",
        "    for a, b in ranges:",
        "        ca, cb = chr(a), chr(b)",
        "        ea = ca if ca not in r'\\^]-[' else '\\\\' + ca",
        "        eb = cb if cb not in r'\\^]-[' else '\\\\' + cb",
        "        out.append(ea if a == b else f'{ea}-{eb}')",
        "    return ''.join(out)",
        "",
        "",
        "def java_cls(base, sub_ranges, add_ranges):",
        '    """Render a Java char class: (base minus sub) union add."""',
        "    b = base[1:-1]  # strip outer brackets",
        "    inner = b",
        "    if sub_ranges:",
        "        inner = b + '&&[^' + cls(sub_ranges) + ']'",
        "    if add_ranges:",
        "        return '[[' + inner + ']' + cls(add_ranges) + ']'",
        "    return '[' + inner + ']'",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")
    for k, v in cls.items():
        print(f"  {k}: {len(v)} cps, {len(to_ranges(v))} ranges")


if __name__ == "__main__":
    main()
