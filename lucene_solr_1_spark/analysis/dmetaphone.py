"""Double Metaphone (Lawrence Philips' 2000 algorithm), primary +
alternate encodings.

Implemented from the published algorithm (Philips, "The Double
Metaphone Search Algorithm", C/C++ Users Journal, June 2000; the same
rules Apache Commons Codec ships as
org.apache.commons.codec.language.DoubleMetaphone, which the reference
wires through analysis/phonetic/.../DoubleMetaphoneFilter.java:31).
Validated against the commons-codec implementation on Spark's own JVM
classpath over the 30k-word snowball english vocabulary plus fuzz
strings (tests/test_phonetic.py::test_double_metaphone_jvm_parity).

`double_metaphone_tokens` mirrors DoubleMetaphoneFilter's emission
contract (inject keeps the original, alternate emitted only when it
differs from a primary that itself differs from the input).
"""

from __future__ import annotations

_VOWELS = set("AEIOUY")
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V",
                            "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY",
                                     "IB", "IL", "IN", "IE", "EI",
                                     "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    __slots__ = ("primary", "alternate", "maxlen")

    def __init__(self, maxlen):
        self.primary = []
        self.alternate = []
        self.maxlen = maxlen

    def append(self, p, a=None):
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s):
        room = self.maxlen - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s):
        room = self.maxlen - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    @property
    def complete(self):
        return (len(self.primary) >= self.maxlen
                and len(self.alternate) >= self.maxlen)


def _ch(v, i):
    return v[i] if 0 <= i < len(v) else "\0"


def _is_vowel(c):
    return c in _VOWELS


def _has(v, start, length, *criteria):
    if start < 0 or start + length > len(v):
        return False
    return v[start:start + length] in criteria


def double_metaphone(value: str | None, max_code_len: int = 4):
    """(primary, alternate) or (None, None) for empty/blank input."""
    if value is None:
        return None, None
    value = value.strip().upper()
    if not value:
        return None, None
    slavo = ("W" in value or "K" in value or "CZ" in value
             or "WITZ" in value)
    n = len(value)
    index = 1 if value[:2] in _SILENT_START else 0
    r = _Result(max_code_len)

    while not r.complete and index <= n - 1:
        c = value[index]
        if c in _VOWELS:
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if _ch(value, index + 1) == "B" else 1
        elif c == "Ç":
            r.append("S")
            index += 1
        elif c == "C":
            index = _handle_c(value, r, index)
        elif c == "D":
            index = _handle_d(value, r, index)
        elif c == "F":
            r.append("F")
            index += 2 if _ch(value, index + 1) == "F" else 1
        elif c == "G":
            index = _handle_g(value, r, index, slavo)
        elif c == "H":
            index = _handle_h(value, r, index)
        elif c == "J":
            index = _handle_j(value, r, index, slavo)
        elif c == "K":
            r.append("K")
            index += 2 if _ch(value, index + 1) == "K" else 1
        elif c == "L":
            index = _handle_l(value, r, index)
        elif c == "M":
            r.append("M")
            index += 2 if _condition_m0(value, index) else 1
        elif c == "N":
            r.append("N")
            index += 2 if _ch(value, index + 1) == "N" else 1
        elif c == "Ñ":
            r.append("N")
            index += 1
        elif c == "P":
            index = _handle_p(value, r, index)
        elif c == "Q":
            r.append("K")
            index += 2 if _ch(value, index + 1) == "Q" else 1
        elif c == "R":
            index = _handle_r(value, r, index, slavo)
        elif c == "S":
            index = _handle_s(value, r, index, slavo)
        elif c == "T":
            index = _handle_t(value, r, index)
        elif c == "V":
            r.append("F")
            index += 2 if _ch(value, index + 1) == "V" else 1
        elif c == "W":
            index = _handle_w(value, r, index)
        elif c == "X":
            index = _handle_x(value, r, index)
        elif c == "Z":
            index = _handle_z(value, r, index, slavo)
        else:
            index += 1

    return "".join(r.primary), "".join(r.alternate)


def _handle_c(v, r, i):
    if _condition_c0(v, i):
        r.append("K")
        return i + 2
    if i == 0 and _has(v, i, 6, "CAESAR"):
        r.append("S")
        return i + 2
    if _has(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _has(v, i, 2, "CZ") and not _has(v, i - 2, 4, "WICZ"):
        r.append("S", "X")
        return i + 2
    if _has(v, i + 1, 3, "CIA"):
        r.append("X")
        return i + 3
    if _has(v, i, 2, "CC") and not (i == 1 and _ch(v, 0) == "M"):
        return _handle_cc(v, r, i)
    if _has(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        return i + 2
    if _has(v, i, 2, "CI", "CE", "CY"):
        if _has(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return i + 2
    r.append("K")
    if _has(v, i + 1, 2, " C", " Q", " G"):
        return i + 3
    if (_has(v, i + 1, 1, "C", "K", "Q")
            and not _has(v, i + 1, 2, "CE", "CI")):
        return i + 2
    return i + 1


def _condition_c0(v, i):
    # germanic "-ach-"
    if _has(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_ch(v, i - 2)):
        return False
    if not _has(v, i - 1, 3, "ACH"):
        return False
    c = _ch(v, i + 2)
    return (c not in "IE") or _has(v, i - 2, 6, "BACHER", "MACHER")


def _handle_cc(v, r, i):
    if _has(v, i + 2, 1, "I", "E", "H") and not _has(v, i + 2, 2, "HU"):
        if ((i == 1 and _ch(v, i - 1) == "A")
                or _has(v, i - 1, 5, "UCCEE", "UCCES")):
            r.append("KS")
        else:
            r.append("X")
        return i + 3
    r.append("K")
    return i + 2


def _handle_ch(v, r, i):
    if i > 0 and _has(v, i, 4, "CHAE"):
        r.append("K", "X")
        return i + 2
    if _condition_ch0(v, i):
        r.append("K")                    # greek roots: chemistry, chorus
        return i + 2
    if _condition_ch1(v, i):
        r.append("K")                    # germanic
        return i + 2
    if i > 0:
        if _has(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _condition_ch0(v, i):
    if i != 0:
        return False
    if not (_has(v, i + 1, 5, "HARAC", "HARIS")
            or _has(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
        return False
    return not _has(v, 0, 5, "CHORE")


def _condition_ch1(v, i):
    return ((_has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH"))
            or _has(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _has(v, i + 2, 1, "T", "S")
            or ((_has(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_has(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(v) - 1)))


def _handle_d(v, r, i):
    if _has(v, i, 2, "DG"):
        if _has(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")                # "edge"
            return i + 3
        r.append("TK")                   # "edgar"
        return i + 2
    if _has(v, i, 2, "DT", "DD"):
        r.append("T")
        return i + 2
    r.append("T")
    return i + 1


def _handle_g(v, r, i, slavo):
    if _ch(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _ch(v, i + 1) == "N":
        if i == 1 and _is_vowel(_ch(v, 0)) and not slavo:
            r.append("KN", "N")
        elif (not _has(v, i + 2, 2, "EY") and _ch(v, i + 1) != "Y"
              and not slavo):
            r.append("N", "KN")
        else:
            r.append("KN")
        return i + 2
    if _has(v, i + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return i + 2
    if i == 0 and (_ch(v, i + 1) == "Y"
                   or _has(v, i + 1, 2,
                           *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.append("K", "J")               # -ges-, -gep- at start
        return i + 2
    if ((_has(v, i + 1, 2, "ER") or _ch(v, i + 1) == "Y")
            and not _has(v, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _has(v, i - 1, 1, "E", "I")
            and not _has(v, i - 1, 3, "RGY", "OGY")):
        r.append("K", "J")
        return i + 2
    if (_has(v, i + 1, 1, "E", "I", "Y")
            or _has(v, i - 1, 4, "AGGI", "OGGI")):
        if (_has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH")
                or _has(v, i + 1, 2, "ET")):
            r.append("K")                # obvious germanic
        elif _has(v, i + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _ch(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v, r, i):
    if i > 0 and not _is_vowel(_ch(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _ch(v, i + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return i + 2
    if ((i > 1 and _has(v, i - 2, 1, "B", "H", "D"))
            or (i > 2 and _has(v, i - 3, 1, "B", "H", "D"))
            or (i > 3 and _has(v, i - 4, 1, "B", "H"))):
        return i + 2                     # silent: -hugh-, -bough- ...
    if (i > 2 and _ch(v, i - 1) == "U"
            and _has(v, i - 3, 1, "C", "G", "L", "R", "T")):
        r.append("F")                    # "laugh", "cough" ...
    elif i > 0 and _ch(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v, r, i):
    if ((i == 0 or _is_vowel(_ch(v, i - 1)))
            and _is_vowel(_ch(v, i + 1))):
        r.append("H")                    # only between vowels / start
        return i + 2
    return i + 1


def _handle_j(v, r, i, slavo):
    if _has(v, i, 4, "JOSE") or _has(v, 0, 4, "SAN "):
        if ((i == 0 and _ch(v, i + 4) == " ") or len(v) == 4
                or _has(v, 0, 4, "SAN ")):
            r.append("H")                # spanish: jose, san jacinto
        else:
            r.append("J", "H")
        return i + 1
    if i == 0 and not _has(v, i, 4, "JOSE"):
        r.append("J", "A")
    elif (_is_vowel(_ch(v, i - 1)) and not slavo
          and _ch(v, i + 1) in "AO"):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append("J", " ")
    elif (not _has(v, i + 1, 1, *_L_T_K_S_N_M_B_Z)
          and not _has(v, i - 1, 1, "S", "K", "L")):
        r.append("J")
    # else: silent
    return i + 2 if _ch(v, i + 1) == "J" else i + 1


def _handle_l(v, r, i):
    if _ch(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")        # spanish -illo: alt drops L
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _condition_l0(v, i):
    n = len(v)
    if i == n - 3 and _has(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return ((_has(v, n - 2, 2, "AS", "OS") or _has(v, n - 1, 1, "A", "O"))
            and _has(v, i - 1, 4, "ALLE"))


def _condition_m0(v, i):
    if _ch(v, i + 1) == "M":
        return True
    return (_has(v, i - 1, 3, "UMB")
            and (i + 1 == len(v) - 1 or _has(v, i + 2, 2, "ER")))


def _handle_p(v, r, i):
    if _ch(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _has(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v, r, i, slavo):
    if (i == len(v) - 1 and not slavo and _has(v, i - 2, 2, "IE")
            and not _has(v, i - 4, 2, "ME", "MA")):
        r.append_alternate("R")          # french -ier
    else:
        r.append("R")
    return i + 2 if _ch(v, i + 1) == "R" else i + 1


def _handle_s(v, r, i, slavo):
    if _has(v, i - 1, 3, "ISL", "YSL"):
        return i + 1                     # silent: island, isle
    if i == 0 and _has(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _has(v, i, 2, "SH"):
        if _has(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")                # germanic
        else:
            r.append("X")
        return i + 2
    if _has(v, i, 3, "SIO", "SIA") or _has(v, i, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if ((i == 0 and _has(v, i + 1, 1, "M", "N", "L", "W"))
            or _has(v, i + 1, 1, "Z")):
        r.append("S", "X")
        return i + 2 if _has(v, i + 1, 1, "Z") else i + 1
    if _has(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _has(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")          # french: resnais, artois
    else:
        r.append("S")
    return i + 2 if _has(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v, r, i):
    if _ch(v, i + 2) == "H":
        if _has(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _has(v, i + 3, 2, "ER", "EN"):
                r.append("X", "SK")      # "schermerhorn"
            else:
                r.append("SK")           # "school", "schooner"
        elif i == 0 and not _is_vowel(_ch(v, 3)) and _ch(v, 3) != "W":
            r.append("X", "S")
        else:
            r.append("X")
        return i + 3
    if _has(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
        return i + 3
    r.append("SK")
    return i + 3


def _handle_t(v, r, i):
    if _has(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _has(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _has(v, i, 2, "TH") or _has(v, i, 3, "TTH"):
        if (_has(v, i + 2, 2, "OM", "AM")
                or _has(v, 0, 4, "VAN ", "VON ")
                or _has(v, 0, 3, "SCH")):
            r.append("T")                # thomas, thames, germanic
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _has(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v, r, i):
    if _has(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (_is_vowel(_ch(v, i + 1)) or _has(v, i, 2, "WH")):
        if _is_vowel(_ch(v, i + 1)):
            r.append("A", "F")           # wasserman / vasserman
        else:
            r.append("A")
        return i + 1
    if ((i == len(v) - 1 and _is_vowel(_ch(v, i - 1)))
            or _has(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or _has(v, 0, 3, "SCH")):
        r.append_alternate("F")
        return i + 1
    if _has(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v, r, i):
    if i == 0:
        r.append("S")                    # initial X as in xavier
        return i + 1
    if not (i == len(v) - 1
            and (_has(v, i - 3, 3, "IAU", "EAU")
                 or _has(v, i - 2, 2, "AU", "OU"))):
        r.append("KS")                   # (french -eaux is silent)
    return i + 2 if _has(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v, r, i, slavo):
    if _ch(v, i + 1) == "H":
        r.append("J")                    # chinese pinyin, e.g. zhao
        return i + 2
    if (_has(v, i + 1, 2, "ZO", "ZI", "ZA")
            or (slavo and i > 0 and _ch(v, i - 1) != "T")):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _ch(v, i + 1) == "Z" else i + 1


def double_metaphone_tokens(tokens: list[str], max_code_len: int = 4,
                            inject: bool = True) -> list[str]:
    """DoubleMetaphoneFilter contract (DoubleMetaphoneFilter.java:54):
    per token, emit [original?, primary, alternate?]; the original is
    kept only when inject, the primary only when non-empty and != the
    original, the alternate only when it differs from an emitted
    primary."""
    out: list[str] = []
    for t in tokens:
        if not t:
            out.append(t)
            continue
        pri, alt = double_metaphone(t, max_code_len)
        emitted = []
        if pri and pri != t:
            emitted.append(pri)
            if alt and alt != pri:
                emitted.append(alt)
        if not emitted:
            out.append(t)
            continue
        if inject:
            out.append(t)
        out.extend(emitted)
    return out
