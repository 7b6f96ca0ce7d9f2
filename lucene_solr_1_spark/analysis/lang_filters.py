"""Per-language normalizers and light stemmers (analysis factories).

Analogs of the reference's hand-written language filters, each a pure
token -> token function reimplementing the published algorithm the
reference cites; validated against the reference's own filter test
vectors (tests/test_lang_filters.py):

  * Arabic: ArabicNormalizer (ar/ArabicNormalizer.java:30 — hamza'd
    alefs -> alef, dotless yeh -> yeh, teh marbuta -> heh, harakat and
    tatweel removal) + ArabicStemmer (ar/ArabicStemmer.java:30 —
    Larkey/Ballesteros/Connell "light10": longest definite-article
    prefix once, then every listed suffix in order, with minimum-length
    guards).
  * Persian: PersianNormalizer (fa/PersianNormalizer.java — farsi
    yeh/yeh barree -> yeh, keheh -> kaf, heh goal/heh+yeh -> heh,
    hamza-above removal).
  * Greek: GreekLowerCaseFilter (el/GreekLowerCaseFilter.java —
    final sigma folded to sigma, tonos/dialytika diacritic forms to
    base lowercase vowels).
  * German: GermanNormalizationFilter (de/GermanNormalizationFilter
    .java — German2 heuristics as a 3-state FSM: umlauts to base
    vowels, ae/oe -> a/o, ue -> u except after vowel/q, ss for eszett).
  * Scandinavian: ScandinavianFoldingFilter (å/ä/æ -> a, ö/ø -> o,
    aa/ae/ao/oe/oo digraph collapse) and ScandinavianNormalizationFilter
    (ä -> æ, ö -> ø, digraphs to the national letters) —
    miscellaneous/Scandinavian*Filter.java.
  * Hindi: HindiNormalizer (hi/HindiNormalizer.java — the published
    Devanagari orthographic normalizations: nukta forms, dead
    consonant/bindu, chandra forms, long->short vowels, virama/ZW
    removal) + HindiStemmer (hi/HindiStemmer.java — the light stemmer's
    suffix ladder by length).
  * Czech: CzechStemmer (cz/CzechStemmer.java — Dolamic & Savoy light:
    case endings, possessives, palatalization normalizations).
  * Bulgarian: BulgarianStemmer (bg/BulgarianStemmer.java — article,
    plural, and ya/vowel endings with the paper's ен fix).
  * Latvian: LatvianStemmer (lv/LatvianStemmer.java — vowel-count
    gated affix table with un-palatalization rules).
  * Indonesian: IndonesianStemmer (id/IndonesianStemmer.java — the
    Asian/Tan algorithm: particles, possessives, first/second-order
    prefixes with flag-gated suffixes).

Scale: all run through the same vocabulary-trick path as the Snowball
set (stem_vocab -> broadcast map join), so per-document cost is zero
beyond tokenization.
"""

from __future__ import annotations

# ------------------------------------------------------------- Arabic

_AR_HARAKAT = set("\u0640\u064B\u064C\u064D\u064E\u064F\u0650"
                  "\u0651\u0652")    # tatweel + the eight harakat
_AR_ALEFS = {"\u0622": "\u0627", "\u0623": "\u0627",
             "\u0625": "\u0627",               # hamza'd alef -> alef
             "\u0649": "\u064A",               # dotless yeh -> yeh
             "\u0629": "\u0647"}               # teh marbuta -> heh
_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_normalize(token: str) -> str:
    return "".join(_AR_ALEFS.get(c, c) for c in token
                   if c not in _AR_HARAKAT)


def arabic_stem(token: str) -> str:
    w = token
    for p in _AR_PREFIXES:
        if w.startswith(p):
            if len(p) == 1 and len(w) < 4:
                continue                 # waw needs >= 3 left + itself
            if len(w) < len(p) + 2:
                continue
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if w.endswith(s) and len(w) >= len(s) + 2:
            w = w[:len(w) - len(s)]
    return w


# ------------------------------------------------------------ Persian

_FA_MAP = {"\u06CC": "\u064A", "\u06D2": "\u064A",  # yeh forms
           "\u06A9": "\u0643",                        # keheh -> kaf
           "\u06C0": "\u0647", "\u06C1": "\u0647"}  # heh forms


def persian_normalize(token: str) -> str:
    return "".join(_FA_MAP.get(c, c) for c in token
                   if c != "\u0654")   # hamza above deleted


# -------------------------------------------------------------- Greek

_EL_MAP = {}
for _targets, _base in (
        ("ς", "σ"),
        ("Άά", "α"), ("Έέ", "ε"),
        ("Ήή", "η"),
        ("ΊΪίϊΐ", "ι"),
        ("ΎΫύϋΰ", "υ"),
        ("Όό", "ο"), ("Ώώ", "ω"),
        ("΢", "ς")):
    for _t in _targets:
        _EL_MAP[_t] = _base


def greek_lowercase(token: str) -> str:
    return "".join(_EL_MAP.get(c, c.lower() if len(c.lower()) == 1
                               else c.lower()[0]) for c in token)


# ------------------------------------------------------------- German

def german_normalize(token: str) -> str:
    """3-state FSM (N/V/U): delete 'e' after a/o/u in umlaut state."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in token:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue                 # delete the e of ae/oe/ue
            out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


# ------------------------------------------------------- Scandinavian

def scandinavian_fold(token: str) -> str:
    out = []
    i, n = 0, len(token)
    s = token
    while i < n:
        c = s[i]
        if c in "åäæ":
            out.append("a")
        elif c in "ÅÄÆ":
            out.append("A")
        elif c in "øö":
            out.append("o")
        elif c in "ØÖ":
            out.append("O")
        elif i + 1 < n and c in "aA" and s[i + 1] in "aAeEoO":
            out.append(c)
            i += 2
            continue
        elif i + 1 < n and c in "oO" and s[i + 1] in "eEoO":
            out.append(c)
            i += 2
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def scandinavian_normalize(token: str) -> str:
    out = []
    i, n = 0, len(token)
    s = token
    while i < n:
        c = s[i]
        if c == "ä":
            out.append("æ")
        elif c == "Ä":
            out.append("Æ")
        elif c == "ö":
            out.append("ø")
        elif c == "Ö":
            out.append("Ø")
        elif i + 1 < n and c == "a" and s[i + 1] in "aoAO":
            out.append("å")
            i += 2
            continue
        elif i + 1 < n and c == "A" and s[i + 1] in "aAoO":
            out.append("Å")
            i += 2
            continue
        elif i + 1 < n and c == "a" and s[i + 1] in "eE":
            out.append("æ")
            i += 2
            continue
        elif i + 1 < n and c == "A" and s[i + 1] in "eE":
            out.append("Æ")
            i += 2
            continue
        elif i + 1 < n and c == "o" and s[i + 1] in "eEoO":
            out.append("ø")
            i += 2
            continue
        elif i + 1 < n and c == "O" and s[i + 1] in "eEoO":
            out.append("Ø")
            i += 2
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


# -------------------------------------------------------------- Hindi

_HI_ONE = {"ँ": "ं", "ऩ": "न", "ऱ": "र",
           "ऴ": "ळ", "क़": "क", "ख़": "ख",
           "ग़": "ग", "ज़": "ज", "ड़": "ड",
           "ढ़": "ढ", "फ़": "फ", "य़": "य",
           "ॅ": "े", "ॆ": "े", "ॉ": "ो",
           "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
           "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
           "आ": "अ", "ई": "इ", "ऊ": "उ",
           "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
           "औ": "ओ", "ी": "ि", "ू": "ु",
           "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
           "ौ": "ो"}
_HI_DEL = set("़‍‌्")


def hindi_normalize(token: str) -> str:
    out = []
    i, n = 0, len(token)
    while i < n:
        c = token[i]
        if c == "न" and i + 1 < n and token[i + 1] == "्":
            out.append("ं")         # dead n -> bindu
            i += 2
            continue
        if c in _HI_DEL:
            i += 1
            continue
        out.append(_HI_ONE.get(c, c))
        i += 1
    return "".join(out)


_HI_SUFFIXES = [
    (6, ["ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"]),
    (5, ["ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां"]),
    (4, ["ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं"]),
    (3, ["कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें"]),
    (2, ["ो", "े", "ू", "ु", "ी", "ि", "ा"]),
]


def hindi_stem(token: str) -> str:
    for min_len, sufs in _HI_SUFFIXES:
        if len(token) > min_len:
            for s in sufs:
                if token.endswith(s):
                    return token[:len(token) - len(s)]
    return token


# -------------------------------------------------------------- Czech

_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")


def czech_stem(token: str) -> str:
    w = token
    n = len(w)
    # case endings
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_2):
        w = w[:-2]
    elif n > 3 and w[-1] in "aeiouůyáéíýě":
        w = w[:-1]
    # possessives
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    if not w:
        return w
    # palatalization normalize
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ---------------------------------------------------------- Bulgarian

def bulgarian_stem(token: str) -> str:
    w = token
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    # article
    if len(w) > 6 and w.endswith("ият"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("ят"):
        w = w[:-2]
    # plural
    n = len(w)
    if n > 6 and w.endswith("овци"):
        w = w[:-3]
    elif n > 6 and w.endswith("ове"):
        w = w[:-3]
    elif n > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif n > 5 and w.endswith("ища"):
        w = w[:-3]
    elif n > 5 and w.endswith("та"):
        w = w[:-2]
    elif n > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif n > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif n > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif n > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif n > 4 and w.endswith("и"):
        w = w[:-1]
    if len(w) > 3 and w.endswith("я"):
        w = w[:-1]
    if len(w) > 3 and w[-1] in "аое":
        w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ------------------------------------------------------------ Latvian

_LV_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False), ("ū", 1, False),
    ("o", 1, False), ("s", 0, False), ("š", 0, False),
]
_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(w: str, removed: str) -> str:
    if removed and removed[0] == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    for pat, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(pat):
            return w[:-2] + rep
    if w and w[-1] == "č":
        return w[:-1] + "c"
    if w and w[-1] == "ļ":
        return w[:-1] + "l"
    if w and w[-1] == "ņ":
        return w[:-1] + "n"
    return w


def latvian_stem(token: str) -> str:
    nv = sum(c in _LV_VOWELS for c in token)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(token) >= len(affix) + 3 \
                and token.endswith(affix):
            w = token[:len(token) - len(affix)]
            return _lv_unpalatalize(w, affix) if palatalizes else w
    return token


# --------------------------------------------------------- Indonesian

_ID_VOWELS = set("aeiou")


def indonesian_stem(token: str, stem_derivational: bool = True) -> str:
    w = token
    syl = sum(c in _ID_VOWELS for c in w)
    flags = set()

    def particle(w, syl):
        if w.endswith(("kah", "lah", "pun")):
            return w[:-3], syl - 1
        return w, syl

    def possessive(w, syl):
        if w.endswith(("ku", "mu")):
            return w[:-2], syl - 1
        if w.endswith("nya"):
            return w[:-3], syl - 1
        return w, syl

    def first_prefix(w, syl):
        if w.startswith("meng"):
            flags.add("meng")
            return w[4:], syl - 1
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags.add("meng")
            return "s" + w[4:], syl - 1
        if w.startswith(("men", "mem")):
            flags.add("meng")
            return w[3:], syl - 1
        if w.startswith("me"):
            flags.add("meng")
            return w[2:], syl - 1
        if w.startswith("peng"):
            flags.add("peng")
            return w[4:], syl - 1
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags.add("peng")
            return "s" + w[4:], syl - 1
        if w.startswith("peny"):
            flags.add("peng")
            return w[4:], syl - 1
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            flags.add("peng")
            return "t" + w[3:], syl - 1
        if w.startswith("pen"):
            flags.add("peng")
            return w[3:], syl - 1
        if w.startswith("pem"):
            flags.add("peng")
            return w[3:], syl - 1
        if w.startswith("di"):
            flags.add("di")
            return w[2:], syl - 1
        if w.startswith("ter"):
            flags.add("ter")
            return w[3:], syl - 1
        if w.startswith("ke"):
            flags.add("ke")
            return w[2:], syl - 1
        return w, syl

    def second_prefix(w, syl):
        if w.startswith("ber"):
            flags.add("ber")
            return w[3:], syl - 1
        if w == "belajar":
            flags.add("ber")
            return w[3:], syl - 1
        if w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS \
                and w[3] == "e" and w[4] == "r":
            flags.add("ber")
            return w[2:], syl - 1
        if w.startswith("per"):
            return w[3:], syl - 1
        if w == "pelajar":
            return w[3:], syl - 1
        if w.startswith("pe"):
            flags.add("pe")
            return w[2:], syl - 1
        return w, syl

    def suffix(w, syl):
        if w.endswith("kan") and not ({"ke", "peng", "pe"} & flags):
            return w[:-3], syl - 1
        if w.endswith("an") and not ({"di", "meng", "ter"} & flags):
            return w[:-2], syl - 1
        if w.endswith("i") and not w.endswith("si") \
                and not ({"ber", "ke", "peng"} & flags):
            return w[:-1], syl - 1
        return w, syl

    if syl > 2:
        w, syl = particle(w, syl)
    if syl > 2:
        w, syl = possessive(w, syl)
    if stem_derivational:
        old = w
        if syl > 2:
            w, syl = first_prefix(w, syl)
        if w != old:
            old = w
            if syl > 2:
                w, syl = suffix(w, syl)
            if w != old and syl > 2:
                w, syl = second_prefix(w, syl)
        else:
            if syl > 2:
                w, syl = second_prefix(w, syl)
            if syl > 2:
                w, syl = suffix(w, syl)
    return w
