"""Full Snowball stemmers (German, Swedish, Danish, Norwegian),
implemented from the published Snowball specifications at
snowballstem.org — not a translation of the reference's generated Java
(ref: lucene/analysis/common/src/java/org/tartarus/snowball/ext/
GermanStemmer.java etc. are machine-generated from the same public
.sbl specs; SnowballFilter.java:53 wires them as TokenFilters).

Validated word-for-word against the official Snowball vocabulary that
the reference's own TestSnowballVocab uses
(lucene/analysis/common/src/test/org/apache/lucene/analysis/snowball/
TestSnowballVocabData.zip: german/voc.txt -> german/output.txt) — see
tests/test_stemmer.py.

Scale note: used through the same "vocabulary trick" as Porter/Porter2
(`stem_vocab` in stemmer.py): distinct terms are stemmed once on the
driver/executors and applied as a broadcast map join, so per-document
cost is zero beyond tokenization regardless of corpus size.
"""

from __future__ import annotations

_VOWELS = set("aeiouy\xe4\xf6\xfc")          # a e i o u y ä ö ü
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")               # s_ending - 'r'


def _mark_regions(word: str) -> tuple[int, int]:
    """Standard R1/R2 (first non-vowel after a vowel, twice), with the
    German adjustment: R1 starts no earlier than position 3."""
    n = len(word)
    p1 = p2 = n
    i = 0
    # R1
    while i < n and word[i] not in _VOWELS:
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    # adjust: region before R1 must hold >= 3 letters
    if p1 < 3:
        p1 = 3 if n >= 3 else n
    # R2 (computed from the unadjusted scan position)
    j = i + 1 if i < n else n
    while j < n and word[j] not in _VOWELS:
        j += 1
    while j < n and word[j] in _VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return p1, p2


def german_stem(word: str) -> str:
    """Snowball German: prelude (ss, U/Y marking), three suffix steps
    constrained by R1/R2, postlude (unfold U/Y, strip umlauts)."""
    word = word.lower().replace("\xdf", "ss")     # ß -> ss
    if len(word) <= 2:
        # still strip umlauts for parity with the postlude
        return (word.replace("\xe4", "a").replace("\xf6", "o")
                    .replace("\xfc", "u"))

    # prelude: u/y between vowels are marked as consonants (U/Y)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        elif chars[i] == "y" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    return _german_core(word)


def _german_core(word: str) -> str:
    """Steps 1-3 + postlude shared by german and german2 (input already
    lowercased, ss-folded, U/Y-marked; german2 also umlaut-folded)."""
    p1, p2 = _mark_regions(word)

    # ---- step 1: longest of (a) em ern er, (b) e en es, (c) s -------
    # delete if the suffix lies in R1; for (c) the s must follow a
    # valid s-ending (that letter need not be in R1).  (The later
    # spec's "niss -> nis" refinement post-dates the 2010 vocabulary
    # the reference pins, so it is deliberately absent.)
    n = len(word)
    done = False
    for suf in ("ern", "em", "er"):
        if word.endswith(suf):
            if n - len(suf) >= p1:
                word = word[:n - len(suf)]
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):
            if word.endswith(suf):
                if n - len(suf) >= p1:
                    word = word[:n - len(suf)]
                done = True
                break
    if not done and word.endswith("s"):
        if n - 1 >= p1 and n >= 2 and word[n - 2] in _S_ENDING:
            word = word[:-1]

    # ---- step 2: longest of en er est | st ---------------------------
    n = len(word)
    done = False
    for suf in ("est", "en", "er"):
        if word.endswith(suf):
            if n - len(suf) >= p1:
                word = word[:n - len(suf)]
            done = True
            break
    if not done and word.endswith("st"):
        # st in R1, preceded by a valid st-ending, itself preceded by
        # at least 3 letters
        if n - 2 >= p1 and n >= 6 and word[n - 3] in _ST_ENDING:
            word = word[:-2]

    # ---- step 3: d-suffixes, R2-constrained --------------------------
    n = len(word)
    if word.endswith(("end", "ung")) and n - 3 >= p2:
        word = word[:-3]
        if word.endswith("ig") and len(word) - 2 >= p2 \
                and not word.endswith("eig"):
            word = word[:-2]
    elif word.endswith("isch"):
        if n - 4 >= p2 and not word.endswith("eisch"):
            word = word[:-4]
    elif word.endswith(("ig", "ik")):
        if n - 2 >= p2 and word[n - 3:n - 2] != "e":
            word = word[:-2]
    elif word.endswith(("lich", "heit")):
        if n - 4 >= p2:
            word = word[:-4]
            if word.endswith(("er", "en")) and len(word) - 2 >= p1:
                word = word[:-2]
    elif word.endswith("keit"):
        if n - 4 >= p2:
            word = word[:-4]
            if word.endswith("lich") and len(word) - 4 >= p2:
                word = word[:-4]
            elif word.endswith("ig") and len(word) - 2 >= p2:
                word = word[:-2]

    # ---- postlude ----------------------------------------------------
    return (word.replace("Y", "y").replace("U", "u")
                .replace("\xe4", "a").replace("\xf6", "o")
                .replace("\xfc", "u"))


# ------------------------------------------------------- Scandinavian
# Swedish / Danish / Norwegian share the R1 shape (first non-vowel
# after a vowel, floored at 3) and a step-1 suffix list + s-ending
# discipline; they differ in the lists and the small steps 2/3.

def _r1_scandi(word: str, vowels: set) -> int:
    n = len(word)
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    p1 = i + 1 if i < n else n
    return max(p1, 3) if n >= 3 else n


_SV_VOWELS = set("aeiouy\xe4\xe5\xf6")          # a e i o u y ä å ö
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_STEP1 = sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
     "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
     "ast"], key=len, reverse=True)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    """Snowball Swedish (swedish.sbl): step-1 suffix list + s-ending,
    step-2 consonant-pair undouble, step-3 residuals."""
    word = word.lower()
    p1 = _r1_scandi(word, _SV_VOWELS)
    # step 1: longest suffix in R1 from the list, else s after s-ending
    for suf in _SV_STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            word = word[:len(word) - len(suf)]
            break
    else:
        if word.endswith("s") and len(word) - 1 >= p1 and len(word) >= 2 \
                and word[-2] in _SV_S_END:
            word = word[:-1]
    # step 2: ends with one of the pairs (in R1) -> drop last letter
    if len(word) - 2 >= p1 and word[-2:] in _SV_STEP2:
        word = word[:-1]
    # step 3: in R1, lig/ig/els delete; löst->lös; fullt->full
    if word.endswith("lig") and len(word) - 3 >= p1:
        word = word[:-3]
    elif word.endswith("els") and len(word) - 3 >= p1:
        word = word[:-3]
    elif word.endswith("ig") and len(word) - 2 >= p1:
        word = word[:-2]
    elif word.endswith("l\xf6st") and len(word) - 4 >= p1 - 3:
        # löst -> lös requires the suffix start in R1? spec: replace if
        # in R1 (the whole 'löst' in R1)
        if len(word) - 4 >= p1:
            word = word[:-1]
    elif word.endswith("fullt") and len(word) - 5 >= p1:
        word = word[:-1]
    return word


_DA_VOWELS = set("aeiouy\xe6\xe5\xf8")          # a e i o u y æ å ø
_DA_S_END = set("abcdfghjklmnoprtvyz\xe5")
_DA_STEP1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret"],
    key=len, reverse=True)


def danish_stem(word: str) -> str:
    """Snowball Danish (danish.sbl): step-1 list + s-ending, step-2
    consonant-pair, step-3 igst/ig/lig/elig/els + løst, step-4
    undouble."""
    word = word.lower()
    p1 = _r1_scandi(word, _DA_VOWELS)
    for suf in _DA_STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            word = word[:len(word) - len(suf)]
            break
    else:
        if word.endswith("s") and len(word) - 1 >= p1 and len(word) >= 2 \
                and word[-2] in _DA_S_END:
            word = word[:-1]
    # step 2: gd dt gt kt (pair ENTIRELY in R1 — setlimit semantics)
    def _pair(w: str) -> str:
        if len(w) - 2 >= p1 and w[-2:] in ("gd", "dt", "gt", "kt"):
            return w[:-1]
        return w
    word = _pair(word)
    # step 3: igst -> ig (unconditional), then longest of
    # ig/lig/elig/els (delete + repeat pair) | løst -> løs, in R1
    if word.endswith("igst"):
        word = word[:-2]
    for suf in ("elig", "l\xf8st", "lig", "els", "ig"):
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            if suf == "l\xf8st":
                word = word[:-1]
            else:
                word = _pair(word[:len(word) - len(suf)])
            break
    # step 4 (undouble): double consonant at the end, last char in R1
    if len(word) >= 2 and len(word) - 1 >= p1 and word[-1] == word[-2] \
            and word[-1] not in _DA_VOWELS:
        word = word[:-1]
    return word


_NO_VOWELS = set("aeiouy\xe6\xe5\xf8")
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_STEP1 = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast"],
    key=len, reverse=True)
_NO_STEP3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"], key=len, reverse=True)


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian (norwegian.sbl): step-1 list + s-ending (s
    also valid after k-preceded-by-non-vowel) + erte/ert -> er,
    step-2 dt/vt, step-3 derivational list."""
    word = word.lower()
    p1 = _r1_scandi(word, _NO_VOWELS)
    done = False
    # erte/ert (-> er) compete in the SAME longest-match among as the
    # delete list (setlimit semantics: only suffixes fully in R1 match)
    for suf in sorted(_NO_STEP1 + ["erte", "ert"], key=len, reverse=True):
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            if suf in ("erte", "ert"):
                word = word[:len(word) - len(suf)] + "er"
            else:
                word = word[:len(word) - len(suf)]
            done = True
            break
    if not done and word.endswith("s") and len(word) - 1 >= p1 \
            and len(word) >= 2:
        prev = word[-2]
        ok = prev in _NO_S_END or (
            prev == "k" and len(word) >= 3
            and word[-3] not in _NO_VOWELS)
        if ok:
            word = word[:-1]
    # step 2: dt / vt (pair entirely in R1) -> drop last letter
    if len(word) - 2 >= p1 and word[-2:] in ("dt", "vt"):
        word = word[:-1]
    # step 3: derivational suffixes, delete if in R1
    for suf in _NO_STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            word = word[:len(word) - len(suf)]
            break
    return word


# ------------------------------------------------------------- French

_FR_VOWELS = set("aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9")


def _fr_regions(w: str) -> tuple[int, int, int]:
    """RV, R1, R2 per the French spec: RV after the third letter when
    the word starts with two vowels, else after the first non-initial
    vowel; par/col/tap prefixes pin RV to position 3."""
    n = len(w)
    rv = n
    if w[:3] in ("par", "col", "tap"):
        rv = 3
    elif n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        rv = 3
    else:
        for i in range(1, n):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _FR_VOWELS:
        i += 1
    while i < n and w[i] in _FR_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    j = i + 1 if i < n else n
    while j < n and w[j] not in _FR_VOWELS:
        j += 1
    while j < n and w[j] in _FR_VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return rv, p1, p2


_FR_STEP1 = sorted([
    "ance", "iqU", "isme", "able", "iste", "eux", "ances", "iqUs",
    "ismes", "ables", "istes",
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
    "logie", "logies", "usion", "ution", "usions", "utions",
    "ence", "ences", "ement", "ements", "it\xe9", "it\xe9s",
    "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
    "issement", "issements", "amment", "emment", "ment", "ments",
    "iqUe", "iqUes",
], key=len, reverse=True)

_FR_2A = sorted([
    "\xeemes", "\xeet", "\xeetes", "i", "ie", "ies", "ir", "ira",
    "irai", "iraIent", "irais", "irait", "iras", "irent", "irez",
    "iriez", "irions", "irons", "iront", "is", "issaIent", "issais",
    "issait", "issant", "issante", "issantes", "issants", "isse",
    "issent", "isses", "issez", "issiez", "issions", "issons", "it",
], key=len, reverse=True)

_FR_2B_DEL = sorted([
    "\xe9", "\xe9e", "\xe9es", "\xe9s", "\xe8rent", "er", "era",
    "erai", "eraIent", "erais", "erait", "eras", "erez", "eriez",
    "erions", "erons", "eront", "ez", "iez",
], key=len, reverse=True)

_FR_2B_E = sorted([
    "\xe2mes", "\xe2t", "\xe2tes", "a", "ai", "aIent", "ais", "ait",
    "ant", "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
], key=len, reverse=True)


def french_stem(word: str) -> str:   # noqa: C901  (spec-shaped)
    """Snowball French (french.sbl): prelude U/I/Y marking, step-1
    standard suffixes, 2a/2b verb suffixes confined to RV, residual
    steps, undouble, un-accent, postlude."""
    w = word.lower()
    # prelude: u/i between vowels -> U/I; y adjacent to a vowel -> Y;
    # u after q -> U
    c = list(w)
    n = len(c)
    # case-SENSITIVE vowel checks: a freshly marked U/I/Y is a
    # consonant and must not enable marking of its neighbour (the
    # spec's goto semantics)
    for i in range(n):
        ch = c[i]
        if ch in ("u", "i") and 0 < i < n - 1 \
                and c[i - 1] in _FR_VOWELS \
                and c[i + 1] in _FR_VOWELS:
            c[i] = ch.upper()
        elif ch == "y" and ((i > 0 and c[i - 1] in _FR_VOWELS)
                            or (i < n - 1
                                and c[i + 1] in _FR_VOWELS)):
            c[i] = "Y"
        elif ch == "u" and i > 0 and c[i - 1] == "q":
            c[i] = "U"
    w = "".join(c)
    rv, p1, p2 = _fr_regions(w)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= p1

    def in_r2(pos):
        return pos >= p2

    orig = w
    did_step1 = False
    ment_removed = False

    def ends(s):
        return w.endswith(s)

    n0 = len(w)
    # ---- step 1 (longest match; blocking like German) ---------------
    suf = next((s for s in _FR_STEP1 if ends(s)), None)
    if suf is not None:
        base = n0 - len(suf)
        if suf in ("ance", "iqUe", "isme", "able", "iste", "eux",
                   "ances", "iqUes", "ismes", "ables", "istes"):
            if in_r2(base):
                w = w[:base]
        elif suf in ("atrice", "ateur", "ation", "atrices", "ateurs",
                     "ations"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(base):
                w = w[:base] + "log"
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(base):
                w = w[:base] + "u"
        elif suf in ("ence", "ences"):
            if in_r2(base):
                w = w[:base] + "ent"
        elif suf in ("ement", "ements"):
            if in_rv(base):
                w = w[:base]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("i\xe8r") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
                elif w.endswith("I\xe8r") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif suf in ("it\xe9", "it\xe9s"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:base] + "eau"
        elif suf == "aux":
            if in_r1(base):
                w = w[:base] + "al"
        elif suf in ("euse", "euses"):
            if in_r2(base):
                w = w[:base]
            elif in_r1(base):
                w = w[:base] + "eux"
        elif suf in ("issement", "issements"):
            if in_r1(base) and base > 0 \
                    and w[base - 1] not in _FR_VOWELS:
                w = w[:base]
        elif suf == "amment":
            if in_rv(base):
                w = w[:base] + "ant"
                ment_removed = True
        elif suf == "emment":
            if in_rv(base):
                w = w[:base] + "ent"
                ment_removed = True
        elif suf in ("ment", "ments"):
            if base > 0 and w[base - 1].lower() in _FR_VOWELS \
                    and in_rv(base - 1):
                w = w[:base]
                ment_removed = True
    did_step1 = w != orig

    # ---- steps 2a / 2b (confined to RV) -----------------------------
    did_2a = did_2b = False
    if not did_step1 or ment_removed:
        before = w
        suf = next((s for s in _FR_2A
                    if w.endswith(s) and len(w) - len(s) >= rv), None)
        if suf is not None:
            base = len(w) - len(suf)
            # marked U/I are non-vowels (case-sensitive membership)
            if base > 0 and base - 1 >= rv \
                    and w[base - 1] not in _FR_VOWELS:
                w = w[:base]
        did_2a = w != before
        if not did_2a:
            before = w
            cands = ([("ions", "ions")]
                     + [(s, "del") for s in _FR_2B_DEL]
                     + [(s, "e") for s in _FR_2B_E])
            cands.sort(key=lambda t: -len(t[0]))
            for s, kind in cands:
                if w.endswith(s) and len(w) - len(s) >= rv:
                    base = len(w) - len(s)
                    if kind == "ions":
                        if in_r2(base):
                            w = w[:base]
                    elif kind == "del":
                        w = w[:base]
                    else:
                        w = w[:base]
                        if w.endswith("e") and len(w) - 1 >= rv:
                            w = w[:-1]
                    break
            did_2b = w != before

    # ---- step 3 / step 4 --------------------------------------------
    if did_step1 or did_2a or did_2b:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("\xe7"):
            w = w[:-1] + "c"
    else:
        # step 4: residual suffixes
        if w.endswith("s") and len(w) >= 2 \
                and w[-2].lower() not in "aiou\xe8s" and w[-2] != "H":
            w = w[:-1]
        nw = len(w)
        if w.endswith("ion") and nw - 3 >= rv and in_r2(nw - 3) \
                and nw >= 4 and w[nw - 4] in "st":
            w = w[:-3]
        else:
            done4 = False
            for s in ("i\xe8re", "I\xe8re", "ier", "Ier"):
                if w.endswith(s) and len(w) - len(s) >= rv:
                    w = w[:len(w) - len(s)] + "i"
                    done4 = True
                    break
            if not done4:
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
                elif w.endswith("\xeb") and len(w) - 1 >= rv \
                        and w[:-1].endswith("gu"):
                    w = w[:-1]

    # ---- step 5 (undouble) ------------------------------------------
    for s in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(s):
            w = w[:-1]
            break

    # ---- step 6 (un-accent) -----------------------------------------
    i = len(w) - 1
    seen_nonv = False
    while i >= 0:
        if w[i] in _FR_VOWELS:      # marked U/I/Y count as non-vowels
            break
        seen_nonv = True
        i -= 1
    if seen_nonv and i >= 0 and w[i] in ("\xe9", "\xe8"):
        w = w[:i] + "e" + w[i + 1:]

    # ---- postlude ----------------------------------------------------
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ------------------------------------------------------------ Spanish

_ES_VOWELS = set("aeiou\xe1\xe9\xed\xf3\xfa\xfc")


def _es_regions(w: str) -> tuple[int, int, int]:
    """RV per the Spanish/Portuguese rule: consonant-second -> after the
    next vowel; vowel-vowel start -> after the next consonant; else
    after the third letter."""
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in _ES_VOWELS:
            for i in range(2, n):
                if w[i] in _ES_VOWELS:
                    rv = i + 1
                    break
        elif w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
            for i in range(2, n):
                if w[i] not in _ES_VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3 if n >= 3 else n
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _ES_VOWELS:
        i += 1
    while i < n and w[i] in _ES_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    j = i + 1 if i < n else n
    while j < n and w[j] not in _ES_VOWELS:
        j += 1
    while j < n and w[j] in _ES_VOWELS:
        j += 1
    if j < n:
        p2 = j + 1
    return rv, p1, p2


_ES_PRON = sorted(["me", "se", "sela", "selo", "selas", "selos", "la",
                   "le", "lo", "las", "les", "los", "nos"],
                  key=len, reverse=True)
_ES_PRE_A = sorted(["i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r", "\xedr"],
                   key=len, reverse=True)
_ES_PRE_B = sorted(["iendo", "ando", "ar", "er", "ir"],
                   key=len, reverse=True)
_ES_ACCENT_FIX = {"i\xe9ndo": "iendo", "\xe1ndo": "ando",
                  "\xe1r": "ar", "\xe9r": "er", "\xedr": "ir"}

_ES_S1_DEL = ["anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
              "ismos", "able", "ables", "ible", "ibles", "ista",
              "istas", "oso", "osa", "osos", "osas", "amiento",
              "amientos", "imiento", "imientos"]
_ES_S1_ADOR = ["adora", "ador", "aci\xf3n", "adoras", "adores",
               "aciones", "ante", "antes", "ancia", "ancias"]
_ES_2B_LONG = sorted([
    "ar\xedan", "ar\xedas", "ar\xe1n", "ar\xe1s", "ar\xedais",
    "ar\xeda", "ar\xe9is", "ar\xedamos", "aremos", "ar\xe1", "ar\xe9",
    "er\xedan", "er\xedas", "er\xe1n", "er\xe1s", "er\xedais",
    "er\xeda", "er\xe9is", "er\xedamos", "eremos", "er\xe1", "er\xe9",
    "ir\xedan", "ir\xedas", "ir\xe1n", "ir\xe1s", "ir\xedais",
    "ir\xeda", "ir\xe9is", "ir\xedamos", "iremos", "ir\xe1", "ir\xe9",
    "aba", "ada", "ida", "\xeda", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "\xedan", "aran",
    "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido", "ando",
    "iendo", "i\xf3", "ar", "er", "ir", "as", "abas", "adas", "idas",
    "\xedas", "aras", "ieras", "ases", "ieses", "\xeds", "\xe1is",
    "abais", "\xedais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "\xe1bamos",
    "\xedamos", "imos", "\xe1ramos", "i\xe9ramos", "i\xe9semos",
    "\xe1semos"], key=len, reverse=True)


def spanish_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Spanish (spanish.sbl): attached-pronoun step 0, step-1
    standard suffixes, verb steps 2a/2b in RV, residual step 3,
    accent removal."""
    w = word.lower()
    rv, p1, p2 = _es_regions(w)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= p1

    def in_r2(pos):
        return pos >= p2

    # ---- step 0: attached pronoun -----------------------------------
    pron = next((p for p in _ES_PRON if w.endswith(p)), None)
    if pron is not None:
        base = len(w) - len(pron)
        head = w[:base]
        pre_a = next((p for p in _ES_PRE_A if head.endswith(p)), None)
        pre_b = next((p for p in _ES_PRE_B if head.endswith(p)), None)
        if pre_a is not None and in_rv(base - len(pre_a)):
            w = head[:-len(pre_a)] + _ES_ACCENT_FIX[pre_a]
        elif pre_b is not None and in_rv(base - len(pre_b)):
            w = head
        elif head.endswith("yendo") and len(head) >= 6 \
                and head[-6] == "u" and in_rv(base - 5):
            w = head

    # ---- step 1 ------------------------------------------------------
    orig = w
    n0 = len(w)
    all_s1 = sorted(_ES_S1_DEL + _ES_S1_ADOR
                    + ["log\xeda", "log\xedas", "uci\xf3n", "uciones",
                       "encia", "encias", "amente", "mente", "idad",
                       "idades", "iva", "ivo", "ivas", "ivos"],
                    key=len, reverse=True)
    suf = next((s for s in all_s1 if w.endswith(s)), None)
    if suf is not None:
        base = n0 - len(suf)
        if suf in _ES_S1_DEL:
            if in_r2(base):
                w = w[:base]
        elif suf in _ES_S1_ADOR:
            if in_r2(base):
                w = w[:base]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("log\xeda", "log\xedas"):
            if in_r2(base):
                w = w[:base] + "log"
        elif suf in ("uci\xf3n", "uciones"):
            if in_r2(base):
                w = w[:base] + "u"
        elif suf in ("encia", "encias"):
            if in_r2(base):
                w = w[:base] + "ente"
        elif suf == "amente":
            if in_r1(base):
                w = w[:base]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) \
                        and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r2(base):
                w = w[:base]
                if w.endswith(("ante", "able", "ible")) \
                        and in_r2(len(w) - 4):
                    w = w[:-4]
        elif suf in ("idad", "idades"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
    did1 = w != orig

    # ---- steps 2a / 2b ----------------------------------------------
    if not did1:
        before = w
        for s in sorted(["ya", "ye", "yan", "yen", "yeron", "yendo",
                         "yo", "y\xf3", "yas", "yes", "yais", "yamos"],
                        key=len, reverse=True):
            if w.endswith(s) and len(w) - len(s) >= rv \
                    and len(w) - len(s) >= 1 \
                    and w[len(w) - len(s) - 1] == "u":
                w = w[:len(w) - len(s)]
                break
        if w == before:
            # 2b: ONE longest-match among; the short en/es/éis/emos
            # branch additionally strips a preceding gu's u
            cands = ([(x, True) for x in
                      ("en", "es", "\xe9is", "emos")]
                     + [(x, False) for x in _ES_2B_LONG])
            cands.sort(key=lambda t: -len(t[0]))
            for s, gu in cands:
                if w.endswith(s) and len(w) - len(s) >= rv:
                    w = w[:len(w) - len(s)]
                    if gu and w.endswith("gu"):
                        w = w[:-1]
                    break

    # ---- step 3: residual -------------------------------------------
    nw = len(w)
    if w.endswith(("os",)) and nw - 2 >= rv:
        w = w[:-2]
    elif nw >= 1 and w[-1] in ("a", "o", "\xe1", "\xed", "\xf3") \
            and nw - 1 >= rv:
        w = w[:-1]
    elif nw >= 1 and w[-1] in ("e", "\xe9") and nw - 1 >= rv:
        w = w[:-1]
        if w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]
    # accent removal
    return (w.replace("\xe1", "a").replace("\xe9", "e")
             .replace("\xed", "i").replace("\xf3", "o")
             .replace("\xfa", "u"))


# ------------------------------------------------------------ Italian

_IT_VOWELS = set("aeiou\xe0\xe8\xec\xf2\xf9")

_IT_PRON = sorted(
    ["ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
     "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
     "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
     "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
     "veli", "velo", "vene"], key=len, reverse=True)

_IT_S1_DEL = ["anza", "anze", "ico", "ici", "ica", "ice", "iche",
              "ichi", "ismo", "ismi", "abile", "abili", "ibile",
              "ibili", "ista", "iste", "isti", "ist\xe0", "ist\xe8",
              "ist\xec", "oso", "osi", "osa", "ose", "mente",
              "atrice", "atrici", "ante", "anti"]
_IT_S2 = sorted([
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "er\xe0", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "er\xf2",
    "erono", "essero", "ete", "eva", "evamo", "evano", "evate",
    "evi", "evo", "Yamo", "iamo", "immo", "ir\xe0", "irai",
    "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo",
    "iremo", "ireste", "iresti", "irete", "ir\xf2", "irono",
    "isca", "iscano", "isce", "isci", "isco", "iscono", "issero",
    "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate",
    "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir"],
    key=len, reverse=True)


def italian_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Italian (italian.sbl): acute->grave, U/I marking,
    attached-pronoun step 0, step 1, verb step 2, vowel/ch residuals."""
    w = word.lower()
    for a, b in (("\xe1", "\xe0"), ("\xe9", "\xe8"), ("\xed", "\xec"),
                 ("\xf3", "\xf2"), ("\xfa", "\xf9")):
        w = w.replace(a, b)
    c = list(w)
    n = len(c)
    for i in range(n):
        ch = c[i]
        if ch in ("u", "i") and 0 < i < n - 1 \
                and c[i - 1] in _IT_VOWELS and c[i + 1] in _IT_VOWELS:
            c[i] = ch.upper()
        elif ch == "u" and i > 0 and c[i - 1] == "q":
            c[i] = "U"
    w = "".join(c)

    # regions: same construction as Spanish
    rv, p1, p2 = _es_regions_generic(w, _IT_VOWELS)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= p1

    def in_r2(pos):
        return pos >= p2

    # ---- step 0: attached pronoun -----------------------------------
    pron = next((p for p in _IT_PRON if w.endswith(p)), None)
    if pron is not None:
        base = len(w) - len(pron)
        head = w[:base]
        if (head.endswith(("ando", "endo"))
                and in_rv(base - 4)):
            w = head
        else:
            for pre in ("ar", "er", "ir"):
                if head.endswith(pre) and in_rv(base - 2):
                    w = head + "e"
                    break

    # ---- step 1 ------------------------------------------------------
    orig = w
    all_s1 = sorted(_IT_S1_DEL
                    + ["azione", "azioni", "atore", "atori", "logia",
                       "logie", "uzione", "uzioni", "usione", "usioni",
                       "enza", "enze", "amento", "amenti", "imento",
                       "imenti", "amente", "it\xe0", "ivo", "ivi",
                       "iva", "ive"], key=len, reverse=True)
    suf = next((s for s in all_s1 if w.endswith(s)), None)
    if suf is not None:
        base = len(w) - len(suf)
        if suf in _IT_S1_DEL:
            if in_r2(base):
                w = w[:base]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(base):
                w = w[:base] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(base):
                w = w[:base] + "u"
        elif suf in ("enza", "enze"):
            if in_r2(base):
                w = w[:base] + "ente"
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(base):
                w = w[:base]
        elif suf == "amente":
            if in_r1(base):
                w = w[:base]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("os", "ic")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf == "it\xe0":
            if in_r2(base):
                w = w[:base]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
    did1 = w != orig

    # ---- step 2 (only if step 1 removed nothing) --------------------
    if not did1:
        for s in _IT_S2:
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[:len(w) - len(s)]
                break

    # ---- step 3a: final vowel (then a preceding i), in RV ------------
    if len(w) >= 1 and w[-1] in "aeio\xe0\xe8\xec\xf2" \
            and len(w) - 1 >= rv:
        w = w[:-1]
        if len(w) >= 1 and w[-1] == "i" and len(w) - 1 >= rv:
            w = w[:-1]
    # ---- step 3b: ch/gh -> c/g (whole digraph in RV) ----------------
    if w.endswith(("ch", "gh")) and len(w) - 2 >= rv:
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


def _es_regions_generic(w: str, vowels: set) -> tuple[int, int, int]:
    """The Spanish/Italian/Portuguese RV + R1/R2 construction with a
    parameterized vowel set."""
    n = len(w)
    rv = n
    if n >= 2:
        if w[1] not in vowels:
            for i in range(2, n):
                if w[i] in vowels:
                    rv = i + 1
                    break
        elif w[0] in vowels and w[1] in vowels:
            for i in range(2, n):
                if w[i] not in vowels:
                    rv = i + 1
                    break
        else:
            rv = 3 if n >= 3 else n
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i < n:
        p1 = i + 1
    j = i + 1 if i < n else n
    while j < n and w[j] not in vowels:
        j += 1
    while j < n and w[j] in vowels:
        j += 1
    if j < n:
        p2 = j + 1
    return rv, p1, p2


# --------------------------------------------------------- Portuguese

_PT_VOWELS = set("aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4")

_PT_S2 = sorted([
    "ada", "ida", "ia", "aria", "eria", "iria", "ar\xe1", "ara",
    "er\xe1", "era", "ir\xe1", "ava", "asse", "esse", "isse", "aste",
    "este", "iste", "ei", "arei", "erei", "irei", "am", "iam",
    "ariam", "eriam", "iriam", "aram", "eram", "iram", "avam", "em",
    "arem", "erem", "irem", "assem", "essem", "issem", "ado", "ido",
    "ando", "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er",
    "ir", "as", "adas", "idas", "ias", "arias", "erias", "irias",
    "ar\xe1s", "aras", "er\xe1s", "eras", "ir\xe1s", "avas", "es",
    "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "\xe1veis", "\xedeis",
    "ar\xedeis", "er\xedeis", "ir\xedeis", "\xe1ramos", "\xe9ramos",
    "\xedramos", "\xe1vamos", "amos", "ar\xedamos", "er\xedamos",
    "ir\xedamos", "aremos", "eremos", "iremos", "\xe1ssemos",
    "\xeassemos", "\xedssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ados", "idos", "emos", "ira", "iras",
    "\xedamos"],
    key=len, reverse=True)


def portuguese_stem(word: str) -> str:   # noqa: C901  (spec-shaped)
    """Snowball Portuguese (portuguese.sbl): nasal-vowel marking
    (ã/õ -> a~/o~), step-1 standard suffixes, verb step 2 in RV,
    residual steps 3/4/5, cedilla."""
    w = word.lower().replace("\xe3", "a~").replace("\xf5", "o~")
    rv, p1, p2 = _es_regions_generic(w, _PT_VOWELS)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= p1

    def in_r2(pos):
        return pos >= p2

    orig = w
    s1_del = ["eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
              "ismos", "\xe1vel", "\xedvel", "ista", "istas", "oso",
              "osa", "osos", "osas", "amento", "amentos", "imento",
              "imentos"]
    s1_ador = ["adora", "ador", "a\xe7a~o", "adoras", "adores",
               "a\xe7o~es", "ante", "antes", "\xe2ncia"]
    all_s1 = sorted(s1_del + s1_ador
                    + ["logia", "logias",
                       "\xeancia", "\xeancias", "amente", "mente",
                       "idade", "idades", "iva", "ivo", "ivas",
                       "ivos", "ira", "iras"], key=len, reverse=True)
    suf = next((s for s in all_s1 if w.endswith(s)), None)
    if suf is not None:
        base = len(w) - len(suf)
        if suf in s1_del:
            if in_r2(base):
                w = w[:base]
        elif suf in s1_ador:
            # unlike Spanish, Portuguese has no ic- sub-rule here
            # (comunicação -> comunic)
            if in_r2(base):
                w = w[:base]
        elif suf in ("logia", "logias"):
            if in_r2(base):
                w = w[:base] + "log"
        elif suf in ("\xeancia", "\xeancias"):
            if in_r2(base):
                w = w[:base] + "ente"
        elif suf == "amente":
            if in_r1(base):
                w = w[:base]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) \
                        and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r2(base):
                w = w[:base]
                if w.endswith(("ante", "avel")) and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith("\xedvel") and in_r2(len(w) - 4):
                    w = w[:-4]
        elif suf in ("idade", "idades"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(base):
                w = w[:base]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ira", "iras"):
            if in_rv(base) and base > 0 and w[base - 1] == "e":
                w = w[:base] + "ir"
    did1 = w != orig

    # ---- step 2: verb suffixes (only if step 1 did nothing) ---------
    did2 = False
    if not did1:
        for s in _PT_S2:
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[:len(w) - len(s)]
                did2 = True
                break

    # ---- step 3: trailing i after c, if steps 1/2 fired -------------
    if (did1 or did2) and w.endswith("i") and len(w) - 1 >= rv \
            and len(w) >= 2 and w[-2] == "c":
        w = w[:-1]
    # ---- step 4: residual suffix (only if steps 1&2 did nothing) ----
    if not did1 and not did2:
        for s in ("os", "a", "i", "o", "\xe1", "\xed", "\xf3"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[:len(w) - len(s)]
                break
    # ---- step 5 ------------------------------------------------------
    if w.endswith(("e", "\xe9", "\xea")) and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith(("gu", "ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("\xe7"):
        w = w[:-1] + "c"
    return w.replace("a~", "\xe3").replace("o~", "\xf5")


# ------------------------------------------------------------ Russian

_RU_VOWELS = set("аеиоуыэюя")

# group-1 endings require a preceding а/я (which stays); group-2 do not
_RU_GERUND_1 = ["в", "вши", "вшись"]
_RU_GERUND_2 = ["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"]
_RU_ADJ = ["ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
           "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
           "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею"]
_RU_PART_1 = ["ем", "нн", "вш", "ющ", "щ"]
_RU_PART_2 = ["ивш", "ывш", "ующ"]
_RU_VERB_1 = ["ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
              "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно"]
_RU_VERB_2 = ["ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
              "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило",
              "ыло", "ено", "ят", "ует", "уют", "ит", "ыт", "ены",
              "ить", "ыть", "ишь", "ую", "ю"]
_RU_NOUN = ["а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами",
            "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям",
            "ям", "ием", "ем", "ам", "ом", "о", "у", "ах", "иях",
            "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я"]


def _ru_longest(w: str, rv: int, g1: list, g2: list) -> int:
    """Length to strip for the longest matching ending in RV: group-2
    endings match plainly; group-1 need a preceding а/я (kept). -1 if
    none. Snowball's among treats both groups as ONE longest-match
    (the а/я is part of the pattern for group 1)."""
    best = -1
    for s in g2:
        if w.endswith(s) and len(w) - len(s) >= rv and len(s) > best:
            best = len(s)
    for s in g1:
        # the а/я test char must ALSO lie inside RV (setlimit boundary)
        if w.endswith(s) and len(w) - len(s) - 1 >= rv \
                and w[len(w) - len(s) - 1] in "ая" \
                and len(s) + 1 > best:
            # match length counts the а/я, but only the suffix strips
            best = len(s)
    return best


def russian_stem(word: str) -> str:
    """Snowball Russian (russian.sbl): ё->е, perfective-gerund step,
    reflexive, adjectival/verb/noun cascade, -и, -ость, tidy-up."""
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    j = i + 1 if i < n else n
    while j < n and w[j] not in _RU_VOWELS:
        j += 1
    while j < n and w[j] in _RU_VOWELS:
        j += 1
    if j < n:
        p2 = j + 1

    # ---- step 1 ------------------------------------------------------
    g = _ru_longest(w, rv, _RU_GERUND_1, _RU_GERUND_2)
    if g > 0:
        w = w[:len(w) - g]
    else:
        for refl in ("ся", "сь"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        # adjectival: adjective ending, optionally preceded by a
        # participle ending
        adj = -1
        for s in _RU_ADJ:
            if w.endswith(s) and len(w) - len(s) >= rv \
                    and len(s) > adj:
                adj = len(s)
        if adj > 0:
            w = w[:len(w) - adj]
            pt = _ru_longest(w, rv, _RU_PART_1, _RU_PART_2)
            if pt > 0:
                w = w[:len(w) - pt]
        else:
            vb = _ru_longest(w, rv, _RU_VERB_1, _RU_VERB_2)
            if vb > 0:
                w = w[:len(w) - vb]
            else:
                nn = -1
                for s in _RU_NOUN:
                    if w.endswith(s) and len(w) - len(s) >= rv \
                            and len(s) > nn:
                        nn = len(s)
                if nn > 0:
                    w = w[:len(w) - nn]

    # ---- step 2: final и --------------------------------------------
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # ---- step 3: derivational, in R2 --------------------------------
    for s in ("ость", "ост"):
        if w.endswith(s) and len(w) - len(s) >= p2:
            w = w[:len(w) - len(s)]
            break
    # ---- step 4: tidy up --------------------------------------------
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        done = False
        for s in ("ейше", "ейш"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[:len(w) - len(s)]
                done = True
                break
        if done and w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# -------------------------------------------------------------- Dutch

_NL_VOWELS = set("aeiouy\xe8")


def dutch_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Dutch (dutch.sbl): accent strip, Y/I marking, en/s
    suffix steps with en-/s-ending guards and undoubling, d-suffixes,
    vowel undouble."""
    w = word.lower()
    for a, b in (("\xe4", "a"), ("\xe1", "a"), ("\xeb", "e"),
                 ("\xe9", "e"), ("\xef", "i"), ("\xed", "i"),
                 ("\xf6", "o"), ("\xf3", "o"), ("\xfc", "u"),
                 ("\xfa", "u")):
        w = w.replace(a, b)
    c = list(w)
    n = len(c)
    for i in range(n):
        if c[i] == "y" and (i == 0 or c[i - 1] in _NL_VOWELS):
            c[i] = "Y"
        elif c[i] == "i" and 0 < i < n - 1 and c[i - 1] in _NL_VOWELS \
                and c[i + 1] in _NL_VOWELS:
            c[i] = "I"
    w = "".join(c)

    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _NL_VOWELS:
        i += 1
    while i < n and w[i] in _NL_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    if p1 < 3:
        p1 = 3 if n >= 3 else n
    j = i + 1 if i < n else n
    while j < n and w[j] not in _NL_VOWELS:
        j += 1
    while j < n and w[j] in _NL_VOWELS:
        j += 1
    if j < n:
        p2 = j + 1

    def undouble(x: str) -> str:
        return x[:-1] if x.endswith(("kk", "dd", "tt")) else x

    # ---- step 1 ------------------------------------------------------
    nw = len(w)
    if w.endswith("heden"):
        if nw - 5 >= p1:
            w = w[:-5] + "heid"
    elif w.endswith(("ene", "en")):
        ln = 3 if w.endswith("ene") else 2
        base = nw - ln
        if base >= p1 and base > 0 and w[base - 1] not in _NL_VOWELS \
                and w[max(0, base - 3):base] != "gem":
            w = undouble(w[:base])
    elif w.endswith(("se", "s")):
        ln = 2 if w.endswith("se") else 1
        base = nw - ln
        if base >= p1 and base > 0 and w[base - 1] not in _NL_VOWELS \
                and w[base - 1] != "j":
            w = w[:base]

    # ---- step 2: final e after non-vowel ----------------------------
    e_found = False
    if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = undouble(w[:-1])
        e_found = True

    # ---- step 3a: heid ----------------------------------------------
    if w.endswith("heid") and len(w) - 4 >= p2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            base = len(w) - 2
            if base >= p1 and base > 0 \
                    and w[base - 1] not in _NL_VOWELS \
                    and w[max(0, base - 3):base] != "gem":
                w = undouble(w[:base])

    # ---- step 3b: d-suffixes ----------------------------------------
    nw = len(w)
    if w.endswith(("end", "ing")) and nw - 3 >= p2:
        w = w[:-3]
        if w.endswith("ig") and len(w) - 2 >= p2 \
                and not w.endswith("eig"):
            w = w[:-2]
        else:
            w = undouble(w)
    elif w.endswith("ig") and nw - 2 >= p2 and not w.endswith("eig"):
        w = w[:-2]
    elif w.endswith("lijk") and nw - 4 >= p2:
        w = w[:-4]
        # repeat step 2
        if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = undouble(w[:-1])
    elif w.endswith("baar") and nw - 4 >= p2:
        w = w[:-4]
    elif w.endswith("bar") and nw - 3 >= p2 and e_found:
        w = w[:-3]

    # ---- step 4: undouble vowel (CVVC, last not I) -------------------
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]
    return w.replace("Y", "y").replace("I", "i")


def german2_stem(word: str) -> str:
    """Snowball German2 (german2.sbl): as German, but the typewriter
    digraphs ae/oe/ue are folded to umlauts in the prelude (ue not
    after q), so Haeuser and Häuser stem identically."""
    word = word.lower().replace("\xdf", "ss")
    if len(word) <= 2:
        return (word.replace("\xe4", "a").replace("\xf6", "o")
                    .replace("\xfc", "u"))
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        elif chars[i] == "y" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    out = []
    i = 0
    while i < len(w):
        two = w[i:i + 2]
        if two == "qu":
            # the spec's 'qu' branch hops TWO chars past the match, so
            # any digraph immediately after qu survives (quae -> quae)
            out.append(w[i:i + 4])
            i += 4
        elif two == "ae":
            out.append("\xe4")
            i += 2
        elif two == "oe":
            out.append("\xf6")
            i += 2
        elif two == "ue":
            out.append("\xfc")
            i += 2
        else:
            out.append(w[i])
            i += 1
    return _german_core("".join(out))


# ----------------------------------------------------------- Romanian

_RO_VOWELS = set("aă\xe2ei\xeeou")        # a ă â e i î o u

_RO_STEP0 = [
    ("ului", "", None), ("ul", "", None), ("aua", "a", None),
    ("elor", "e", None), ("ele", "e", None), ("ea", "e", None),
    ("iilor", "i", None), ("iile", "i", None), ("iei", "i", None),
    ("iua", "i", None), ("ii", "i", None), ("ilor", "i", None),
    ("ile", "i", "not_ab"), ("atei", "at", None),
    ("aţie", "aţi", None), ("aţia", "aţi", None),
]

_RO_COMBO = [
    ("abilitate", "abil"), ("abilitati", "abil"),
    ("abilităi", "abil"), ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"), ("ical", "ic"), ("icala", "ic"),
    ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"),
    ("ator", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ător", "at"),
    ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"),
    ("itor", "it"), ("itori", "it"),
]

_RO_S2_DEL = ["at", "ata", "ată", "ati", "ate", "ut", "uta",
              "ută", "uti", "ute", "it", "ita", "ită",
              "iti", "ite", "ic", "ica", "ice", "ici", "ică",
              "abil", "abila", "abile", "abili", "abilă",
              "ibil", "ibila", "ibile", "ibili", "ibilă",
              "oasa", "oasă", "oase", "os", "osi", "oşi",
              "ant", "anta", "ante", "anti", "antă",
              "ator", "atori", "itate", "itati", "ităi",
              "ităţi", "iv", "iva", "ive", "ivi",
              "ivă"]
_RO_S2_IST = ["ism", "isme", "ist", "ista", "iste", "isti",
              "istă", "işti"]

_RO_VERB_A = ["are", "ere", "ire", "\xe2re", "ind", "\xe2nd", "indu",
              "\xe2ndu", "eze", "ească", "ez", "ezi",
              "ează", "esc", "eşti", "eşte",
              "ăsc", "ăşti", "ăşte", "am",
              "ai", "au", "eam", "eai", "ea", "eaţi", "eau",
              "iam", "iai", "ia", "iaţi", "iau", "ui",
              "aşi", "arăm", "arăţi",
              "ară", "uşi", "urăm",
              "urăţi", "ură", "işi",
              "irăm", "irăţi", "iră", "\xe2i",
              "\xe2şi", "\xe2răm", "\xe2răţi",
              "\xe2ră"]
_RO_VERB_B = ["ăm", "aţi", "em", "eţi", "im",
              "iţi", "\xe2m", "\xe2ţi", "seşi",
              "serăm", "serăţi", "seră", "sei",
              "se", "sesem", "seseşi", "sese",
              "seserăm", "seserăţi", "seseră"]
# the a/i/â/u + se(m/şi/răm/răţi/ră) past-perfect family carries the
# group-A precondition (consonant-or-u inside RV before the suffix)
_RO_VERB_A = _RO_VERB_A + [
    "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
    "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
    "\xe2sem", "\xe2seşi", "\xe2se", "\xe2serăm",
    "\xe2serăţi", "\xe2seră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră"]


def romanian_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Romanian (romanian.sbl): I/U marking, plural/article
    step 0, repeated combining-suffix reduction, standard suffixes,
    verb suffixes in RV, final-vowel removal."""
    w = word.lower()
    c = list(w)
    n = len(c)
    for i in range(n):
        if c[i] in ("i", "u") and 0 < i < n - 1 \
                and c[i - 1] in _RO_VOWELS and c[i + 1] in _RO_VOWELS:
            c[i] = c[i].upper()
    w = "".join(c)
    rv, p1, p2 = _es_regions_generic(w, _RO_VOWELS)

    # ---- step 0 (in R1) ---------------------------------------------
    best = None
    for suf, rep, cond in _RO_STEP0:
        if w.endswith(suf) and len(w) - len(suf) >= p1 \
                and (best is None or len(suf) > len(best[0])):
            best = (suf, rep, cond)
    if best is not None:
        suf, rep, cond = best
        base = len(w) - len(suf)
        if not (cond == "not_ab" and w[:base].endswith("ab")):
            w = w[:base] + rep

    # ---- step 1: repeat combining suffixes (in R1) ------------------
    removed = False
    while True:
        hit = None
        for suf, rep in _RO_COMBO:
            if w.endswith(suf) and len(w) - len(suf) >= p1 \
                    and (hit is None or len(suf) > len(hit[0])):
                hit = (suf, rep)
        if hit is None:
            break
        w = w[:len(w) - len(hit[0])] + hit[1]
        removed = True

    # ---- step 2: standard suffixes (in R2) --------------------------
    # BLOCKING among (match longest anywhere, THEN test R2 — no
    # fallback to a shorter suffix: calitate keeps 'ate' because the
    # longer 'itate' matched outside R2)
    cands = ([(s, "del") for s in _RO_S2_DEL]
             + [(s, "ist") for s in _RO_S2_IST]
             + [("iune", "iune"), ("iuni", "iune")])
    cands.sort(key=lambda t: -len(t[0]))
    for suf, kind in cands:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if base >= p2:
                if kind == "del":
                    w = w[:base]
                    removed = True
                elif kind == "ist":
                    w = w[:base] + "ist"
                    removed = True
                elif base >= 1 and w[base - 1] == "ţ":
                    w = w[:base - 1] + "t"
                    removed = True
            break

    # ---- step 3: verb suffixes in RV (only if nothing removed) ------
    if not removed:
        best_v = None
        for s in _RO_VERB_A:
            if w.endswith(s) and len(w) - len(s) >= rv \
                    and (best_v is None or len(s) > len(best_v[0])):
                best_v = (s, "a")
        for s in _RO_VERB_B:
            if w.endswith(s) and len(w) - len(s) >= rv \
                    and (best_v is None or len(s) > len(best_v[0])):
                best_v = (s, "b")
        if best_v is not None:
            s, grp = best_v
            base = len(w) - len(s)
            if grp == "b":
                w = w[:base]
            else:
                # preceded (inside RV) by a non-vowel or by 'u'
                if base - 1 >= rv and (w[base - 1] not in _RO_VOWELS
                                       or w[base - 1] == "u"):
                    w = w[:base]

    # ---- step 4: final vowel — blocking among in RV ------------------
    # longest match first ('ie' beats 'e'); if it lies outside RV the
    # step fails entirely (anglie stays anglie; bălaIe's marked I makes
    # only 'e' match, giving bălai)
    for s in ("ie", "a", "e", "i", "ă"):
        if w.endswith(s):
            if len(w) - len(s) >= rv:
                w = w[:len(w) - len(s)]
            break
    return w.replace("I", "i").replace("U", "u")


# ------------------------------------------------------------- Finnish

_FI_VOWELS = set("aeiouy\xe4\xf6")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")


def finnish_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Finnish (finnish.sbl): particle, possessive, case,
    comparative, plural and tidy steps, all suffix tests in R1/R2.
    Case-sensitive like the reference (expects lowercase input;
    uppercase letters pass through as consonants)."""
    w = word
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _FI_VOWELS:
        i += 1
    while i < n and w[i] in _FI_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    j = i + 1 if i < n else n
    while j < n and w[j] not in _FI_VOWELS:
        j += 1
    while j < n and w[j] in _FI_VOWELS:
        j += 1
    if j < n:
        p2 = j + 1

    def in_r1(pos):
        return pos >= p1

    def in_r2(pos):
        return pos >= p2

    # ---- step 1: particles (blocking longest-match in R1) ----------
    part = sorted(["kin", "kaan", "k\xe4\xe4n", "ko", "k\xf6", "han",
                   "h\xe4n", "pa", "p\xe4", "sti"],
                  key=len, reverse=True)
    for s in part:
        if w.endswith(s):
            base = len(w) - len(s)
            if s == "sti":
                if in_r2(base):
                    w = w[:base]
            elif in_r1(base) and base > 0 \
                    and (w[base - 1] in "nt" or w[base - 1] in _FI_VOWELS):
                w = w[:base]
            break

    # ---- step 2: possessives (blocking longest-match in R1) --------
    poss = sorted(["si", "ni", "nsa", "ns\xe4", "mme", "nne", "an",
                   "\xe4n", "en"], key=len, reverse=True)
    for s in poss:
        if w.endswith(s):
            base = len(w) - len(s)
            if not in_r1(base):
                break
            if s == "si":
                if base > 0 and w[base - 1] != "k":
                    w = w[:base]
            elif s == "ni":
                w = w[:base]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif s in ("nsa", "ns\xe4", "mme", "nne"):
                w = w[:base]
            elif s == "an":
                if w[:base].endswith(("ta", "ssa", "sta", "lla",
                                      "lta", "na")):
                    w = w[:base]
            elif s == "\xe4n":
                if w[:base].endswith(("t\xe4", "ss\xe4", "st\xe4",
                                      "ll\xe4", "lt\xe4", "n\xe4")):
                    w = w[:base]
            elif s == "en":
                if w[:base].endswith(("lle", "ine")):
                    w = w[:base]
            break

    # ---- step 3: cases ----------------------------------------------
    # Mirrors the reference among semantics (ref: org/tartarus/snowball/
    # ext/FinnishStemmer.java a_6 + r_case_ending): entries den/tten/
    # siin carry a VI guard (i preceded by a V2 vowel — V2 EXCLUDES y)
    # and seen a LONG guard, both evaluated DURING matching — a failed
    # guard just skips that entry; the hXn echo-vowel, tta/e and a/ä
    # cv tests are branch conditions that BLOCK the whole step. There
    # are no hun/hyn entries in this 2010-era table (elokuuhun loses
    # only its n).
    ended = False
    _V2 = _FI_VOWELS - {"y"}
    hxn = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "h\xe4n": "\xe4", "h\xf6n": "\xf6"}
    cands = [(4, "long", "seen"), (4, "vi", "siin"), (4, "vi", "tten"),
             (3, "vi", "den")]
    for s3 in hxn:
        cands.append((3, "hxn", s3))
    for s3 in ("tta", "tt\xe4"):
        cands.append((3, "e", s3))
    for s3 in ("ssa", "ss\xe4", "sta", "st\xe4", "lla", "ll\xe4",
               "lta", "lt\xe4", "lle", "ine", "ksi", "na", "n\xe4",
               "ta", "t\xe4"):
        cands.append((len(s3), "plain", s3))
    for s3 in ("a", "\xe4"):
        cands.append((1, "cv", s3))
    cands.append((1, "n", "n"))
    cands.sort(key=lambda t: -t[0])
    for _el, kind, suf in cands:
        if not w.endswith(suf):
            continue
        base = len(w) - len(suf)
        if not in_r1(base):
            continue               # outside the setlimit: not a match
        if kind == "vi":
            # guard evaluated during matching: failure SKIPS the entry
            if not (base >= 2 and w[base - 1] == "i"
                    and w[base - 2] in _V2):
                continue
            w = w[:base]
        elif kind == "long":
            if w[:base][-2:] not in _FI_LONG:
                continue
            w = w[:base]
        elif kind == "hxn":
            if not (base > 0 and w[base - 1] == hxn[suf]):
                break              # branch condition: BLOCKS
            w = w[:base]
        elif kind == "cv":
            if not (base >= 2 and w[base - 1] in _FI_VOWELS
                    and w[base - 2] not in _FI_VOWELS):
                break
            w = w[:base]
        elif kind == "e":
            if not (base > 0 and w[base - 1] == "e"):
                break
            w = w[:base]
        elif kind == "n":
            w = w[:base]
            if w[-2:] in _FI_LONG or w.endswith("ie"):
                w = w[:-1]
        else:
            w = w[:base]
        ended = True
        break

    # ---- step 4: comparatives (blocking longest-match in R2) --------
    comp = sorted(["mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4",
                   "impi", "impa", "imp\xe4", "immi", "imma",
                   "imm\xe4", "eja", "ej\xe4"], key=len, reverse=True)
    for s in comp:
        if w.endswith(s):
            base = len(w) - len(s)
            if in_r2(base):
                if s in ("mpi", "mpa", "mp\xe4", "mmi", "mma",
                         "mm\xe4"):
                    if not w[:base].endswith("po"):
                        w = w[:base]
                else:
                    w = w[:base]
            break

    # ---- step 5: plurals --------------------------------------------
    if ended:
        if w.endswith(("i", "j")) and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= p1 and len(w) >= 2 \
                and w[-2] in _FI_VOWELS:
            w = w[:-1]
            for s2 in ("imma", "mma"):
                if w.endswith(s2) and len(w) - len(s2) >= p2:
                    if s2 == "mma" and w[:len(w) - 4].endswith("po"):
                        break
                    if s2 == "mma" and w.endswith("imma"):
                        break          # imma handled by its own entry
                    w = w[:len(w) - len(s2)]
                    break

    # ---- step 6: tidying (ALL pattern chars inside R1 — setlimit) ---
    if w[-2:] in _FI_LONG and len(w) - 2 >= p1:
        w = w[:-1]
    if len(w) >= 2 and w[-1] in "a\xe4ei" and len(w) - 2 >= p1 \
            and w[-2] not in _FI_VOWELS:
        w = w[:-1]
    if w.endswith(("oj", "uj")) and len(w) - 2 >= p1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= p1:
        w = w[:-1]
    # e) undouble final consonant before trailing vowels
    m = len(w) - 1
    while m >= 0 and w[m] in _FI_VOWELS:
        m -= 1
    if m >= 1 and w[m] == w[m - 1] and w[m] not in _FI_VOWELS:
        w = w[:m] + w[m + 1:]
    return w


# ----------------------------------------------------------- Hungarian
# Suffix tables and branch actions read off the reference's generated
# among data (ref: org/tartarus/snowball/ext/HungarianStemmer.java
# a_0..a_11 — linguistic data like the stopword lists; the Latin-1-era
# tables spell ő as õ (F5) and ű as û (FB), as does the vocabulary).

_HU_VOWELS = set("aeiou\xe1\xe9\xed\xf3\xf6\xf5\xfa\xfc\xfb")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz", "bb",
               "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
               "pp", "rr", "ss", "tt", "vv", "zz")

_HU_CASE = ["ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel",
            "ul", "n\xe1l", "n\xe9l", "b\xf3l", "r\xf3l", "t\xf3l",
            "b\xf5l", "r\xf5l", "t\xf5l", "\xfcl", "n", "an", "ban",
            "en", "ben", "k\xe9ppen", "on", "\xf6n", "k\xe9pp", "kor",
            "t", "at", "et", "k\xe9nt", "ank\xe9nt", "enk\xe9nt",
            "onk\xe9nt", "ot", "\xe9rt", "\xf6t", "hez", "hoz",
            "h\xf6z", "v\xe1", "v\xe9"]

# (suffix, replacement) — None = delete
_HU_SPECIAL = [("\xe1nk\xe9nt", "a"), ("\xe1n", "a"), ("\xe9n", "e")]
_HU_OTHER = [("astul", None), ("est\xfcl", None), ("\xe1stul", "a"),
             ("\xe9st\xfcl", "e"), ("stul", None), ("st\xfcl", None)]
_HU_OWNED = [("\xe1\xe9i", "a"), ("\xe9\xe9i", "e"), ("\xe9i", None),
             ("ak\xe9", None), ("ek\xe9", None), ("ok\xe9", None),
             ("\xf6k\xe9", None), ("\xe1k\xe9", "a"),
             ("\xe9k\xe9", "e"), ("\xe9\xe9", "e"), ("k\xe9", None),
             ("\xe9", None)]
_HU_SING = [("unk", None), ("\xe1nk", "a"), ("\xe9nk", "e"),
            ("\xfcnk", None), ("nk", None), ("\xe1juk", "a"),
            ("juk", None), ("j\xfck", None), ("\xe9j\xfck", "e"),
            ("uk", None), ("\xfck", None), ("am", None), ("em", None),
            ("om", None), ("\xe1m", "a"), ("\xe9m", "e"), ("m", None),
            ("ad", None), ("ed", None), ("od", None), ("\xf6d", None),
            ("\xe1d", "a"), ("\xe9d", "e"), ("d", None), ("ja", None),
            ("je", None), ("a", None), ("e", None), ("o", None),
            ("\xe1", "a"), ("\xe9", "e")]
_HU_PLUR_OWN = [("jaim", None), ("jeim", None), ("\xe1im", "a"),
                ("\xe9im", "e"), ("aim", None), ("eim", None),
                ("im", None), ("jaid", None), ("jeid", None),
                ("\xe1id", "a"), ("\xe9id", "e"), ("aid", None),
                ("eid", None), ("id", None), ("jai", None),
                ("jei", None), ("\xe1i", "a"), ("\xe9i", "e"),
                ("ai", None), ("ei", None), ("i", None),
                ("jaink", None), ("jeink", None), ("aink", None),
                ("eink", None), ("\xe1ink", "a"), ("\xe9ink", "e"),
                ("ink", None), ("jaitok", None), ("aitok", None),
                ("\xe1itok", "a"), ("jeitek", None), ("eitek", None),
                ("\xe9itek", "e"), ("itek", None), ("jaik", None),
                ("jeik", None), ("aik", None), ("eik", None),
                ("\xe1ik", "a"), ("\xe9ik", "e"), ("ik", None)]
_HU_PLURAL = [("\xe1k", "a"), ("\xe9k", "e"), ("\xf6k", None),
              ("ak", None), ("ok", None), ("ek", None), ("k", None)]


def _hu_p1(w: str) -> int:
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return min(i + len(d), n)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _hu_undouble(w: str) -> str:
    """Remove the second-to-last character (ccs -> cs, tt -> t)."""
    return w[:-2] + w[-1] if len(w) >= 2 else w


def hungarian_stem(word: str) -> str:    # noqa: C901  (spec-shaped)
    """Snowball Hungarian (hungarian.sbl): instrumental, case (+ final
    á/é unaccent), special/other cases, factive, owned, singular and
    plural owner, plural — each a blocking longest-match among with
    post-match R1 test."""
    w = word.lower()
    p1 = _hu_p1(w)

    def longest(table):
        best = None
        for entry in table:
            suf = entry if isinstance(entry, str) else entry[0]
            if w.endswith(suf) and (best is None or len(suf) >
                                    (len(best) if isinstance(best, str)
                                     else len(best[0]))):
                best = entry
        return best

    def ends_double(x: str) -> bool:
        return any(x.endswith(d) for d in _HU_DOUBLES)

    # instrumental: al/el after double consonant, R1, undouble
    for suf in ("al", "el"):
        if w.endswith(suf):
            base = len(w) - 2
            if base >= p1 and ends_double(w[:base]):
                w = _hu_undouble(w[:base])
            break
    # case: delete + v_ending
    hit = longest(_HU_CASE)
    if hit is not None and len(w) - len(hit) >= p1:
        w = w[:len(w) - len(hit)]
        if w.endswith("\xe1") and len(w) - 1 >= p1:
            w = w[:-1] + "a"
        elif w.endswith("\xe9") and len(w) - 1 >= p1:
            w = w[:-1] + "e"
    # remaining steps: (suffix, replacement) amongs with R1 + optional
    # double/undouble for the factive
    for table in (_HU_SPECIAL, _HU_OTHER):
        hit = longest(table)
        if hit is not None and len(w) - len(hit[0]) >= p1:
            w = w[:len(w) - len(hit[0])] + (hit[1] or "")
    # factive á/é after double consonant
    for suf in ("\xe1", "\xe9"):
        if w.endswith(suf):
            base = len(w) - 1
            if base >= p1 and ends_double(w[:base]):
                w = _hu_undouble(w[:base])
            break
    for table in (_HU_OWNED, _HU_SING, _HU_PLUR_OWN, _HU_PLURAL):
        hit = longest(table)
        if hit is not None and len(w) - len(hit[0]) >= p1:
            w = w[:len(w) - len(hit[0])] + (hit[1] or "")
    return w


# --------------------------------------------------------------- Lovins
# J. B. Lovins, "Development of a stemming algorithm" (Mechanical
# Translation 11, 1968): 294 endings gated by 29 contextual conditions,
# then undoubling and 34 respell rules. The ending->condition table is
# DATA extracted from the reference's generated among list (ref: org/
# tartarus/snowball/ext/LovinsStemmer.java a_1) — the same table as the
# paper's Appendix A.

_LOVINS_ENDINGS = {
    "alistically": "B", "arizability": "A", "izationally": "B",
    "antialness": "A", "arisations": "A", "arizations": "A",
    "entialness": "A", "allically": "C", "antaneous": "A",
    "antiality": "A", "arisation": "A", "arization": "A",
    "ationally": "B", "ativeness": "A", "eableness": "E",
    "entations": "A", "entiality": "A", "entialize": "A",
    "entiation": "A", "ionalness": "A", "istically": "A",
    "itousness": "A", "izability": "A", "izational": "A",
    "ableness": "A", "arizable": "A", "entation": "A",
    "entially": "A", "eousness": "A", "ibleness": "A",
    "icalness": "A", "ionalism": "A", "ionality": "A",
    "ionalize": "A", "iousness": "A", "izations": "A",
    "lessness": "A", "ability": "A", "aically": "A", "alistic": "B",
    "alities": "A", "ariness": "E", "aristic": "A", "arizing": "A",
    "ateness": "A", "atingly": "A", "ational": "B", "atively": "A",
    "ativism": "A", "elihood": "E", "encible": "A", "entally": "A",
    "entials": "A", "entiate": "A", "entness": "A", "fulness": "A",
    "ibility": "A", "icalism": "A", "icalist": "A", "icality": "A",
    "icalize": "A", "ication": "G", "icianry": "A", "ination": "A",
    "ingness": "A", "ionally": "A", "isation": "A", "ishness": "A",
    "istical": "A", "iteness": "A", "iveness": "A", "ivistic": "A",
    "ivities": "A", "ization": "F", "izement": "A", "oidally": "A",
    "ousness": "A", "aceous": "A", "acious": "B", "action": "G",
    "alness": "A", "ancial": "A", "ancies": "A", "ancing": "B",
    "ariser": "A", "arized": "A", "arizer": "A", "atable": "A",
    "ations": "B", "atives": "A", "eature": "Z", "efully": "A",
    "encies": "A", "encing": "A", "ential": "A", "enting": "C",
    "entist": "A", "eously": "A", "ialist": "A", "iality": "A",
    "ialize": "A", "ically": "A", "icance": "A", "icians": "A",
    "icists": "A", "ifully": "A", "ionals": "A", "ionate": "D",
    "ioning": "A", "ionist": "A", "iously": "A", "istics": "A",
    "izable": "E", "lessly": "A", "nesses": "A", "oidism": "A",
    "acies": "A", "acity": "A", "aging": "B", "aical": "A",
    "alism": "B", "alist": "A", "ality": "A", "alize": "A",
    "allic": "BB", "anced": "B", "ances": "B", "antic": "C",
    "arial": "A", "aries": "A", "arily": "A", "arity": "B",
    "arize": "A", "aroid": "A", "ately": "A", "ating": "I",
    "ation": "B", "ative": "A", "ators": "A", "atory": "A",
    "ature": "E", "early": "Y", "ehood": "A", "eless": "A",
    "elity": "A", "ement": "A", "enced": "A", "ences": "A",
    "eness": "E", "ening": "E", "ental": "A", "ented": "C",
    "ently": "A", "fully": "A", "ially": "A", "icant": "A",
    "ician": "A", "icide": "A", "icism": "A", "icist": "A",
    "icity": "A", "idine": "I", "iedly": "A", "ihood": "A",
    "inate": "A", "iness": "A", "ingly": "B", "inism": "J",
    "inity": "CC", "ional": "A", "ioned": "A", "ished": "A",
    "istic": "A", "ities": "A", "itous": "A", "ively": "A",
    "ivity": "A", "izers": "F", "izing": "F", "oidal": "A",
    "oides": "A", "otide": "A", "ously": "A", "able": "A",
    "ably": "A", "ages": "B", "ally": "B", "ance": "B", "ancy": "B",
    "ants": "B", "aric": "A", "arly": "K", "ated": "I", "ates": "A",
    "atic": "B", "ator": "A", "ealy": "Y", "edly": "E", "eful": "A",
    "eity": "A", "ence": "A", "ency": "A", "ened": "E", "enly": "E",
    "eous": "A", "hood": "A", "ials": "A", "ians": "A", "ible": "A",
    "ibly": "A", "ical": "A", "ides": "L", "iers": "A", "iful": "A",
    "ines": "M", "ings": "N", "ions": "B", "ious": "A", "isms": "B",
    "ists": "A", "itic": "H", "ized": "F", "izer": "F", "less": "A",
    "lily": "A", "ness": "A", "ogen": "A", "ward": "A", "wise": "A",
    "ying": "B", "yish": "A", "acy": "A", "age": "B", "aic": "A",
    "als": "BB", "ant": "B", "ars": "O", "ary": "F", "ata": "A",
    "ate": "A", "eal": "Y", "ear": "Y", "ely": "E", "ene": "E",
    "ent": "C", "ery": "E", "ese": "A", "ful": "A", "ial": "A",
    "ian": "A", "ics": "A", "ide": "L", "ied": "A", "ier": "A",
    "ies": "P", "ily": "A", "ine": "M", "ing": "N", "ion": "Q",
    "ish": "C", "ism": "B", "ist": "A", "ite": "AA", "ity": "A",
    "ium": "A", "ive": "A", "ize": "F", "oid": "A", "one": "R",
    "ous": "A", "'s": "A", "ae": "A", "al": "BB", "ar": "X",
    "as": "B", "ed": "E", "en": "F", "es": "E", "ia": "A", "ic": "A",
    "is": "A", "ly": "B", "on": "S", "or": "T", "s'": "A", "um": "U",
    "us": "V", "yl": "R", "a": "A", "e": "A", "i": "A", "o": "A",
    "s": "W", "y": "B",
}

_LOVINS_SORTED = sorted(_LOVINS_ENDINGS, key=len, reverse=True)

_LOVINS_RESPELL = [
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", "aio"),            # not after a, i or o
    ("bex", "bic", None), ("dex", "dic", None), ("pex", "pic", None),
    ("tex", "tic", None), ("ax", "ac", None), ("ex", "ec", None),
    ("ix", "ic", None), ("lux", "luc", None), ("uad", "uas", None),
    ("vad", "vas", None), ("cid", "cis", None), ("lid", "lis", None),
    ("erid", "eris", None), ("pand", "pans", None),
    ("end", "ens", "s"),           # not after s
    ("ond", "ons", None), ("lud", "lus", None), ("rud", "rus", None),
    ("her", "hes", "pt"),          # not after p or t
    ("mit", "mis", None),
    ("ent", "ens", "m"),           # not after m
    ("ert", "ers", None),
    ("et", "es", "n"),             # not after n
    ("yt", "ys", None), ("yz", "ys", None),
]
_LOVINS_RESPELL.sort(key=lambda t: -len(t[0]))


def _lovins_cond(cond: str, stem: str) -> bool:
    """The paper's 29 contextual conditions (Appendix B); stem = the
    word with the candidate ending removed."""
    n = len(stem)

    def ends(*ss):
        return stem.endswith(ss)
    if n < 2:
        return False               # global minimum stem length
    return {
        "A": lambda: True,
        "B": lambda: n >= 3,
        "C": lambda: n >= 4,
        "D": lambda: n >= 5,
        "E": lambda: not ends("e"),
        "F": lambda: n >= 3 and not ends("e"),
        "G": lambda: n >= 3 and ends("f"),
        "H": lambda: ends("t", "ll"),
        "I": lambda: not ends("o", "e"),
        "J": lambda: not ends("a", "e"),
        "K": lambda: n >= 3 and (ends("l", "i")
                                 or (ends("e") and n >= 3
                                     and stem[-3] == "u")),
        "L": lambda: not ends("u", "x")
        and not (ends("s") and not ends("os")),
        "M": lambda: not ends("a", "c", "e", "m"),
        "N": lambda: n >= 3 and (n >= 4 or stem[-3] != "s"),
        "O": lambda: ends("l", "i"),
        "P": lambda: not ends("c"),
        "Q": lambda: n >= 3 and not ends("l", "n"),
        "R": lambda: ends("n", "r"),
        "S": lambda: ends("dr") or (ends("t") and not ends("tt")),
        "T": lambda: ends("s") or (ends("t") and not ends("ot")),
        "U": lambda: ends("l", "m", "n", "r"),
        "V": lambda: ends("c"),
        "W": lambda: not ends("s", "u"),
        "X": lambda: ends("l", "i") or (ends("e") and n >= 3
                                        and stem[-3] == "u"),
        "Y": lambda: ends("in"),
        "Z": lambda: not ends("f"),
        "AA": lambda: ends("d", "f", "ph", "th", "l", "er", "or",
                           "es", "t"),
        "BB": lambda: n >= 3 and not ends("met", "ryst"),
        "CC": lambda: ends("l"),
    }[cond]()


def lovins_stem(word: str) -> str:
    """Lovins: longest ending whose condition accepts the stem (one
    pass, blocking), then undouble b/d/g/l/m/n/p/r/s/t, then the 34
    respell rules (longest match, with the not-after guards)."""
    w = word.lower()
    for suf in _LOVINS_SORTED:
        if w.endswith(suf):
            stem = w[:len(w) - len(suf)]
            if _lovins_cond(_LOVINS_ENDINGS[suf], stem):
                w = stem
                break
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] in "bdglmnprst":
        w = w[:-1]
    for pat, rep, notafter in _LOVINS_RESPELL:
        if w.endswith(pat):
            base = len(w) - len(pat)
            if notafter and base >= 1 and w[base - 1] in notafter:
                break
            w = w[:base] + rep
            break
    return w


# ---------------------------------------------------------------------------
# Turkish (Snowball, E. Kapusuz Cilden's algorithm) — implemented from
# the published turkish.sbl specification at snowballstem.org; the
# reference wires the same algorithm through its generated
# tartarus/snowball/ext/TurkishStemmer.java + SnowballFilter.java.
# Suffix stripping driven by vowel harmony, with the spec's quirks kept
# verbatim (the delete-less mark_lArI leg after ndAn/nU; the stemmed
# buffer is the output even when the overall routine "fails", matching
# SnowballFilter.java:96 which ignores stem()'s return value).
# Validated 0-mismatch against the official 96,325-word turkish
# vocabulary (TestSnowballVocabData.zip), like the other 17 stemmers.

_TR_VOWEL = set("aeıioöuü")
_TR_U = set("ıiuü")
# vowel-harmony classes: the word's last vowel -> admissible earlier vowels
_TR_HARMONY = {"a": set("aıou"), "e": set("eiöü"), "ı": set("aı"),
               "i": set("ei"), "o": set("ou"), "ö": set("öü"),
               "u": set("ou"), "ü": set("öü")}
_TR_POSS = ("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız",
            "m", "n")
_TR_nU = ("ni", "nu", "nü", "nı")
_TR_nUn = ("in", "un", "ün", "ın")
_TR_yA = ("a", "e")
_TR_nA = ("na", "ne")
_TR_DA = ("da", "ta", "de", "te")
_TR_ndA = ("nda", "nde")
_TR_DAn = ("dan", "tan", "den", "ten")
_TR_ndAn = ("ndan", "nden")
_TR_ylA = ("la", "le")
_TR_ncA = ("ca", "ce")
_TR_yUm = ("im", "um", "üm", "ım")
_TR_sUn = ("sin", "sun", "sün", "sın")
_TR_yUz = ("iz", "uz", "üz", "ız")
_TR_sUnUz = ("siniz", "sunuz", "sünüz", "sınız")
_TR_lAr = ("lar", "ler")
_TR_nUz = ("niz", "nuz", "nüz", "nız")
_TR_DUr = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_TR_cAsInA = ("casına", "cesine")
_TR_yDU = ("dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
           "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
           "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
           "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")
_TR_lArI = ("leri", "ları")
_TR_ysA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_TR_ymUs = ("miş", "muş", "müş", "mış")


def _tr_among(w, p, suffixes):
    """Longest suffix of w[:p] in the set -> new boundary, else None."""
    best = None
    for s in suffixes:
        if (best is None or len(s) > best) and p >= len(s) \
                and w[p - len(s):p] == s:
            best = len(s)
    return None if best is None else p - best


def _tr_harmony(w, p):
    """check_vowel_harmony: the last vowel of w[:p] must be preceded
    (anywhere earlier) by a vowel of its harmony class."""
    i = p - 1
    while i >= 0 and w[i] not in _TR_VOWEL:
        i -= 1
    if i < 0:
        return False
    req = _TR_HARMONY[w[i]]
    for j in range(i - 1, -1, -1):
        if w[j] in req:
            return True
    return False


def _tr_opt_cons(w, p, ch):
    """mark_suffix_with_optional_{n,s,y}_consonant: strip a harmonic
    linking consonant if present; either way the char before the (new)
    boundary must be a vowel."""
    if p >= 1 and w[p - 1] == ch:
        return p - 1 if p >= 2 and w[p - 2] in _TR_VOWEL else None
    return p if p >= 2 and w[p - 2] in _TR_VOWEL else None


def _tr_opt_U(w, p):
    """mark_suffix_with_optional_U_vowel: strip a linking high vowel if
    present; either way the char before must be a NON-vowel."""
    if p >= 1 and w[p - 1] in _TR_U:
        return p - 1 if p >= 2 and w[p - 2] not in _TR_VOWEL else None
    return p if p >= 2 and w[p - 2] not in _TR_VOWEL else None


def _tr_mark_possessives(w, p):
    q = _tr_among(w, p, _TR_POSS)
    return None if q is None else _tr_opt_U(w, q)


def _tr_mark_sU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "s")


def _tr_mark_lArI(w, p):
    return _tr_among(w, p, _TR_lArI)


def _tr_mark_yU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "y")


def _tr_mark_plain(table):
    def mark(w, p):
        if not _tr_harmony(w, p):
            return None
        return _tr_among(w, p, table)
    return mark


def _tr_mark_cons(table, ch):
    def mark(w, p):
        if not _tr_harmony(w, p):
            return None
        q = _tr_among(w, p, table)
        return None if q is None else _tr_opt_cons(w, q, ch)
    return mark


_tr_mark_nU = _tr_mark_plain(_TR_nU)
_tr_mark_nUn = _tr_mark_cons(_TR_nUn, "n")
_tr_mark_yA = _tr_mark_cons(_TR_yA, "y")
_tr_mark_nA = _tr_mark_plain(_TR_nA)
_tr_mark_DA = _tr_mark_plain(_TR_DA)
_tr_mark_ndA = _tr_mark_plain(_TR_ndA)
_tr_mark_DAn = _tr_mark_plain(_TR_DAn)
_tr_mark_ndAn = _tr_mark_plain(_TR_ndAn)
_tr_mark_ylA = _tr_mark_cons(_TR_ylA, "y")
_tr_mark_ncA = _tr_mark_cons(_TR_ncA, "n")
_tr_mark_yUm = _tr_mark_cons(_TR_yUm, "y")
_tr_mark_sUn = _tr_mark_plain(_TR_sUn)
_tr_mark_yUz = _tr_mark_cons(_TR_yUz, "y")
_tr_mark_lAr = _tr_mark_plain(_TR_lAr)
_tr_mark_nUz = _tr_mark_plain(_TR_nUz)
_tr_mark_DUr = _tr_mark_plain(_TR_DUr)
_tr_mark_yDU = _tr_mark_cons(_TR_yDU, "y")
_tr_mark_ymUs = _tr_mark_cons(_TR_ymUs, "y")


def _tr_mark_sUnUz(w, p):
    return _tr_among(w, p, _TR_sUnUz)


def _tr_mark_cAsInA(w, p):
    return _tr_among(w, p, _TR_cAsInA)


def _tr_mark_ysA(w, p):
    q = _tr_among(w, p, _TR_ysA)
    return None if q is None else _tr_opt_cons(w, q, "y")


def _tr_mark_ki(w, p):
    return p - 2 if p >= 2 and w[p - 2:p] == "ki" else None


def _tr_mark_yken(w, p):
    if p < 3 or w[p - 3:p] != "ken":
        return None
    return _tr_opt_cons(w, p - 3, "y")


def _tr_first(w, p, *marks):
    for m in marks:
        q = m(w, p)
        if q is not None:
            return q
    return None


def _tr_stem_nominal_verb_suffixes(w):
    """-> (w, continue_stemming_noun_suffixes). Branches in spec order;
    every deletion truncates at the matched boundary."""
    p = len(w)
    q = _tr_first(w, p, _tr_mark_ymUs, _tr_mark_yDU, _tr_mark_ysA,
                  _tr_mark_yken)
    if q is not None:
        return w[:q], True
    q = _tr_mark_cAsInA(w, p)
    if q is not None:
        q2 = _tr_first(w, q, _tr_mark_sUnUz, _tr_mark_lAr, _tr_mark_yUm,
                       _tr_mark_sUn, _tr_mark_yUz)
        q2 = q if q2 is None else q2          # optional middle
        q3 = _tr_mark_ymUs(w, q2)
        if q3 is not None:
            return w[:q3], True               # else branch fails, fall on
    q = _tr_mark_lAr(w, p)
    if q is not None:
        w = w[:q]
        q2 = _tr_first(w, len(w), _tr_mark_DUr, _tr_mark_yDU,
                       _tr_mark_ysA, _tr_mark_ymUs)
        if q2 is not None:
            w = w[:q2]
        return w, False                       # unset continue_stemming
    q = _tr_mark_nUz(w, p)
    if q is not None:
        q2 = _tr_first(w, q, _tr_mark_yDU, _tr_mark_ysA)
        if q2 is not None:
            return w[:q2], True
    q = _tr_first(w, p, _tr_mark_sUnUz, _tr_mark_yUz, _tr_mark_sUn,
                  _tr_mark_yUm)
    if q is not None:
        w = w[:q]
        q2 = _tr_mark_ymUs(w, len(w))
        if q2 is not None:
            w = w[:q2]
        return w, True
    q = _tr_mark_DUr(w, p)
    if q is not None:
        w = w[:q]
        q2 = _tr_first(w, len(w), _tr_mark_sUnUz, _tr_mark_lAr,
                       _tr_mark_yUm, _tr_mark_sUn, _tr_mark_yUz)
        q2 = len(w) if q2 is None else q2     # optional middle
        q3 = _tr_mark_ymUs(w, q2)
        if q3 is not None:
            w = w[:q3]
        return w, True
    return w, True


def _tr_del(w, lo, hi):
    return w[:lo] + w[hi:]


def _tr_chain_before_ki(w, p):
    """stem_suffix_chain_before_ki at boundary p -> (w, success).
    Deletions splice out [new, old) regions; failure never mutates."""
    q = _tr_mark_ki(w, p)
    if q is None:
        return w, False
    # -DAki
    q2 = _tr_mark_DA(w, q)
    if q2 is not None:
        w = _tr_del(w, q2, p)
        qa = _tr_mark_lAr(w, q2)
        if qa is not None:
            w = _tr_del(w, qa, q2)
            w2, ok = _tr_chain_before_ki(w, qa)
            if ok:
                w = w2
        else:
            qb = _tr_mark_possessives(w, q2)
            if qb is not None:
                w = _tr_del(w, qb, q2)
                qc = _tr_mark_lAr(w, qb)
                if qc is not None:
                    w = _tr_del(w, qc, qb)
                    w2, ok = _tr_chain_before_ki(w, qc)
                    if ok:
                        w = w2
        return w, True
    # -nUnki
    q2 = _tr_mark_nUn(w, q)
    if q2 is not None:
        w = _tr_del(w, q2, p)
        qa = _tr_mark_lArI(w, q2)
        if qa is not None:
            return _tr_del(w, qa, q2), True
        qb = _tr_first(w, q2, _tr_mark_possessives, _tr_mark_sU)
        if qb is not None:
            w = _tr_del(w, qb, q2)
            qc = _tr_mark_lAr(w, qb)
            if qc is not None:
                w = _tr_del(w, qc, qb)
                w2, ok = _tr_chain_before_ki(w, qc)
                if ok:
                    w = w2
            return w, True
        w2, ok = _tr_chain_before_ki(w, q2)
        if ok:
            w = w2
        return w, True
    # -ndAki (the ndA itself is NOT deleted unless a leg spans it)
    q2 = _tr_mark_ndA(w, q)
    if q2 is not None:
        qa = _tr_mark_lArI(w, q2)
        if qa is not None:
            return _tr_del(w, qa, p), True
        qb = _tr_mark_sU(w, q2)
        if qb is not None:
            w = _tr_del(w, qb, p)
            qc = _tr_mark_lAr(w, qb)
            if qc is not None:
                w = _tr_del(w, qc, qb)
                w2, ok = _tr_chain_before_ki(w, qc)
                if ok:
                    w = w2
            return w, True
        return _tr_chain_before_ki(w, q2)
    return w, False


def _tr_stem_noun_suffixes(w):    # noqa: C901  (spec-shaped or-chain)
    """-> (w, success); branches in spec order, first success wins."""
    P = len(w)
    # 1. -lAr
    q = _tr_mark_lAr(w, P)
    if q is not None:
        w = w[:q]
        w2, ok = _tr_chain_before_ki(w, len(w))
        return (w2 if ok else w), True
    # 2. -ncA
    q = _tr_mark_ncA(w, P)
    if q is not None:
        w = w[:q]
        e = len(w)
        qa = _tr_mark_lArI(w, e)
        if qa is not None:
            return w[:qa], True
        qb = _tr_first(w, e, _tr_mark_possessives, _tr_mark_sU)
        if qb is not None:
            w = w[:qb]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
                w2, ok = _tr_chain_before_ki(w, len(w))
                if ok:
                    w = w2
            return w, True
        qd = _tr_mark_lAr(w, e)
        if qd is not None:
            w = w[:qd]
            w2, ok = _tr_chain_before_ki(w, len(w))
            if ok:
                w = w2
        return w, True
    # 3. -(n)dA / -(n)A
    q = _tr_first(w, P, _tr_mark_ndA, _tr_mark_nA)
    if q is not None:
        qa = _tr_mark_lArI(w, q)
        if qa is not None:
            return w[:qa], True
        qb = _tr_mark_sU(w, q)
        if qb is not None:
            w = w[:qb]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
                w2, ok = _tr_chain_before_ki(w, len(w))
                if ok:
                    w = w2
            return w, True
        w2, ok = _tr_chain_before_ki(w, q)
        if ok:
            return w2, True                   # else branch fails, fall on
    # 4. -(n)dAn / -nU  (the lArI leg deletes nothing — spec quirk)
    q = _tr_first(w, P, _tr_mark_ndAn, _tr_mark_nU)
    if q is not None:
        qb = _tr_mark_sU(w, q)
        if qb is not None:
            w = w[:qb]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
                w2, ok = _tr_chain_before_ki(w, len(w))
                if ok:
                    w = w2
            return w, True
        if _tr_mark_lArI(w, q) is not None:
            return w, True
    # 5. -DAn
    q = _tr_mark_DAn(w, P)
    if q is not None:
        w = w[:q]
        e = len(w)
        qa = _tr_mark_possessives(w, e)
        if qa is not None:
            w = w[:qa]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
                w2, ok = _tr_chain_before_ki(w, len(w))
                if ok:
                    w = w2
            return w, True
        qb = _tr_mark_lAr(w, e)
        if qb is not None:
            w = w[:qb]
            w2, ok = _tr_chain_before_ki(w, len(w))
            if ok:
                w = w2
            return w, True
        w2, ok = _tr_chain_before_ki(w, e)
        if ok:
            w = w2
        return w, True
    # 6. -nUn / -ylA
    q = _tr_first(w, P, _tr_mark_nUn, _tr_mark_ylA)
    if q is not None:
        w = w[:q]
        e = len(w)
        qa = _tr_mark_lAr(w, e)
        if qa is not None:                    # legA: lAr + chain (must
            w = w[:qa]                        # chain; else fall to legB
            w2, ok = _tr_chain_before_ki(w, len(w))  # with lAr kept off)
            if ok:
                return w2, True
        e = len(w)
        qb = _tr_first(w, e, _tr_mark_possessives, _tr_mark_sU)
        if qb is not None:
            w = w[:qb]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
                w2, ok = _tr_chain_before_ki(w, len(w))
                if ok:
                    w = w2
            return w, True
        w2, ok = _tr_chain_before_ki(w, e)
        if ok:
            w = w2
        return w, True
    # 7. -lArI
    q = _tr_mark_lArI(w, P)
    if q is not None:
        return w[:q], True
    # 8. bare -ki chain
    w2, ok = _tr_chain_before_ki(w, P)
    if ok:
        return w2, True
    # 9. -DA / -yU / -yA
    q = _tr_first(w, P, _tr_mark_DA, _tr_mark_yU, _tr_mark_yA)
    if q is not None:
        w = w[:q]
        e = len(w)
        qa = _tr_mark_possessives(w, e)
        if qa is not None:
            w = w[:qa]
            qc = _tr_mark_lAr(w, len(w))
            if qc is not None:
                w = w[:qc]
            w2, ok = _tr_chain_before_ki(w, len(w))
            if ok:
                w = w2
            return w, True
        qb = _tr_mark_lAr(w, e)
        if qb is not None:
            w = w[:qb]
            w2, ok = _tr_chain_before_ki(w, len(w))
            if ok:
                w = w2
        return w, True
    # 10. possessives / -sU
    q = _tr_first(w, P, _tr_mark_possessives, _tr_mark_sU)
    if q is not None:
        w = w[:q]
        qc = _tr_mark_lAr(w, len(w))
        if qc is not None:
            w = w[:qc]
            w2, ok = _tr_chain_before_ki(w, len(w))
            if ok:
                w = w2
        return w, True
    return w, False


def _tr_append_U(w):
    """append_U_to_stems_ending_with_d_or_g: echo the harmonic high
    vowel after a bare d/g stem."""
    if not w or w[-1] not in "dg":
        return w
    i = len(w) - 1
    while i >= 0 and w[i] not in _TR_VOWEL:
        i -= 1
    if i < 0:
        return w
    v = w[i]
    for pair, u in (("aı", "ı"), ("ei", "i"), ("ou", "u"), ("öü", "ü")):
        if v in pair:
            return w + u
    return w


def turkish_stem(word: str) -> str:
    """Snowball Turkish. The caller should lower-case with the Turkish
    casing rules first (turkish_lowercase in extra.py: I -> ı)."""
    w = word
    if sum(c in _TR_VOWEL for c in w) < 2:    # more_than_one_syllable
        return w
    w, cont = _tr_stem_nominal_verb_suffixes(w)
    if not cont:
        return w                               # buffer kept (filter
    w, _ = _tr_stem_noun_suffixes(w)           # ignores stem()'s rc)
    if w in ("ad", "soyad"):                   # is_reserved_word: skip
        return w                               # postlude d->t respell
    w = _tr_append_U(w)
    if w and w[-1] in "bcdğ":                  # post_process_last_cons
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[w[-1]]
    return w


# ---------------------------------------------------------------------------
# Kraaij-Pohlmann (Dutch) — implemented from the published
# kraaij_pohlmann.sbl specification at snowballstem.org (the reference
# generates tartarus/snowball/ext/KpStemmer.java from the same spec).
# Inflectional + derivational suffix strip with vowel re-lengthening
# ("lop" -> "loop"), ge- prefix/infix removal with measure recompute,
# the y/Y vowel-consonant protocol, and final undoubling. Validated
# 0-mismatch against the official 45,669-word kraaij_pohlmann
# vocabulary (TestSnowballVocabData.zip).

_KP_V = set("aeiouy")
_KP_V_WX = _KP_V | set("wx")
_KP_AOU = set("aou")
_KP_AIOU = set("aiou")


def _kp_ends(w, p, s):
    return p >= len(s) and w[p - len(s):p] == s


def _kp_is_V(w, p):
    """V: char before p is a vowel, or 'ij' ends there."""
    return (p >= 1 and w[p - 1] in _KP_V) or _kp_ends(w, p, "ij")


def _kp_is_VX(w, p):
    """VX: V one char further back."""
    return p >= 1 and _kp_is_V(w, p - 1)


def _kp_is_C(w, p):
    """C: not 'ij', and a consonant before p."""
    return (p >= 1 and not _kp_ends(w, p, "ij")
            and w[p - 1] not in _KP_V)


def _kp_among(w, p, table):
    """Longest suffix of w[:p] in table -> (case_id, new_p) or None."""
    best = None
    for s, case in table:
        if (best is None or len(s) > len(best[0])) and _kp_ends(w, p, s):
            best = (s, case)
    return None if best is None else (best[1], p - len(best[0]))


def _kp_lengthen_V(w, p):
    """lengthen_V at backwards position p: double a short a/o/u/e in an
    open syllable ("lop" -> "loop"). Returns the (possibly) new w."""
    if p < 1 or w[p - 1] in _KP_V_WX:
        return w
    q = p - 1                            # past the consonant
    if q >= 1 and w[q - 1] in _KP_AOU:
        b = q - 1
        if b == 0 or w[b - 1] not in _KP_V:
            return w[:q] + w[b:q] + w[q:]        # insert copy at ket
        return w
    if q >= 1 and w[q - 1] == "e":
        b = q - 1
        if b >= 1:
            if w[b - 1] in _KP_V:
                return w                  # needs consonant/limit before
            c = b - 1                     # the consumed consonant
            if c >= 1 and w[c - 1] in _KP_AIOU:
                return w                  # not(in AIOU) after it
            if c >= 3 and w[c - 2] in _KP_AIOU \
                    and w[c - 3] not in _KP_V:
                return w                  # not(next in AIOU, out v)
        return w[:q] + "e" + w[q:]
    return w


_KP_A0 = [("nde", 7), ("en", 6), ("s", 2), ("'s", 1), ("es", 4),
          ("ies", 3), ("aus", 5)]
_KP_A1 = [("de", 5), ("ge", 2), ("ische", 4), ("je", 1), ("lijke", 3),
          ("le", 9), ("ene", 10), ("re", 8), ("se", 7), ("te", 6),
          ("ieve", 11)]
_KP_A2 = [("heid", 3), ("fie", 7), ("gie", 8), ("atie", 1),
          ("isme", 5), ("ing", 5), ("arij", 6), ("erij", 5),
          ("sel", 3), ("rder", 4), ("ster", 3), ("iteit", 2),
          ("dst", 10), ("tst", 9)]
_KP_A3 = [("end", 10), ("atief", 2), ("erig", 10), ("achtig", 9),
          ("ioneel", 1), ("baar", 3), ("laar", 5), ("naar", 4),
          ("raar", 6), ("eriger", 10), ("achtiger", 9), ("lijker", 8),
          ("tant", 7), ("erigst", 10), ("achtigst", 9), ("lijkst", 8)]
_KP_A4 = [("ig", 1), ("iger", 1), ("igst", 1)]
_KP_A5 = [("ft", 2), ("kt", 1), ("pt", 3)]
_KP_A6 = [("bb", "b"), ("cc", "c"), ("dd", "d"), ("ff", "f"),
          ("gg", "g"), ("hh", "h"), ("jj", "j"), ("kk", "k"),
          ("ll", "l"), ("mm", "m"), ("nn", "n"), ("pp", "p"),
          ("qq", "q"), ("rr", "r"), ("ss", "s"), ("tt", "t"),
          ("v", "f"), ("vv", "v"), ("ww", "w"), ("xx", "x"),
          ("z", "s"), ("zz", "z")]


def _kp_step1(w, p1):
    P = len(w)
    m = _kp_among(w, P, _KP_A0)
    if m is None:
        return w, False
    case, q = m
    if case == 1:                                      # 's
        return w[:q], True
    if case == 2:                                      # s
        if q < p1:
            return w, False
        if _kp_ends(w, q, "t") and q - 1 >= p1:        # not('t' R1)
            return w, False
        if not _kp_is_C(w, q):
            return w, False
        return w[:q], True
    if case == 3:                                      # ies
        if q < p1:
            return w, False
        return w[:q] + "ie", True
    if case == 4:                                      # es
        if _kp_ends(w, q, "ar") and q - 2 >= p1 and _kp_is_C(w, q - 2):
            return _kp_lengthen_V(w[:q - 2], q - 2), True
        if _kp_ends(w, q, "er") and q - 2 >= p1 and _kp_is_C(w, q - 2):
            return w[:q - 2], True
        if q < p1 or not _kp_is_C(w, q):
            return w, False
        return w[:q] + "e", True
    if case == 5:                                      # aus
        if q < p1 or not _kp_is_V(w, q):
            return w, False
        return w[:q] + "au", True
    if case == 6:                                      # en
        if _kp_ends(w, q, "hed") and q - 3 >= p1:
            return w[:q - 3] + "heid", True
        if _kp_ends(w, q, "nd"):
            return w[:q], True
        if _kp_ends(w, q, "d") and q - 1 >= p1 and _kp_is_C(w, q - 1):
            return w[:q - 1], True
        if (w[q - 1:q] in ("i", "j")) and _kp_is_V(w, q - 1):
            return w[:q], True
        if q < p1 or not _kp_is_C(w, q):
            return w, False
        return _kp_lengthen_V(w[:q], q), True
    return w[:q] + "nd", True                          # nde


def _kp_step2(w, p1):
    P = len(w)
    m = _kp_among(w, P, _KP_A1)
    if m is None:
        return w, False
    case, q = m
    if case == 1:                                      # je: or-chain,
        if _kp_ends(w, q, "'t"):                       # failed branches
            return w[:q - 2], True                     # FALL THROUGH
        if _kp_ends(w, q, "et") and q - 2 >= p1 and _kp_is_C(w, q - 2):
            return w[:q - 2], True
        if _kp_ends(w, q, "rnt"):
            return w[:q - 3] + "rn", True
        if _kp_ends(w, q, "t") and q - 1 >= p1 and _kp_is_VX(w, q - 1):
            return w[:q - 1], True
        if _kp_ends(w, q, "ink"):
            return w[:q - 3] + "ing", True
        if _kp_ends(w, q, "mp"):
            return w[:q - 2] + "m", True
        if _kp_ends(w, q, "'") and q - 1 >= p1:
            return w[:q - 1], True
        if q >= p1 and _kp_is_C(w, q):
            return w[:q], True
        return w, False
    if q < p1:
        return w, False
    if case == 2:                                      # ge
        return w[:q] + "g", True
    if case == 3:                                      # lijke
        return w[:q] + "lijk", True
    if case == 4:                                      # ische
        return w[:q] + "isch", True
    if case == 5:                                      # de
        if not _kp_is_C(w, q):
            return w, False
        return w[:q], True
    if case == 6:                                      # te
        return w[:q] + "t", True
    if case == 7:                                      # se
        return w[:q] + "s", True
    if case == 8:                                      # re
        return w[:q] + "r", True
    if case == 9:                                      # le: strip 'e',
        w2 = w[:q] + "l"                               # re-attach 'l'
        return _kp_lengthen_V(w2, len(w2)), True
    if case == 10:                                     # ene -> en
        if not _kp_is_C(w, q):
            return w, False
        w2 = w[:q] + "en"
        return _kp_lengthen_V(w2, len(w2)), True
    if not _kp_is_C(w, q):                             # ieve
        return w, False
    return w[:q] + "ief", True


def _kp_step3(w, p1, p2):
    P = len(w)
    m = _kp_among(w, P, _KP_A2)
    if m is None:
        return w, False
    case, q = m
    if case == 4:                                      # rder
        return w[:q] + "r", True
    if case in (7, 8):                                 # fie -> f, gie -> g
        if q < p2:
            return w, False
        w2 = w[:q] + ("f" if case == 7 else "g")
        return _kp_lengthen_V(w2, len(w2)), True
    if q < p1:
        return w, False
    if case == 1:                                      # atie
        return w[:q] + "eer", True
    if case == 2:                                      # iteit
        return _kp_lengthen_V(w[:q], q), True
    if case == 3:                                      # heid/sel/ster
        return w[:q], True
    if case == 5:                                      # isme/ing/erij
        return _kp_lengthen_V(w[:q], q), True
    if case == 6:                                      # arij
        if not _kp_is_C(w, q):
            return w, False
        return w[:q] + "aar", True
    if case == 9:                                      # tst
        if not _kp_is_C(w, q):
            return w, False
        return w[:q] + "t", True
    if not _kp_is_C(w, q):                             # dst
        return w, False
    return w[:q] + "d", True


def _kp_step4(w, p1):
    P = len(w)
    m = _kp_among(w, P, _KP_A3)
    if m is not None:
        case, q = m
        if q >= p1:
            if case == 1:                              # ioneel
                return w[:q] + "ie", True
            if case == 2:                              # atief
                return w[:q] + "eer", True
            if case == 3:                              # baar
                return w[:q], True
            if case == 4 and _kp_is_V(w, q):           # naar
                return w[:q] + "n", True
            if case == 5 and _kp_is_V(w, q):           # laar
                return w[:q] + "l", True
            if case == 6 and _kp_is_V(w, q):           # raar
                return w[:q] + "r", True
            if case == 7:                              # tant
                return w[:q] + "teer", True
            if case == 8:                              # lijker/lijkst
                return w[:q] + "lijk", True
            if case == 9:                              # achtig*
                return w[:q], True
            if case == 10 and _kp_is_C(w, q):          # end/erig*
                return _kp_lengthen_V(w[:q], q), True
    m = _kp_among(w, P, _KP_A4)                        # ig/iger/igst
    if m is None:
        return w, False
    _case, q = m
    if q < p1 or not _kp_is_C(w, q):
        return w, False
    return _kp_lengthen_V(w[:q], q), True


def _kp_step7(w):
    m = _kp_among(w, len(w), _KP_A5)
    if m is None:
        return w, False
    case, q = m
    return w[:q] + {1: "k", 2: "f", 3: "p"}[case], True


def _kp_step6(w):
    m = None
    for s, rep in _KP_A6:
        if (m is None or len(s) > len(m[0])) and _kp_ends(w, len(w), s):
            m = (s, rep)
    if m is None:
        return w, False
    return w[:len(w) - len(m[0])] + m[1], True


def _kp_step1c(w, p1):
    P = len(w)
    m = _kp_among(w, P, [("d", 1), ("t", 2)])
    if m is None:
        return w, False
    case, q = m
    if q < p1 or not _kp_is_C(w, q):
        return w, False
    guard = "n" if case == 1 else "h"
    if _kp_ends(w, q, guard) and q - 1 >= p1:          # not(g R1)
        return w, False
    return w[:q], True


def _kp_measure(w):
    """p1/p2 marks; 'ij' counts as ONE vowel unit inside clusters."""
    n = len(w)
    p1 = p2 = n
    i = 0

    def cluster(i):
        cnt = 0
        while i < n:
            if w[i:i + 2] == "ij":
                i += 2
            elif w[i] in _KP_V:
                i += 1
            else:
                break
            cnt += 1
        return i, cnt

    while i < n and w[i] not in _KP_V:
        i += 1
    i, cnt = cluster(i)
    if cnt < 1 or i >= n or w[i] in _KP_V:
        return p1, p2
    i += 1
    p1 = i
    while i < n and w[i] not in _KP_V:
        i += 1
    i, cnt = cluster(i)
    if cnt < 1 or i >= n or w[i] in _KP_V:
        return p1, p2
    return p1, i + 1


def _kp_lose_prefix(w):
    """ge- prefix removal: 'ge' + >=3 chars, with a vowel then a later
    consonant in the remainder. -> (w, removed?)"""
    if not w.startswith("ge") or len(w) < 5:
        return w, False
    i = 2
    while i < len(w) and w[i] not in _KP_V:
        i += 1
    if i >= len(w):
        return w, False
    j = i
    while j < len(w) and w[j] in _KP_V:
        j += 1
    if j >= len(w):
        return w, False
    return w[2:], True


def _kp_lose_infix(w):
    """First 'ge' at index >= 1, same conditions on the remainder."""
    k = w.find("ge", 1)
    if k < 0 or len(w) < k + 5:
        return w, False
    i = k + 2
    while i < len(w) and w[i] not in _KP_V:
        i += 1
    if i >= len(w):
        return w, False
    j = i
    while j < len(w) and w[j] in _KP_V:
        j += 1
    if j >= len(w):
        return w, False
    return w[:k] + w[k + 2:], True


def kp_stem(word: str) -> str:
    """Kraaij-Pohlmann Dutch stemmer (spec main: y/Y protocol, measure,
    Steps 1-4, ge-removal + re-measure + Step_1c twice, Step_7, Step_6
    when anything stemmed, Y restore)."""
    w = word
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    i = 0
    while i + 1 < len(w):                # y after a vowel -> Y
        if w[i] in _KP_V and w[i + 1] == "y":
            w = w[:i + 1] + "Y" + w[i + 2:]
            y_found = True
        i += 1
    p1, p2 = _kp_measure(w)
    stemmed = False
    for step in (_kp_step1, _kp_step2):
        w, ok = step(w, p1)
        stemmed = stemmed or ok
    w, ok = _kp_step3(w, p1, p2)
    stemmed = stemmed or ok
    w, ok = _kp_step4(w, p1)
    stemmed = stemmed or ok
    w, ge_removed = _kp_lose_prefix(w)
    if ge_removed:
        p1, p2 = _kp_measure(w)
        w, _ = _kp_step1c(w, p1)
    w, ge2 = _kp_lose_infix(w)
    if ge2:
        p1, p2 = _kp_measure(w)
        w, _ = _kp_step1c(w, p1)
    w, ok = _kp_step7(w)
    stemmed = stemmed or ok
    if stemmed or ge2:      # NOT ge_removed: only the infix flag is
        w, _ = _kp_step6(w)  # still set when the undoubler gate runs
    if y_found:
        w = w.replace("Y", "y")
    return w
