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
