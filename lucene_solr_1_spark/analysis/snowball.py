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
