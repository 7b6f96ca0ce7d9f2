"""Full Snowball stemmers (German), implemented from the published
Snowball specification at snowballstem.org — not a translation of the
reference's generated Java (ref: lucene/analysis/common/src/java/org/
tartarus/snowball/ext/GermanStemmer.java is machine-generated from the
same public german.sbl spec; SnowballFilter.java:53 wires it as a
TokenFilter).

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
