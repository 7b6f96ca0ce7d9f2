"""Brazilian Portuguese stemmer (table-driven reimplementation).

Analog of the reference's hand-written ``BrazilianStemmer``
(lucene/analysis/common/src/java/org/apache/lucene/analysis/br/
BrazilianStemmer.java:26; SURVEY.md §2.B) — an RSLP-flavoured
region-based stemmer: lowercase + accent folding, R1/R2/RV regions,
then a standard-suffix step (region-gated), a verb-suffix step over RV,
and residual i / vowel / final-e cleanups.

Re-expressed as ordered data tables over one generic matcher rather
than the reference's unrolled if-chains.  Faithful to the original's
quirks, which its 90-vector test suite pins down
(TestBrazilianStemmer.java, mirrored in tests/test_brazilian.py):

  * the ``logias`` rule reports "altered" without changing the word
    (the Java discards the replacement, BrazilianStemmer.java:429);
  * the first len-3 verb rule for ``ira`` removes ``ava`` — virtually
    always a no-op, but it still marks the word altered;
  * words containing non-letters are returned accent-folded but
    unstemmed; terms shorter than 3 or longer than 29 chars after
    folding are left untouched (stem() returns null -> filter keeps
    the token).

Scale: pure token -> token; production path is stem_vocab's broadcast
vocabulary map like every other stemmer.
"""

from __future__ import annotations

_FOLD = str.maketrans("áâãéêíóôõúüçñ", "aaaeeiooouucn")
_VOWELS = frozenset("aeiou")
_PUNCT = "\"'-,;.?!"


def _fold(term: str) -> str:
    ct = term.lower().translate(_FOLD)
    if len(ct) >= 2 and ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _PUNCT:
        ct = ct[:-1]
    return ct


def _r1(value: str | None) -> str | None:
    """Region after the first non-vowel following a vowel (null if the
    region would be empty — mirrors getR1's strict j < len-1 scans)."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _VOWELS:
        j += 1
    if j >= i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if j >= i:
        return None
    return value[j + 1:]


def _rv(value: str | None) -> str | None:
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


# Step 1 (standard suffixes), in the reference's match order:
# (suffix, region gate, replacement-or-None, required preceding string).
# replacement None = the "logias" quirk: match, but leave the word as-is.
_STEP1 = (
    ("uciones", "R2", "u", None),
    ("imentos", "R2", "", None), ("amentos", "R2", "", None),
    ("adores", "R2", "", None), ("adoras", "R2", "", None),
    ("logias", "R2", None, None),
    ("encias", "R2", "ente", None),
    ("amente", "R1", "", None),
    ("idades", "R2", "", None),
    ("acoes", "R2", "", None), ("imento", "R2", "", None),
    ("amento", "R2", "", None), ("adora", "R2", "", None),
    ("ismos", "R2", "", None), ("istas", "R2", "", None),
    ("logia", "R2", "log", None), ("ucion", "R2", "u", None),
    ("encia", "R2", "ente", None), ("mente", "R2", "", None),
    ("idade", "R2", "", None),
    ("acao", "R2", "", None), ("ezas", "R2", "", None),
    ("icos", "R2", "", None), ("icas", "R2", "", None),
    ("ismo", "R2", "", None), ("avel", "R2", "", None),
    ("ivel", "R2", "", None), ("ista", "R2", "", None),
    ("osos", "R2", "", None), ("osas", "R2", "", None),
    ("ador", "R2", "", None), ("ivas", "R2", "", None),
    ("ivos", "R2", "", None),
    ("iras", "RV", "ir", "e"),
    ("eza", "R2", "", None), ("ico", "R2", "", None),
    ("ica", "R2", "", None), ("oso", "R2", "", None),
    ("osa", "R2", "", None), ("iva", "R2", "", None),
    ("ivo", "R2", "", None),
    ("ira", "RV", "ir", "e"),
)

# Step 2 (verb suffixes over RV), reference order; each entry is the
# suffix matched in RV (and removed from the word).  The lone quirk:
# the first "ira" entry removes "ava" instead (see module docstring).
_STEP2 = (
    "issemos", "essemos", "assemos", "ariamos", "eriamos", "iriamos",
    "iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
    "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
    "irieis",
    "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
    "asses", "esses", "isses", "astes", "assem", "essem", "issem",
    "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
    "erias", "irias", "estes", "istes", "areis", "aveis",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
    "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
    "eres", "ires", "ados", "idos", "amos", "emos", "imos", "ieis",
    ("ira", "ava"), "iam", "ado", "ido", "ias", "ais", "eis", "ira",
    "ear",
    "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu",
    "iu", "ou",
)


def brazilian_stem(token: str) -> str:
    """Stem one (already tokenized) term; non-letter or out-of-range
    terms come back unstemmed like the reference filter keeps them."""
    ct = _fold(token)
    if not (2 < len(ct) < 30):
        return token                      # stem() null -> keep token
    if not ct.isalpha():
        return ct                         # folded but unstemmed
    r1 = _r1(ct)
    r2 = _r1(r1)
    rv = _rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    altered = False
    for suffix, region, repl, preceded in _STEP1:
        reg = regions[region]
        if (ct.endswith(suffix) and reg is not None
                and reg.endswith(suffix)
                and (preceded is None
                     or ct[:len(ct) - len(suffix)].endswith(preceded))):
            if repl is not None:
                ct = ct[:len(ct) - len(suffix)] + repl
            altered = True
            break

    if not altered and rv is not None:
        for entry in _STEP2:
            suffix, remove = (entry if isinstance(entry, tuple)
                              else (entry, entry))
            if rv.endswith(suffix):
                if ct.endswith(remove):
                    ct = ct[:len(ct) - len(remove)]
                altered = True
                break

    # regions were computed on the ORIGINAL folded term and are reused
    # unrecomputed by the cleanup steps, exactly like the reference
    if altered:
        # step 3: residual i after c
        if (rv is not None and rv.endswith("i")
                and rv[:-1].endswith("c") and ct.endswith("i")):
            ct = ct[:-1]
    elif rv is not None:
        # step 4: residual vowel suffixes
        for suffix in ("os", "a", "i", "o"):
            if rv.endswith(suffix):
                if ct.endswith(suffix):
                    ct = ct[:len(ct) - len(suffix)]
                break

    # step 5: final e (with gu/ci contraction)
    if rv is not None and rv.endswith("e"):
        if rv[:-1].endswith("gu"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("u"):
                ct = ct[:-1]
        elif rv[:-1].endswith("ci"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("i"):
                ct = ct[:-1]
        elif ct.endswith("e"):
            ct = ct[:-1]
    return ct
