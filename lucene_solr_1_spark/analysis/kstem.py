"""KStem — Krovetz's dictionary-backed inflectional stemmer.

Implements R. Krovetz, "Viewing morphology as an inference process"
(SIGIR'93) as realized by the public-domain CIIR/UMass kstem that the
reference wraps (ref: lucene/analysis/common/src/java/org/apache/
lucene/analysis/en/KStemmer.java:73, KStemFilter.java:49): a ~27.5k
head-word lexicon consulted by a fixed pipeline of suffix rules
(plural, past-tense, -ing, -ity, -ness, -ion, -er/-or, -ly, -al,
-ive, -ize, -ment, -ble, -ism, -ic, -ncy, -nce), each trying
candidate roots against the dictionary and keeping the first hit.

The lexicon (analysis/data/kstem_lexicon.json.gz) is DATA extracted
from the reference's KStemData1-8 word lists + the small exception /
direct-conflation / nationality tables — the same category as the
33-word stopword list: a parity requirement, not code. The algorithm
below is an original Python implementation of the published rule
pipeline, validated word-for-word against the reference's own oracle
(kstemTestData.zip: 12,130 input/output pairs) in tests/test_stemmer.py.

Like the reference, the stemmer only touches lowercase alphabetic
words of length 3..49; everything else passes through unchanged. Use
through ``stem_vocab(algorithm='kstem')`` — the vocabulary trick makes
per-document cost zero regardless of corpus size.

Implementation note: the rules mutate a shared buffer where
truncation (set_len) keeps the underlying characters, so a later
set_len may RESURRECT them — several rules depend on that (e.g. the
-er doubled-consonant path). _Buf reproduces those semantics.
"""

from __future__ import annotations

import gzip
import json
import os

_VOWELS = frozenset("aeiou")

_DICT: dict[str, tuple[str | None, bool]] | None = None


def _load_dict() -> dict[str, tuple[str | None, bool]]:
    global _DICT
    if _DICT is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "kstem_lexicon.json.gz")
        with gzip.open(path, "rt") as f:
            raw = json.load(f)
        d: dict[str, tuple[str | None, bool]] = {}
        for w in raw["exception"]:
            d[w] = (None, True)
        for src, root in raw["conflations"].items():
            d.setdefault(src, (root, False))
        for w in raw["dict"] + raw["supplement"] + raw["proper"]:
            d.setdefault(w, (None, False))
        _DICT = d
    return _DICT


class _Buf:
    """OpenStringBuilder semantics: set_len keeps underlying chars."""

    def __init__(self, s: str):
        self.b = list(s)
        self.size = len(s)

    def at(self, i: int) -> str:
        return self.b[i]

    def set_at(self, i: int, c: str) -> None:
        if i == len(self.b):
            self.b.append(c)
        else:
            self.b[i] = c

    def set_len(self, n: int) -> None:
        while n > len(self.b):
            self.b.append("\x00")
        self.size = n

    def write(self, c: str) -> None:
        if self.size < len(self.b):
            self.b[self.size] = c
        else:
            self.b.append(c)
        self.size += 1

    def append(self, s: str) -> None:
        for c in s:
            self.write(c)

    def __len__(self) -> int:
        return self.size

    def __str__(self) -> str:
        return "".join(self.b[:self.size])


class _KStem:
    def __init__(self, word: str):
        self.w = _Buf(word)
        self.k = len(word) - 1
        self.j = 0
        self.me: tuple[str | None, bool] | None = None  # matchedEntry

    # ------------------------------------------------------- helpers

    def _cons(self, i: int) -> bool:
        ch = self.w.at(i)
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._cons(i - 1)

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _double_c(self, i: int) -> bool:
        return (i >= 1 and self.w.at(i) == self.w.at(i - 1)
                and self._cons(i))

    def _ends(self, s: str) -> bool:
        """endsIn: j <- index before the suffix iff the word ends in s
        and the suffix is shorter than the word."""
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        if "".join(self.w.b[r:r + len(s)]) != s:
            self.j = self.k
            return False
        self.j = r - 1
        return True

    def _lookup(self) -> bool:
        self.me = _load_dict().get(str(self.w))
        return self.me is not None

    def _word_in_dict(self):
        if self.me is not None:
            return self.me
        e = _load_dict().get(str(self.w))
        if e is not None and not e[1]:
            self.me = e          # cache only non-exceptions
        return e

    def _matched(self) -> bool:
        return self.me is not None

    def _set_suffix(self, s: str) -> None:
        self.w.set_len(self.j + 1)
        self.w.append(s)
        self.k = self.j + len(s)

    # --------------------------------------------------------- rules

    def plural(self) -> None:
        w, _ = self.w, None
        if w.at(self.k) != "s":
            return
        if self._ends("ies"):
            w.set_len(self.j + 3)
            self.k -= 1
            if self._lookup():       # calories -> calorie
                return
            self.k += 1
            w.write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends("es"):
            # try just removing the "s"
            w.set_len(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (w.at(self.j) == "s"
                                        and w.at(self.j - 1) == "s")
            if try_e and self._lookup():
                return
            # try removing the "es"
            w.set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            # default: retain the "e"
            w.write("e")
            self.k += 1
            if not try_e:
                self._lookup()
        else:
            if len(w) > 3 and w.at(self.k - 1) != "s" \
                    and not self._ends("ous"):
                w.set_len(self.k)
                self.k -= 1
                self._lookup()

    def past_tense(self) -> None:
        w = self.w
        if len(w) <= 4:
            return
        if self._ends("ied"):
            w.set_len(self.j + 3)
            self.k -= 1
            if self._lookup():       # died -> die
                return
            self.k += 1
            w.write("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends("ed") and self._vowel_in_stem():
            # root ending in 'e'?
            w.set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # try removing the "ed"
            w.set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            # try removing a doubled consonant
            if self._double_c(self.k):
                w.set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                w.write(w.at(self.k))
                self.k += 1
                self._lookup()
                return
            # "un-" prefix: leave alone
            if w.at(0) == "u" and w.at(1) == "n":
                w.write("e")
                w.write("d")
                self.k += 2
                return
            # default: end with 'e' (microcoded -> microcode)
            w.set_len(self.j + 1)
            w.write("e")
            self.k = self.j + 1

    def aspect(self) -> None:
        w = self.w
        if len(w) <= 5:
            return
        if self._ends("ing") and self._vowel_in_stem():
            # try stem+e
            w.set_at(self.j + 1, "e")
            w.set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # remove the 'e'
            w.set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                w.set_len(self.k + 1)
                if self._lookup():
                    return
                w.write(w.at(self.k))      # restore doubled consonant
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._cons(self.j) and self._cons(self.j - 1):
                self.k = self.j
                w.set_len(self.k + 1)
                return
            w.set_len(self.j + 1)
            w.write("e")
            self.k = self.j + 1

    def ity_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ity"):
            w.set_len(self.j + 1)          # just remove -ity
            self.k = self.j
            if self._lookup():
                return
            w.write("e")                   # -ity -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_at(self.j + 1, "i")
            w.append("ty")
            self.k = old_k
            # -ability / -ibility -> -ble (productive, accept)
            if self.j > 0 and w.at(self.j - 1) == "i" and w.at(self.j) == "l":
                w.set_len(self.j - 1)
                w.append("le")
                self.k = self.j
                self._lookup()
                return
            # -ivity -> -ive
            if self.j > 0 and w.at(self.j - 1) == "i" and w.at(self.j) == "v":
                w.set_len(self.j + 1)
                w.write("e")
                self.k = self.j + 1
                self._lookup()
                return
            # -ality: remove -ity
            if self.j > 0 and w.at(self.j - 1) == "a" and w.at(self.j) == "l":
                w.set_len(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            if self._lookup():             # variant in dict (immunity)
                return
            w.set_len(self.j + 1)          # default: remove -ity
            self.k = self.j

    def nce_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("nce"):
            ch = w.at(self.j)
            if ch not in ("e", "a"):
                return
            w.set_len(self.j)
            w.write("e")                   # adherance -> adhere
            self.k = self.j
            if self._lookup():
                return
            w.set_len(self.j)              # disappearance -> disappear
            self.k = self.j - 1
            if self._lookup():
                return
            w.write(ch)
            w.append("nce")
            self.k = old_k

    def ness_endings(self) -> None:
        w = self.w
        if self._ends("ness"):
            w.set_len(self.j + 1)
            self.k = self.j
            if w.at(self.j) == "i":
                w.set_at(self.j, "y")
            self._lookup()

    def ism_endings(self) -> None:
        w = self.w
        if self._ends("ism"):
            w.set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def ment_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ment"):
            w.set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("ment")
            self.k = old_k

    def ize_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ize"):
            w.set_len(self.j + 1)          # remove -ize entirely
            self.k = self.j
            if self._lookup():
                return
            w.write("i")
            if self._double_c(self.j):
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.at(self.j - 1))
            w.set_len(self.j + 1)
            w.write("e")                   # -ize -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("ize")
            self.k = old_k

    def ncy_endings(self) -> None:
        w = self.w
        if self._ends("ncy"):
            if w.at(self.j) not in ("e", "a"):
                return
            w.set_at(self.j + 2, "t")      # -ncy -> -nt
            w.set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_at(self.j + 2, "c")      # default: -nce
            w.write("e")
            self.k = self.j + 3
            self._lookup()

    def ble_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ble"):
            if w.at(self.j) not in ("a", "i"):
                return
            ch = w.at(self.j)
            w.set_len(self.j)              # just remove the ending
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                w.set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                w.write(w.at(self.k - 1))
            w.set_len(self.j)
            w.write("e")                   # -a/ible -> -e
            self.k = self.j
            if self._lookup():
                return
            w.set_len(self.j)
            w.append("ate")                # compensable -> compensate
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_len(self.j)
            w.write(ch)
            w.append("ble")
            self.k = old_k

    def ic_endings(self) -> None:
        w = self.w
        if self._ends("ic"):
            w.set_len(self.j + 3)
            w.append("al")                 # -ic -> -ical
            self.k = self.j + 4
            if self._lookup():
                return
            w.set_at(self.j + 1, "y")      # -ic -> -y
            w.set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_at(self.j + 1, "e")      # -ic -> -e
            if self._lookup():
                return
            w.set_len(self.j + 1)          # remove -ic
            self.k = self.j
            if self._lookup():
                return
            w.append("ic")
            self.k = self.j + 2

    def ion_endings(self) -> None:
        w, old_k = self.w, self.k
        if not self._ends("ion"):
            return
        if self._ends("ization"):          # -ization -> -ize (productive)
            w.set_len(self.j + 3)
            w.write("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("ition"):
            w.set_len(self.j + 1)
            w.write("e")                   # definition -> define
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("ition")
            self.k = old_k
        elif self._ends("ation"):
            w.set_len(self.j + 3)
            w.write("e")                   # elimination -> eliminate
            self.k = self.j + 3
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.write("e")                   # -ation -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)          # resignation -> resign
            self.k = self.j
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("ation")
            self.k = old_k
        if self._ends("ication"):
            w.set_len(self.j + 1)
            w.write("y")                   # amplification -> amplify
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("ication")
            self.k = old_k
        # plain -ion
        self.j = self.k - 3
        w.set_len(self.j + 1)
        w.write("e")                       # -ion -> -e
        self.k = self.j + 1
        if self._lookup():
            return
        w.set_len(self.j + 1)              # remove -ion
        self.k = self.j
        if self._lookup():
            return
        w.set_len(self.j + 1)
        w.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        w, old_k = self.w, self.k
        if w.at(self.k) != "r":
            return
        if self._ends("izer"):             # -izer -> -ize
            w.set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("er") or self._ends("or"):
            ch = w.at(self.j + 1)          # 'e' or 'o'
            if self._double_c(self.j):
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.at(self.j - 1))  # restore doubled consonant
            if w.at(self.j) == "i":        # -ier
                w.set_at(self.j, "y")
                w.set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                w.set_at(self.j, "i")
                w.write("e")
            if w.at(self.j) == "e":        # -eer
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write("e")
            w.set_len(self.j + 2)          # remove the -r
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)          # remove -er/-or
            self.k = self.j
            if self._lookup():
                return
            w.write("e")                   # -or -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.write(ch)
            w.write("r")
            self.k = old_k

    def ly_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ly"):
            w.set_at(self.j + 2, "e")      # -ly -> -le
            if self._lookup():
                return
            w.set_at(self.j + 2, "y")
            w.set_len(self.j + 1)          # just remove the -ly
            self.k = self.j
            if self._lookup():
                return
            if self.j > 0 and w.at(self.j - 1) == "a" and w.at(self.j) == "l":
                return                     # -ally -> -al, always
            w.append("ly")
            self.k = old_k
            if self.j > 0 and w.at(self.j - 1) == "a" and w.at(self.j) == "b":
                w.set_at(self.j + 2, "e")  # -ably -> -able, always
                self.k = self.j + 2
                return
            if w.at(self.j) == "i":        # militarily -> military
                w.set_len(self.j)
                w.write("y")
                self.k = self.j
                if self._lookup():
                    return
                w.set_len(self.j)
                w.append("ily")
                self.k = old_k
            w.set_len(self.j + 1)          # default: remove -ly
            self.k = self.j

    def al_endings(self) -> None:
        w, old_k = self.w, self.k
        if len(w) < 4:
            return
        if self._ends("al"):
            w.set_len(self.j + 1)
            self.k = self.j
            if self._lookup():             # just remove the -al
                return
            if self._double_c(self.j):
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.write(w.at(self.j - 1))
            w.set_len(self.j + 1)
            w.write("e")                   # -al -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("um")                 # optimal -> optimum
            self.k = self.j + 2
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("al")
            self.k = old_k
            if self.j > 0 and w.at(self.j - 1) == "i" and w.at(self.j) == "c":
                w.set_len(self.j - 1)      # remove -ical
                self.k = self.j - 2
                if self._lookup():
                    return
                w.set_len(self.j - 1)
                w.write("y")               # -ical -> -y
                self.k = self.j - 1
                if self._lookup():
                    return
                w.set_len(self.j - 1)
                w.append("ic")             # default: -ical -> -ic
                self.k = self.j
                self._lookup()
                return
            if w.at(self.j) == "i":        # remove -ial
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append("ial")
                self.k = old_k
                self._lookup()

    def ive_endings(self) -> None:
        w, old_k = self.w, self.k
        if self._ends("ive"):
            w.set_len(self.j + 1)          # remove -ive entirely
            self.k = self.j
            if self._lookup():
                return
            w.write("e")                   # -ive -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            w.set_len(self.j + 1)
            w.append("ive")
            if self.j > 0 and w.at(self.j - 1) == "a" and w.at(self.j) == "t":
                w.set_at(self.j - 1, "e")  # determinative -> determine
                w.set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.set_len(self.j - 1)      # just remove -ative
                if self._lookup():
                    return
                w.append("ative")
                self.k = old_k
            # -ive -> -ion (injunctive -> injunction)
            w.set_at(self.j + 2, "o")
            w.set_at(self.j + 3, "n")
            if self._lookup():
                return
            w.set_at(self.j + 2, "v")
            w.set_at(self.j + 3, "e")
            self.k = old_k

    # --------------------------------------------------------- driver

    def run(self) -> str | None:
        """None = leave the input unchanged; else the stem."""
        steps = [self.plural, self.past_tense, self.aspect,
                 self.ity_endings, self.ness_endings, self.ion_endings,
                 self.er_and_or_endings, self.ly_endings, self.al_endings]
        for step in steps:
            step()
            if self._matched():
                break
        else:
            self._word_in_dict()   # cache current word before tail rules
            for step in [self.ive_endings, self.ize_endings,
                         self.ment_endings, self.ble_endings,
                         self.ism_endings, self.ic_endings,
                         self.ncy_endings, self.nce_endings]:
                step()
                if self._matched():
                    break
        if self.me is not None and self.me[0] is not None:
            return self.me[0]      # direct conflation root
        return str(self.w)


def kstem(word: str) -> str:
    """Stem one (lowercase) word; non-alphabetic / too-short / too-long
    input and dictionary head words pass through unchanged (KStemmer
    .java:1407-1430 guard + initial dictionary check)."""
    n = len(word)
    if n <= 2 or n >= 49 or not word.isascii() or not word.isalpha() \
            or word != word.lower():
        return word
    e = _load_dict().get(word)
    if e is not None:
        return e[0] if e[0] is not None else word
    return _KStem(word).run()
