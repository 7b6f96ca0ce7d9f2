"""Greek stemmer (Ntais, "Development of a Stemmer for the Greek
Language", with the reference's amendments).

Python twin of GreekStemFilter's kernel (ref: lucene/analysis/common/
src/java/org/apache/lucene/analysis/el/GreekStemmer.java:34).  Input
must already be Greek-casefolded (final sigma folded, diacritics
removed) — `lang_filters.greek_lowercase` does exactly that, mirroring
GreekLowerCaseFilter.

Twenty "short" rules (each a suffix strip with an exception list that
re-attaches part of the suffix), then the rule-21 "long list" only when
none of them fired, then the rule-22 comparative/superlative strip.
The reference's own && / || precedence (the guard binds only the first
disjunct in several multi-suffix conditions, letting the later suffixes
match whole words) is preserved — it is observable on exact-length
inputs and pinned by the reference's 343 test vectors.

Validated against every checkOneTerm vector in TestGreekStemmer.java.
"""
from __future__ import annotations

__all__ = ["greek_stem"]

_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")     # rule 8/9: υ excluded

_EXC4 = {"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"}
_EXC6 = {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ",
         "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
         "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ",
         "συνομηλ", "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν",
         "πρωτοδ", "σερτ", "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ",
         "χασ"}
_EXC7 = {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
         "πικρ", "ποτ", "σιχ", "χ"}
_EXC8A = {"τρ", "τσ"}
_EXC8B = {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
          "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν",
          "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ",
          "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ",
          "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν",
          "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ",
          "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ",
          "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ",
          "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ",
          "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
          "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ",
          "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ",
          "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ",
          "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
          "ψηλοταβ"}
_EXC9 = {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
         "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ",
         "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"}
_EXC12A = {"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"}
_EXC12B = {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"}
_EXC13 = {"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"}
_EXC14 = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
          "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
          "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ",
          "καθαρευ", "πλε", "τσα"}
_EXC15A = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
           "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
           "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ",
           "προσωποπ", "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
           "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν", "επιτ",
           "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π",
           "τρ", "μ"}
_EXC15B = {"ψοφ", "ναυλοχ"}
_EXC16 = {"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"}
_EXC17 = {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
          "κοινοχρ", "παλιμψ"}
_EXC18 = {"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"}
_EXC19 = {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}


def _ew(w: str, *suffixes: str) -> str | None:
    for suf in suffixes:
        if w.endswith(suf):
            return suf
    return None


def _vowel(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _vowel_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def greek_stem(word: str) -> str:    # noqa: C901  (rule-per-rule port)
    if len(word) < 4:
        return word
    w = word
    orig = len(w)

    # rule 0 — irregular neuters (καθεστώς, γεγονός, κρέας, φως ...)
    for guard, sufs, cut in (
            (9, ("καθεστωτοσ", "καθεστωτων"), 4),
            (8, ("γεγονοτοσ", "γεγονοτων"), 4),
            (8, ("καθεστωτα",), 3),
            (7, ("τατογιου", "τατογιων"), 4),
            (7, ("γεγονοτα",), 3),
            (7, ("καθεστωσ",), 2),
            (6, ("σκαγιου", "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ",
                 "κρεατων", "περατοσ", "περατων", "τερατοσ",
                 "τερατων"), 4),
            (6, ("τατογια",), 3),
            (6, ("γεγονοσ",), 2),
            (5, ("φαγιου", "φαγιων", "σογιου", "σογιων"), 4),
            (5, ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"), 3),
            (4, ("φαγια", "σογια", "φωτοσ", "φωτων"), 3),
            (4, ("κρεασ", "περασ", "τερασ"), 2),
            (3, ("φωτα",), 2),
            (2, ("φωσ",), 1)):
        if len(w) > guard and _ew(w, *sufs):
            w = w[:-cut]
            break

    # rule 1: -αδεσ/-αδων, keep -αδ for family nouns
    if len(w) > 4 and _ew(w, "αδεσ", "αδων"):
        base = w[:-4]
        if _ew(base, "οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
               "νταντ", "κυρ", "θει", "πεθερ"):
            w = base
        else:
            w = base + "αδ"

    # rule 2: -εδεσ/-εδων
    if len(w) > 4 and _ew(w, "εδεσ", "εδων"):
        base = w[:-4]
        w = base + "εδ" if _ew(base, "οπ", "ιπ", "εμπ", "υπ", "γηπ",
                               "δαπ", "κρασπ", "μιλ") else base

    # rule 3: -ουδεσ/-ουδων
    if len(w) > 5 and _ew(w, "ουδεσ", "ουδων"):
        base = w[:-5]
        w = base + "ουδ" if _ew(base, "αρκ", "καλιακ", "πεταλ", "λιχ",
                                "πλεξ", "σκ", "σ", "φλ", "φρ", "βελ",
                                "λουλ", "χν", "σπ", "τραγ", "φε") \
            else base

    # rule 4: -εωσ/-εων
    if len(w) > 3 and _ew(w, "εωσ", "εων"):
        w = w[:-3]
        if w in _EXC4:
            w += "ε"

    # rule 5: -ια / -ιου/-ιων (keep -ι after a vowel)
    if len(w) > 2 and w.endswith("ια"):
        w = w[:-2]
        if _vowel(w):
            w += "ι"
    elif len(w) > 3 and _ew(w, "ιου", "ιων"):
        w = w[:-3]
        if _vowel(w):
            w += "ι"

    # rule 6: -ικα/-ικο/-ικου/-ικων
    removed = False
    if len(w) > 3 and _ew(w, "ικα", "ικο"):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and _ew(w, "ικου", "ικων"):
        w = w[:-4]
        removed = True
    if removed and (_vowel(w) or w in _EXC6):
        w += "ικ"

    # rule 7: -αγαμε/-ησαμε/-ουσαμε/-ηθηκαμε ... -αμε
    if len(w) == 5 and w.endswith("αγαμε"):
        w = w[:-1]
    else:
        if len(w) > 7 and w.endswith("ηθηκαμε"):
            w = w[:-7]
        elif len(w) > 6 and w.endswith("ουσαμε"):
            w = w[:-6]
        elif len(w) > 5 and _ew(w, "αγαμε", "ησαμε", "ηκαμε"):
            w = w[:-5]
        if len(w) > 3 and w.endswith("αμε"):
            w = w[:-3]
            if w in _EXC7:
                w += "αμ"

    # rule 8: -ανε family (Java precedence: the length guard binds only
    # the FIRST suffix of each disjunction — later suffixes match
    # whole words of exactly their own length)
    removed = False
    if len(w) > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    elif ((len(w) > 7 and w.endswith("ιοντανε"))
          or _ew(w, "ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif ((len(w) > 6 and w.endswith("ιοτανε"))
          or _ew(w, "οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif ((len(w) > 5 and w.endswith("αγανε"))
          or _ew(w, "ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w += "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        w = w[:-3]
        if _vowel_no_y(w) or w in _EXC8B:
            w += "αν"

    # rule 9: -ησετε / -ετε
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        w = w[:-3]
        if (w in _EXC9 or _vowel_no_y(w)
                or _ew(w, "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
                       "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ",
                       "ροθ", "σθ", "πυρ", "αιν", "συνδ", "συν",
                       "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                       "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ",
                       "ωφελ")):
            w += "ετ"

    # rule 10: -οντασ/-ωντασ
    if len(w) > 5 and _ew(w, "οντασ", "ωντασ"):
        w = w[:-5]
        if len(w) == 3 and w.endswith("αρχ"):
            w += "οντ"
        if w.endswith("κρε"):
            w += "ωντ"

    # rule 11: -ομαστε/-ιομαστε
    if len(w) > 6 and w.endswith("ομαστε"):
        w = w[:-6]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"
    elif len(w) > 7 and w.endswith("ιομαστε"):
        w = w[:-7]
        if len(w) == 2 and w.endswith("ον"):
            w += "ομαστ"

    # rule 12: -ιεστε / -εστε
    if len(w) > 5 and w.endswith("ιεστε"):
        w = w[:-5]
        if w in _EXC12A:
            w += "ιεστ"
    if len(w) > 4 and w.endswith("εστε"):
        w = w[:-4]
        if w in _EXC12B:
            w += "εστ"

    # rule 13: -ηθηκα/-ηθηκε/-ηθηκεσ then -ηκεσ/-ηκα/-ηκε
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and _ew(w, "ηθηκα", "ηθηκε"):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and _ew(w, "ηκα", "ηκε"):
        w = w[:-3]
        removed = True
    if removed and (w in _EXC13 or _ew(w, "σκωλ", "σκουλ", "ναρθ",
                                       "σφ", "οθ", "πιθ")):
        w += "ηκ"

    # rule 14: -ουσεσ/-ουσα/-ουσε
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and _ew(w, "ουσα", "ουσε"):
        w = w[:-4]
        removed = True
    if removed and (w in _EXC14 or _vowel(w)
                    or _ew(w, "ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                           "μαντιλ", "μαλλ", "κυματ", "λαχ", "ληγ",
                           "φαγ", "ομ", "πρωτ")):
        w += "ουσ"

    # rule 15: -αγεσ/-αγα/-αγε
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and _ew(w, "αγα", "αγε"):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = (w in _EXC15A
                 or _ew(w, "οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ",
                        "πρ", "λοχ", "σμην"))
        cond2 = w in _EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w += "αγ"

    # rule 16: -ησου/-ησε/-ησα
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and _ew(w, "ησε", "ησα"):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w += "ησ"

    # rule 17: -ηστε
    if len(w) > 4 and w.endswith("ηστε"):
        w = w[:-4]
        if w in _EXC17:
            w += "ηστ"

    # rule 18: -ησουνε/-ηθουνε/-ουνε
    removed = False
    if len(w) > 6 and _ew(w, "ησουνε", "ηθουνε"):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w += "ουν"

    # rule 19: -ησουμε/-ηθουμε/-ουμε
    removed = False
    if len(w) > 6 and _ew(w, "ησουμε", "ηθουμε"):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w += "ουμ"

    # rule 20: -ματων/-ματοσ/-ματα
    if len(w) > 5 and _ew(w, "ματων", "ματοσ"):
        w = w[:-3]
    elif len(w) > 4 and w.endswith("ματα"):
        w = w[:-2]

    # rule 21 (the "long list") — only if nothing above fired
    if len(w) == orig:
        for guard, sufs in (
                (9, ("ιοντουσαν",)),
                (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
                (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
                     "ιοσουνα", "ιουνται", "ιουνταν", "ηθηκατε",
                     "ομασταν", "οσασταν", "ουμαστε")),
                (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν",
                     "ομουνα", "οσαστε", "οσουνα", "ουνται", "ουνταν",
                     "ουσατε")),
                (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν",
                     "ιουμα", "ηθεισ", "ηθουν", "ηκατε", "ησατε",
                     "ησουν", "ομουν", "ονται", "ονταν", "οσουν",
                     "ουμαι", "ουσαν")),
                (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι",
                     "εται", "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν",
                     "ησει", "ησεσ", "ομαι", "οταν")),
                (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
                (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ",
                     "ου", "υσ", "ων"))):
            if len(w) > guard:
                suf = _ew(w, *sufs)
                if suf:
                    w = w[:-len(suf)]
                    break
        else:
            if len(w) > 1 and _vowel(w):
                w = w[:-1]

    # rule 22: comparatives / superlatives
    if _ew(w, "εστερ", "εστατ"):
        w = w[:-5]
    elif _ew(w, "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ"):
        w = w[:-4]

    return w
