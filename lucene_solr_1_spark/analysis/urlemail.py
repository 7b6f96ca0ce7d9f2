"""UAX29URLEmailTokenizer: UAX#29 word break + URL/EMAIL rules.

Parity target: lucene/analysis/common/src/java/org/apache/lucene/
analysis/standard/UAX29URLEmailTokenizer.java (grammar:
UAX29URLEmailTokenizerImpl.jflex) — the standard word-break rules plus
three higher-priority rules:

    {URL}    -> <URL>     (HTTP/HTTPS full + scheme-less strict-host,
                           FTP, FILE — RFC 1738/3986 subset)
    mailto / ":"{EMAIL} -> <ALPHANUM>  (LUCENE-3880: keep "mailto" from
                           gluing onto the address)
    {EMAIL}  -> <EMAIL>   (RFC 5321/5322 subset incl. quoted local
                           parts and bracketed IP hosts)

jflex scanning is maximal munch (longest match wins; ties go to the
earlier rule), which a single Python alternation cannot reproduce
(leftmost-FIRST, not leftmost-longest) — e.g. in "1.2.3.4.5" the NUM
rule's 9-char match must beat IPv4's 7-char match. The tokenizer
therefore runs a scanner loop: at each position it matches the URL /
mailto / EMAIL rules and the standard TOKEN_RE (itself longest-correct,
parity-pinned by tests/test_wb_parity.py) and takes the longest match
with rule-priority tie-break.

The TLD set is the reference's ASCIITLD macro, extracted as data from
the public IANA root-zone snapshot the reference generated it from
(analysis/data/ascii_tlds.txt, tools/gen_ascii_tlds.py).

Parity is pinned by tests/test_urlemail.py against the reference's own
test vectors: TestUAX29URLEmailTokenizer.java golden cases plus the
URL/email extraction corpora (random.text.with.urls.txt -> 643 URLs,
random.text.with.email.addresses.txt -> 265 addresses,
LuceneResourcesWikiPage.html -> its URL list) and a fuzz-parity sweep
against the compiled reference DFA.

Scale note: this tokenizer is the exact/slow twin (per-doc Python
scanner). Run it Arrow-batched via tokenize_series / the mapInPandas
wrapper — the per-batch cost is one scanner pass per document, used
for URL/email extraction pipelines, not the core index hot path (the
core index uses the JVM-side StandardAnalyzer twin).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from .standard import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_RE,
    token_type,
)

__all__ = [
    "URL_RE", "EMAIL_RE", "Token", "tokenize", "analyze",
    "URL_TYPE", "EMAIL_TYPE", "tokenize_series",
]

# UAX29URLEmailTokenizer.TOKEN_TYPES indices (UAX29URLEmailTokenizer.
# java:64-72 — NOTE: different numbering than StandardTokenizer)
URL_TYPE = 7
EMAIL_TYPE = 8
# standard-type -> UAX29URLEmail-type renumbering (ALPHANUM 0->0,
# NUM 6->1, SEA 9->2, IDEO 10->3, HIRA 11->4, KATA 12->5, HANGUL 13->6)
_STD2UAX = {0: 0, 6: 1, 9: 2, 10: 3, 11: 4, 12: 5, 13: 6}

TOKEN_TYPES = ["<ALPHANUM>", "<NUM>", "<SOUTHEAST_ASIAN>", "<IDEOGRAPHIC>",
               "<HIRAGANA>", "<KATAKANA>", "<HANGUL>", "<URL>", "<EMAIL>"]


def _load_tlds() -> list[str]:
    path = os.path.join(os.path.dirname(__file__), "data", "ascii_tlds.txt")
    with open(path) as f:
        tlds = [ln.strip() for ln in f if ln.strip()]
    # longest-first so Python's first-match alternation prefers the
    # longest TLD, matching jflex maximal munch (".aero" beats ".ae")
    return sorted(tlds, key=len, reverse=True)


# --------------------------------------------------------------- URL

_TLD_ALT = "|".join(_load_tlds())
# ASCIITLD = "." ( tld... ) "."?  (trailing root-domain dot accepted)
_ASCIITLD = rf"\.(?i:{_TLD_ALT})\.?"

_DOMAIN_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?"
_DOMAIN_STRICT = rf"{_DOMAIN_LABEL}(?:\.{_DOMAIN_LABEL})*{_ASCIITLD}"
_DOMAIN_LOOSE = rf"{_DOMAIN_LABEL}(?:\.{_DOMAIN_LABEL})*"

# longest-first octet alternatives (jflex maximal munch)
_IPV4_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|0?[1-9][0-9]|0{0,2}[0-9])"
_IPV4 = rf"{_IPV4_OCTET}(?:\.{_IPV4_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = rf"(?:{_IPV4}|{_H16}:{_H16})"
_IPV6 = (
    rf"(?:(?:{_H16}:){{6}}{_LS32}"
    rf"|::(?:{_H16}:){{5}}{_LS32}"
    rf"|(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}"
    rf"|(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(?:(?:{_H16}:){{0,6}}{_H16})?::)"
)

_UNRES = r"[\-._~A-Za-z0-9]"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUBDELIM = r"[!$&'()*+,;=]"
_LOGIN_SEG = rf"(?:{_UNRES}|{_PCT}|{_SUBDELIM})*"
_LOGIN = rf"{_LOGIN_SEG}(?::{_LOGIN_SEG})?@"
_QUERY = rf"\?(?:{_UNRES}|{_PCT}|{_SUBDELIM}|[:@/?])*"
_FRAGMENT = rf"#(?:{_UNRES}|{_PCT}|{_SUBDELIM}|[:@/?])*"
_PORT = r":[0-9]{1,5}"
_HOST_STRICT = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_STRICT})"
_HOST_LOOSE = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_LOOSE})"
_AUTH_STRICT = rf"{_HOST_STRICT}(?:{_PORT})?"
_AUTH_LOOSE = rf"(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"

_HTTP_SEG = rf"(?:{_UNRES}|{_PCT}|[;:@&=])*"
_HTTP_PATH = rf"(?:/{_HTTP_SEG})*"
_HTTP_SCHEME = r"[hH][tT][tT][pP][sS]?://"
_HTTP_FULL = (rf"{_HTTP_SCHEME}{_AUTH_LOOSE}(?:{_HTTP_PATH})?"
              rf"(?:{_QUERY})?(?:{_FRAGMENT})?")
# scheme-less form excludes the login part (would swallow e-mails)
_HTTP_NOSCHEME = (rf"{_AUTH_STRICT}(?:{_HTTP_PATH})?"
                  rf"(?:{_QUERY})?(?:{_FRAGMENT})?")
_HTTP_URL = rf"(?:{_HTTP_FULL}|{_HTTP_NOSCHEME})"

_FF_SEG = rf"(?:{_UNRES}|{_PCT}|[?:@&=])*"
_FF_PATH = rf"/{_FF_SEG}(?:/{_FF_SEG})*"
_FTP_TYPE = r";[tT][yY][pP][eE]=[aAiIdD]"
_FTP_URL = (rf"[fF][tT][pP]://{_AUTH_LOOSE}{_FF_PATH}"
            rf"(?:{_FTP_TYPE})?(?:{_FRAGMENT})?")
_FILE_URL = (rf"[fF][iI][lL][eE]://(?:{_HOST_LOOSE})?{_FF_PATH}"
             rf"(?:{_FRAGMENT})?")

URL_RE = re.compile(rf"(?:{_HTTP_URL}|{_FTP_URL}|{_FILE_URL})")

# ------------------------------------------------------------- EMAIL

_QUOTED = (r"\"(?:[\x01-\x08\x0B\x0C\x0E-\x21\x23-\x5B\x5D-\x7E]"
           r"|\\[\x00-\x7F])*\"")
# NB: the jflex class [...!#$%&'*+-/=?^_`{|}~] contains the RANGE +-/
# (i.e. + , - . /), so ',' and '.' are atom chars — this is what makes
# ",personB@example.com" a single <EMAIL> token (testMailtoSchemeEmails)
_ATOM = r"[A-Za-z0-9!#$%&'*+,\-./=?^_`{|}~]"
_LABEL = rf"(?:{_ATOM}+|{_QUOTED})"
_LOCAL = rf"{_LABEL}(?:\.{_LABEL})*"
_DOMLIT_TEXT = r"(?:[\x01-\x08\x0B\x0C\x0E-\x5A\x5E-\x7F]|\\[\x00-\x7F])"
_BRACKET_HOST = rf"\[(?:{_DOMLIT_TEXT}*|{_IPV4}|[iI][pP][vV]6:{_IPV6})\]"

EMAIL_RE = re.compile(rf"{_LOCAL}@(?:{_DOMAIN_STRICT}|{_BRACKET_HOST})")

# LUCENE-3880 guard rule: [mM][aA][iI][lL][tT][oO] / ":" {EMAIL}.
# jflex lookahead rules compete in maximal munch with the FULL r+s
# length (the scanner matches r s then pushes s back), so the rule is
# compiled consuming and the scanner emits only the "mailto" prefix —
# that's how 6-char "mailto" beats the 11-char WORD "mailto:test".
_MAILTO_RE = re.compile(
    rf"([mM][aA][iI][lL][tT][oO]):{_LOCAL}@(?:{_DOMAIN_STRICT}|{_BRACKET_HOST})")


@dataclass
class Token:
    term: str
    type: int  # index into TOKEN_TYPES
    start: int
    end: int


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[Token]:
    """Maximal-munch scan: longest of {URL, mailto, EMAIL, standard}
    wins at each position; ties break by rule priority (that order —
    the jflex rule order, UAX29URLEmailTokenizerImpl.jflex:212-222)."""
    out: list[Token] = []
    n = len(text)
    i = 0
    url_m, mailto_m, email_m, std_m = (URL_RE.match, _MAILTO_RE.match,
                                       EMAIL_RE.match, TOKEN_RE.match)
    while i < n:
        best_cmp = 0       # maximal-munch comparison length (incl. lookahead)
        best_rule = -1
        best_text = None   # emitted token (the consumed part only)
        for prio, matcher in enumerate((url_m, mailto_m, email_m, std_m)):
            m = matcher(text, i)
            if m is not None:
                cmp_len = m.end() - i
                if cmp_len > best_cmp:
                    best_cmp = cmp_len
                    best_rule = prio
                    # lookahead rule: consume only group(1) ("mailto")
                    best_text = m.group(1) if prio == 1 else m.group(0)
        if best_cmp == 0:
            i += 1
            continue
        adv = len(best_text)
        if adv <= max_token_length:
            if best_rule == 0:
                typ = URL_TYPE
            elif best_rule == 1:
                typ = 0  # <ALPHANUM> "mailto"
            elif best_rule == 2:
                typ = EMAIL_TYPE
            else:
                typ = _STD2UAX[token_type(best_text)]
            out.append(Token(best_text, typ, i, i + adv))
        i += adv
    return out


def analyze(text: str, stop_filter: bool = True,
            max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """UAX29URLEmailAnalyzer chain (UAX29URLEmailAnalyzer.java:62-70):
    tokenizer -> StandardFilter(no-op) -> LowerCase -> Stop(33)."""
    toks = []
    for t in tokenize(text or "", max_token_length):
        lt = t.term.lower()
        if stop_filter and lt in ENGLISH_STOP_WORDS:
            continue
        toks.append(lt)
    return toks


def tokenize_series(texts, max_token_length: int = MAX_TOKEN_LENGTH):
    """pandas Series[str] -> Series[list[(term, type_str)]] — the
    Arrow-batch kernel for mapInPandas URL/email extraction."""
    return texts.fillna("").map(
        lambda s: [(t.term, TOKEN_TYPES[t.type])
                   for t in tokenize(s, max_token_length)])


def extract_urls_emails_df(df, text_col: str = "text", id_col: str = "doc_id"):
    """Spark DataFrame (id, text) -> (id, term, type) rows for every
    <URL>/<EMAIL> token, Arrow-batched via mapInPandas (the analyzer
    runs per batch partition; no shuffle — a pure narrow map)."""
    from pyspark.sql import functions as F  # noqa: F401

    out_schema = f"{id_col} long, term string, type string"

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = {"_id": [], "term": [], "type": []}
            for i, s in zip(pdf[id_col], pdf[text_col].fillna("")):
                for t in tokenize(s, 2 ** 31 - 1):
                    if t.type in (URL_TYPE, EMAIL_TYPE):
                        rows["_id"].append(i)
                        rows["term"].append(t.term)
                        rows["type"].append(TOKEN_TYPES[t.type])
            yield pd.DataFrame(
                {id_col: rows["_id"], "term": rows["term"],
                 "type": rows["type"]})

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
