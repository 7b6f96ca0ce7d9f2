"""WikipediaTokenizer: wiki-markup-aware tokenization.

Parity target: lucene/analysis/common/src/java/org/apache/lucene/
analysis/wikipedia/WikipediaTokenizer.java (grammar:
WikipediaTokenizerImpl.jflex) — a 10-state scanner over MediaWiki
syntax emitting typed tokens (internal/external links, categories,
bold/italics, headings, citations) over a ClassicTokenizer-style base
alphabet, plus the wrapper's three output modes:

    TOKENS_ONLY      every scanner token as-is
    UNTOKENIZED_ONLY runs of same-type wiki tokens whose type is in
                     `untokenized_types` collapse into ONE token whose
                     text preserves the original inter-token spacing
                     (gap chars become spaces, then trimmed), flagged
                     UNTOKENIZED_TOKEN_FLAG
    BOTH             the collapsed token first, then its constituents
                     (first constituent at posInc 0 — stacked on the
                     collapsed token's position)

The scanner is a maximal-munch state machine: per state, every rule
regex is matched at the cursor and the longest match wins (ties by
rule order) — exactly jflex semantics. All state actions (currentTokType,
numBalanced, positionInc, numLinkToks, numWikiTokensSeen) mirror the
grammar's embedded actions line by line, including its quirks (the
STRING-state {PIPE} rule emits the '|' itself; DOUBLE_BRACE_STATE
resets numWikiTokensSeen to 0 on every token, which stops the
collapse loop after one citation word).

Parity pinned by tests/test_wikipedia.py: the reference's own
WikipediaTokenizerTest goldens (testSimple/testHandwritten/testLinks/
testLinkPhrases/testLucene1133/testBoth incl. offsets, posIncs and
flags) plus full-stream fuzz parity against the compiled reference
scanner (tools/ref_tokenizer.py which="wikipedia").
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["WikipediaTokenizer", "scan", "TOKEN_TYPES",
           "TOKENS_ONLY", "UNTOKENIZED_ONLY", "BOTH",
           "UNTOKENIZED_TOKEN_FLAG",
           "INTERNAL_LINK", "EXTERNAL_LINK", "EXTERNAL_LINK_URL",
           "CITATION", "CATEGORY", "BOLD", "ITALICS", "BOLD_ITALICS",
           "HEADING", "SUB_HEADING"]

# ---- token types (WikipediaTokenizer.java:40-92)
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

(ALPHANUM_ID, APOSTROPHE_ID, ACRONYM_ID, COMPANY_ID, EMAIL_ID, HOST_ID,
 NUM_ID, CJ_ID, INTERNAL_LINK_ID, EXTERNAL_LINK_ID, CITATION_ID,
 CATEGORY_ID, BOLD_ID, ITALICS_ID, BOLD_ITALICS_ID, HEADING_ID,
 SUB_HEADING_ID, EXTERNAL_LINK_URL_ID) = range(18)

TOKEN_TYPES = ["<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
               "<EMAIL>", "<HOST>", "<NUM>", "<CJ>", INTERNAL_LINK,
               EXTERNAL_LINK, CITATION, CATEGORY, BOLD, ITALICS,
               BOLD_ITALICS, HEADING, SUB_HEADING, EXTERNAL_LINK_URL]

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

# ---- character classes (WikipediaTokenizerImpl.jflex:148-162;
# %unicode 3.0 fixed ranges — the pre-3.1 limited alphabet)
_LETTER = ("A-Za-zÀ-ÖØ-öø-ÿ"
           "Ā-῿ﾠ-ￜ")
_DIGIT = ("0-9٠-٩۰-۹०-९০-৯"
          "੦-੯૦-૯୦-୯௧-௯"
          "౦-౯೦-೯൦-൯๐-๙"
          "໐-໙၀-၉")
_KOREAN = "가-힯ᄀ-ᇿ"
_CJ = ("぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ"
       "㌀-㍿㐀-䶿一-鿿豈-﫿"
       "･-ﾟ")

_AN = rf"[{_LETTER}{_DIGIT}{_KOREAN}]+"           # ALPHANUM
_ALPHA = rf"[{_LETTER}]+"
_P = r"[_\-/.,]"
_LD = rf"[{_LETTER}{_DIGIT}]"
_HAS_DIGIT = rf"{_LD}*[{_DIGIT}]{_LD}*"
# NUM's seven alternatives overlap and jflex picks the LONGEST overall
# ("x-3.25" must match the ALPHANUM(P HAS_DIGIT P ALPHANUM)+ branch at
# 6 chars, not the ALPHANUM P HAS_DIGIT branch at 3) — Python's
# alternation is first-match, so the scanner matches each branch
# separately and keeps the longest (_Longest below).
_NUM_ALTS = [rf"{_AN}{_P}{_HAS_DIGIT}",
             rf"[{_DIGIT}]+{_P}[{_DIGIT}]+",
             rf"{_HAS_DIGIT}{_P}{_AN}",
             rf"{_AN}(?:{_P}{_HAS_DIGIT}{_P}{_AN})+",
             rf"{_HAS_DIGIT}(?:{_P}{_AN}{_P}{_HAS_DIGIT})+",
             rf"{_AN}{_P}{_HAS_DIGIT}(?:{_P}{_AN}{_P}{_HAS_DIGIT})+",
             rf"{_HAS_DIGIT}{_P}{_AN}(?:{_P}{_HAS_DIGIT}{_P}{_AN})+"]
_WS = r"(?:\r\n|[ \r\n\t\f])"
_TAGS = rf"</?{_AN}(?:{_WS}*{_AN}=\"{_AN}\")*>"

_APOS = rf"{_ALPHA}(?:'{_ALPHA})+"
_ACRONYM = rf"{_ALPHA}\.(?:{_ALPHA}\.)+"
_COMPANY = rf"{_ALPHA}[&@]{_ALPHA}"
_EMAIL = (rf"{_AN}(?:[._\-]{_AN})*@{_AN}(?:[.\-]{_AN})+")
_HOST = rf"{_AN}(?:\.{_AN})+"

# external-link URL (EXTERNAL_LINK_STATE rule)
_EXT_URL = (rf"(?:http://|https://){_HOST}"
            rf"(?:/?(?:{_AN}|{_P}|[?&=#])*)*")

# scanner states
(YYINITIAL, CATEGORY_STATE, INTERNAL_LINK_STATE, EXTERNAL_LINK_STATE,
 TWO_SINGLE_QUOTES_STATE, THREE_SINGLE_QUOTES_STATE,
 FIVE_SINGLE_QUOTES_STATE, DOUBLE_EQUALS_STATE, DOUBLE_BRACE_STATE,
 STRING) = range(10)


class _Longest:
    """Regex-like wrapper: .match returns the longest match across
    alternative patterns (jflex maximal munch within one rule)."""

    def __init__(self, patterns):
        self._res = [re.compile(p) for p in patterns]

    def match(self, text, pos):
        best = None
        for rx in self._res:
            m = rx.match(text, pos)
            if m is not None and (best is None or m.end() > best.end()):
                best = m
        return best


@dataclass
class _Tok:
    type: int
    start: int
    text: str
    pos_inc: int
    wiki_seen: int  # numWikiTokensSeen at emission


class _Scanner:
    """Mirror of WikipediaTokenizerImpl: rules as (regex, action) per
    state, longest-match-wins with rule-order tie-break."""

    def __init__(self):
        c = re.compile
        an, ws = c(_AN), c(_WS)
        dot = c(r"(?s).")
        dbl_bracket = c(r"\[\[")
        dbl_bracket_close = c(r"\]\]")
        dbl_bracket_cat = c(r"\[\[:?Category:")
        ext_link = c(r"\[")
        two_sq = c(r"''")
        dbl_eq = c(r"==")
        dbl_brace = c(r"\{\{")
        dbl_brace_close = c(r"\}\}")
        cite = c(r"<ref>")
        cite_close = c(r"</ref>")
        infobox = c(r"\{\{[Ii]nfobox_")

        def emit(tok_type=None, pos_inc=None, seen_inc=False,
                 seen_zero=False, to=None):
            """Build an emitting action."""
            def act(s, m):
                if seen_zero:
                    s.num_wiki_seen = 0
                if seen_inc:
                    s.num_wiki_seen += 1
                if pos_inc is not None:
                    s.position_inc = pos_inc
                if to is not None:
                    s.state = to
                return tok_type if tok_type != -1 else s.current_type
            return act

        def skip(**kw):
            def act(s, m):
                if kw.get("seen_zero"):
                    s.num_wiki_seen = 0
                if "pos_inc" in kw:
                    s.position_inc = kw["pos_inc"]
                if "cur" in kw:
                    s.current_type = kw["cur"]
                if "to" in kw:
                    s.state = kw["to"]
                if kw.get("links_zero"):
                    s.num_link_toks = 0
                return None
            return act

        def two_quotes_initial(s, m):
            # YYINITIAL {TWO_SINGLE_QUOTES}: open vs close toggle
            s.num_wiki_seen = 0
            s.position_inc = 1
            if s.num_balanced == 0:
                s.num_balanced += 1
                s.state = TWO_SINGLE_QUOTES_STATE
            else:
                s.num_balanced = 0
            return None

        def ext_url(s, m):
            s.position_inc = 1
            s.num_wiki_seen += 1
            return s.current_type

        def ext_alnum(s, m):
            s.position_inc = 0 if s.num_link_toks == 0 else 1
            s.num_wiki_seen += 1
            s.current_type = EXTERNAL_LINK_ID
            s.num_link_toks += 1
            return s.current_type

        def ext_close(s, m):
            s.num_link_toks = 0
            s.position_inc = 0
            s.state = YYINITIAL
            return None

        def string_emit(s, m):
            s.num_wiki_seen += 1
            return s.current_type

        def brace_emit(s, m):
            # DOUBLE_BRACE_STATE {ALPHANUM}: numWikiTokensSeen = 0 (not ++)
            s.num_wiki_seen = 0
            return s.current_type

        ign = skip()
        tags = c(_TAGS)
        self.rules = {
            YYINITIAL: [
                (an, emit(ALPHANUM_ID, pos_inc=1)),
                (c(_APOS), emit(APOSTROPHE_ID, pos_inc=1)),
                (c(_ACRONYM), emit(ACRONYM_ID, pos_inc=1)),
                (c(_COMPANY), emit(COMPANY_ID, pos_inc=1)),
                (c(_EMAIL), emit(EMAIL_ID, pos_inc=1)),
                (_Longest(_NUM_ALTS), emit(NUM_ID, pos_inc=1)),
                (c(_HOST), emit(HOST_ID, pos_inc=1)),
                (c(rf"[{_CJ}]"), emit(CJ_ID, pos_inc=1)),
                (dbl_bracket, skip(seen_zero=True, pos_inc=1,
                                   cur=INTERNAL_LINK_ID,
                                   to=INTERNAL_LINK_STATE)),
                (dbl_bracket_cat, skip(seen_zero=True, pos_inc=1,
                                       cur=CATEGORY_ID,
                                       to=CATEGORY_STATE)),
                (ext_link, skip(seen_zero=True, pos_inc=1,
                                cur=EXTERNAL_LINK_URL_ID,
                                to=EXTERNAL_LINK_STATE)),
                (two_sq, two_quotes_initial),
                (dbl_eq, skip(seen_zero=True, pos_inc=1,
                              to=DOUBLE_EQUALS_STATE)),
                (dbl_brace, skip(seen_zero=True, pos_inc=1,
                                 cur=CITATION_ID, to=DOUBLE_BRACE_STATE)),
                (cite, skip(seen_zero=True, pos_inc=1,
                            cur=CITATION_ID, to=DOUBLE_BRACE_STATE)),
                (dot, skip(seen_zero=True, pos_inc=1)),
                (ws, skip(seen_zero=True, pos_inc=1)),
                (infobox, skip(seen_zero=True, pos_inc=1)),
            ],
            INTERNAL_LINK_STATE: [
                (an, emit(-1, seen_inc=True, to=INTERNAL_LINK_STATE)),
                (dbl_bracket_close, skip(links_zero=True, to=YYINITIAL)),
                (dot, skip(pos_inc=1)),
                (ws, skip(pos_inc=1)),
            ],
            EXTERNAL_LINK_STATE: [
                (c(_EXT_URL), ext_url),
                (an, ext_alnum),
                (c(r"\]"), ext_close),
                (ws, skip(pos_inc=1)),
            ],
            CATEGORY_STATE: [
                (an, emit(-1, seen_inc=True, to=CATEGORY_STATE)),
                (dbl_bracket_close, skip(to=YYINITIAL)),
                (dot, skip(pos_inc=1)),
                (ws, skip(pos_inc=1)),
            ],
            TWO_SINGLE_QUOTES_STATE: [
                (c(r"'"), skip(cur=BOLD_ID, to=THREE_SINGLE_QUOTES_STATE)),
                (c(r"'''"), skip(cur=BOLD_ITALICS_ID,
                                 to=FIVE_SINGLE_QUOTES_STATE)),
                (an, self._make_italics()),
                (dbl_bracket, skip(cur=INTERNAL_LINK_ID, seen_zero=True,
                                   to=INTERNAL_LINK_STATE)),
                (dbl_bracket_cat, skip(cur=CATEGORY_ID, seen_zero=True,
                                       to=CATEGORY_STATE)),
                (ext_link, skip(cur=EXTERNAL_LINK_ID, seen_zero=True,
                                to=EXTERNAL_LINK_STATE)),
                (dot, ign),
                (ws, ign),
            ],
            THREE_SINGLE_QUOTES_STATE: [
                (an, emit(-1, seen_inc=True, to=STRING)),
                (dbl_bracket, skip(cur=INTERNAL_LINK_ID, seen_zero=True,
                                   to=INTERNAL_LINK_STATE)),
                (dbl_bracket_cat, skip(cur=CATEGORY_ID, seen_zero=True,
                                       to=CATEGORY_STATE)),
                (ext_link, skip(cur=EXTERNAL_LINK_ID, seen_zero=True,
                                to=EXTERNAL_LINK_STATE)),
                (dot, ign),
                (ws, ign),
            ],
            FIVE_SINGLE_QUOTES_STATE: [
                (an, emit(-1, seen_inc=True, to=STRING)),
                (dbl_bracket, skip(cur=INTERNAL_LINK_ID, seen_zero=True,
                                   to=INTERNAL_LINK_STATE)),
                (dbl_bracket_cat, skip(cur=CATEGORY_ID, seen_zero=True,
                                       to=CATEGORY_STATE)),
                (ext_link, skip(cur=EXTERNAL_LINK_ID, seen_zero=True,
                                to=EXTERNAL_LINK_STATE)),
                (dot, ign),
                (ws, ign),
            ],
            DOUBLE_EQUALS_STATE: [
                (c(r"="), skip(cur=SUB_HEADING_ID, seen_zero=True,
                               to=STRING)),
                (an, self._make_heading()),
                (dbl_eq, skip(to=YYINITIAL)),
                (dot, ign),
                (ws, ign),
            ],
            DOUBLE_BRACE_STATE: [
                (an, brace_emit),
                (dbl_brace_close, skip(to=YYINITIAL)),
                (cite_close, skip(to=YYINITIAL)),
                (dot, ign),
                (ws, ign),
            ],
            STRING: [
                (c(r"'''''"), self._make_string_close()),
                (c(r"'''"), self._make_string_close()),
                (c(r"''"), self._make_string_close()),
                (c(r"==="), self._make_string_close()),
                (an, string_emit),
                (dbl_bracket, self._make_string_wiki(INTERNAL_LINK_ID,
                                                     INTERNAL_LINK_STATE)),
                (dbl_bracket_cat, self._make_string_wiki(CATEGORY_ID,
                                                         CATEGORY_STATE)),
                (ext_link, self._make_string_wiki(EXTERNAL_LINK_ID,
                                                  EXTERNAL_LINK_STATE)),
                # {PIPE} emits the '|' char itself with the current wiki
                # type, WITHOUT bumping numWikiTokensSeen (jflex:320)
                (c(r"\|"), lambda s, m: s.current_type),
                (dot, ign),
                (ws, ign),
            ],
        }
        # jflex %state states are INCLUSIVE: the file-final catch-all
        # rule  ". | {WHITESPACE} | {TAGS}  { ignore }"  applies in
        # EVERY state at lowest priority — this is what swallows HTML
        # tags (<sup>, <span class="...">) whole instead of tokenizing
        # their names (WikipediaTokenizerImpl.jflex:335)
        for _state_rules in self.rules.values():
            _state_rules.append((tags, ign))
            _state_rules.append((dot, ign))
            _state_rules.append((ws, ign))

    @staticmethod
    def _make_italics():
        def act(s, m):
            s.current_type = ITALICS_ID
            s.num_wiki_seen += 1
            s.state = STRING
            return s.current_type
        return act

    @staticmethod
    def _make_heading():
        def act(s, m):
            s.current_type = HEADING_ID
            s.state = DOUBLE_EQUALS_STATE
            s.num_wiki_seen += 1
            return s.current_type
        return act

    @staticmethod
    def _make_string_close():
        def act(s, m):
            s.num_balanced = 0
            s.current_type = ALPHANUM_ID
            s.state = YYINITIAL
            return None
        return act

    @staticmethod
    def _make_string_wiki(cur, to):
        def act(s, m):
            s.num_balanced = 0
            s.num_wiki_seen = 0
            s.current_type = cur
            s.state = to
            return None
        return act

    def scan(self, text: str):
        self.state = YYINITIAL
        self.current_type = ALPHANUM_ID
        self.num_balanced = 0
        self.position_inc = 1
        self.num_link_toks = 0
        self.num_wiki_seen = 0
        i, n = 0, len(text)
        out: list[_Tok] = []
        while i < n:
            rules = self.rules[self.state]
            best_m = None
            best_act = None
            best_len = 0
            for rx, act in rules:
                m = rx.match(text, i)
                if m is not None and m.end() - i > best_len:
                    best_m, best_act, best_len = m, act, m.end() - i
            if best_m is None:  # no rule matched (jflex would error;
                i += 1          # be forgiving: skip a char)
                continue
            typ = best_act(self, best_m)
            if typ is not None:
                out.append(_Tok(typ, i, best_m.group(0),
                                self.position_inc, self.num_wiki_seen))
            i += best_len
        # scanner.getPositionIncrement() after the last getNextToken
        # returns YYEOF (ignored trailing rules may have mutated it) —
        # the wrapper's collapse loop reads it when it breaks at EOF
        self.final_pos_inc = self.position_inc
        return out


_SCANNER = _Scanner()


def scan(text: str) -> tuple[list[_Tok], int]:
    """Raw scanner tokens (type_id, start, text, posInc, wikiSeen) and
    the scanner's final positionInc (read by the collapse loop when it
    breaks at EOF — mirrors getPositionIncrement after YYEOF)."""
    toks = _SCANNER.scan(text or "")
    return toks, _SCANNER.final_pos_inc


@dataclass
class WikiToken:
    term: str
    type: str
    start: int
    end: int
    pos_inc: int
    flags: int


class WikipediaTokenizer:
    """The wrapper with TOKENS_ONLY / UNTOKENIZED_ONLY / BOTH output
    (WikipediaTokenizer.java:180-296 incrementToken/collapse*)."""

    def __init__(self, token_output: int = TOKENS_ONLY,
                 untokenized_types: set[str] | None = None):
        if token_output not in (TOKENS_ONLY, UNTOKENIZED_ONLY, BOTH):
            raise ValueError(
                "tokenOutput must be TOKENS_ONLY, UNTOKENIZED_ONLY or BOTH")
        self.token_output = token_output
        self.untokenized_types = untokenized_types or set()

    def tokenize(self, text: str) -> list[WikiToken]:
        raw, final_pos_inc = scan(text)
        out: list[WikiToken] = []
        i = 0
        first = True

        def push(term, typ, start, end, pos_inc, flags=0):
            nonlocal first
            if first and pos_inc == 0:
                pos_inc = 1  # don't emit posinc=0 for the first token
            first = False
            out.append(WikiToken(term, typ, start, end, pos_inc, flags))

        while i < len(raw):
            t = raw[i]
            type_str = TOKEN_TYPES[t.type]
            if (self.token_output == TOKENS_ONLY
                    or type_str not in self.untokenized_types):
                push(t.text, type_str, t.start, t.start + len(t.text),
                     t.pos_inc)
                i += 1
                continue
            # collapse a same-type run (collapseTokens/collapseAndSaveTokens:
            # keep going while the next token has the same type AND its
            # numWikiTokensSeen keeps growing past our counter)
            j = i + 1
            num_seen = 0
            buffer = t.text
            last_pos = t.start + len(t.text)
            constituents = [t]
            while (j < len(raw) and raw[j].type == t.type
                   and raw[j].wiki_seen > num_seen):
                buffer += " " * (raw[j].start - last_pos) + raw[j].text
                last_pos = raw[j].start + len(raw[j].text)
                constituents.append(raw[j])
                num_seen += 1
                j += 1
            s = buffer.strip()
            # the collapsed token's posInc is scanner.getPositionIncrement()
            # AFTER the collapse loop read its lookahead token (pushed
            # back in Java; re-scanned on the next call) — i.e. the
            # lookahead's posInc, or the scanner's final value at EOF
            col_inc = raw[j].pos_inc if j < len(raw) else final_pos_inc
            if self.token_output == BOTH:
                # collapsed token first, then the constituents, the
                # first constituent at posInc 0 (same position)
                push(s, type_str, t.start, t.start + len(s), col_inc,
                     UNTOKENIZED_TOKEN_FLAG)
                for k, ct in enumerate(constituents):
                    push(ct.text, type_str, ct.start,
                         ct.start + len(ct.text),
                         0 if k == 0 else ct.pos_inc)
            else:  # UNTOKENIZED_ONLY
                push(s, type_str, t.start, t.start + len(s), col_inc,
                     UNTOKENIZED_TOKEN_FLAG)
            i = j
        return out
