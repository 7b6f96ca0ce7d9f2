"""Miscellaneous tokenizers and char filters completing the §2.B
factory inventory.

Each function cites the reference class it mirrors; semantics are the
4.4 versions (e.g. n-gram emission order is position-outer /
gram-size-inner, the LUCENE-44 behavior).
"""
from __future__ import annotations

import re

__all__ = [
    "letter_tokenize", "whitespace_tokenize", "lowercase_tokenize",
    "ngram_tokenize", "edge_ngram_tokenize", "ngram_filter",
    "edge_ngram_filter", "path_hierarchy_tokenize",
    "reverse_path_hierarchy_tokenize", "pattern_capture_group",
    "persian_charfilter", "pattern_replace_charfilter",
    "token_offset_payloads", "type_payloads", "numeric_payloads",
]

_LETTER_RE = re.compile(r"[^\W\d_]+")
_WS_RE = re.compile(r"\S+")


def letter_tokenize(text: str) -> list[str]:
    """LetterTokenizer (core/LetterTokenizer.java:36): maximal runs of
    Unicode letters; everything else splits."""
    return _LETTER_RE.findall(text)


def whitespace_tokenize(text: str) -> list[str]:
    """WhitespaceTokenizer (core/WhitespaceTokenizer.java:33)."""
    return _WS_RE.findall(text)


def lowercase_tokenize(text: str) -> list[str]:
    """LowerCaseTokenizer (core/LowerCaseTokenizer.java:38):
    LetterTokenizer + per-char lowercase."""
    return [t.lower() for t in _LETTER_RE.findall(text)]


def ngram_tokenize(text: str, min_gram: int = 1,
                   max_gram: int = 2) -> list[str]:
    """NGramTokenizer, 4.4 behavior (ngram/NGramTokenizer.java:87):
    position-outer, gram-size-inner emission over the whole input."""
    out = []
    n = len(text)
    for pos in range(n):
        for g in range(min_gram, max_gram + 1):
            if pos + g > n:
                break
            out.append(text[pos:pos + g])
    return out


def edge_ngram_tokenize(text: str, min_gram: int = 1,
                        max_gram: int = 1) -> list[str]:
    """EdgeNGramTokenizer (ngram/EdgeNGramTokenizer.java:38, 4.4 =
    NGramTokenizer with edgesOnly): leading-edge grams only."""
    return [text[:g] for g in range(min_gram, max_gram + 1)
            if g <= len(text)]


def ngram_filter(tokens: list[str], min_gram: int = 1,
                 max_gram: int = 2) -> list[str]:
    """NGramTokenFilter, 4.4 behavior (ngram/NGramTokenFilter.java:107):
    tokens shorter than min_gram are dropped (the built-in
    LengthFilter wrap); per token, position-outer gram emission."""
    out = []
    for t in tokens:
        if len(t) < min_gram:
            continue
        for pos in range(len(t)):
            for g in range(min_gram, max_gram + 1):
                if pos + g > len(t):
                    break
                out.append(t[pos:pos + g])
    return out


def edge_ngram_filter(tokens: list[str], min_gram: int = 1,
                      max_gram: int = 1) -> list[str]:
    """EdgeNGramTokenFilter (ngram/EdgeNGramTokenFilter.java:77):
    leading-edge grams per token, shortest first."""
    out = []
    for t in tokens:
        out.extend(t[:g] for g in range(min_gram, max_gram + 1)
                   if g <= len(t))
    return out


def path_hierarchy_tokenize(text: str, delimiter: str = "/",
                            replacement: str | None = None,
                            skip: int = 0) -> list[str]:
    """PathHierarchyTokenizer (path/PathHierarchyTokenizer.java:39):
    prefixes cut at every delimiter (plus the full text) — '/a/b/c' ->
    '/a', '/a/b', '/a/b/c', all stacked at one position.  `skip` drops
    the first `skip` cut points and starts tokens at that offset
    ('/a/b/c', skip=1 -> '/b', '/b/c'); `replacement` substitutes the
    delimiter in the emitted text."""
    rep = delimiter if replacement is None else replacement
    cuts = [i for i, ch in enumerate(text) if ch == delimiter and i > 0]
    if len(text) not in cuts:
        cuts.append(len(text))
    if skip >= len(cuts):
        return []
    start = cuts[skip - 1] if skip else 0
    return [text[start:c].replace(delimiter, rep)
            for c in cuts[skip:] if c > start]


def reverse_path_hierarchy_tokenize(text: str, delimiter: str = "/",
                                    replacement: str | None = None,
                                    skip: int = 0) -> list[str]:
    """ReversePathHierarchyTokenizer (path/
    ReversePathHierarchyTokenizer.java:38): suffix hierarchy, longest
    first — '/a/b/c' -> '/a/b/c', 'a/b/c', 'b/c', 'c'.  `skip` cuts the
    stream after the skip-th delimiter from the end ('a/b/c', skip=1 ->
    'a/b/', 'b/')."""
    rep = delimiter if replacement is None else replacement
    starts = [0] + [i + 1 for i, ch in enumerate(text)
                    if ch == delimiter and i + 1 < len(text)]
    if skip:
        # the stream ends just after the skip-th delimiter from the end
        end = (starts[0] if skip > len(starts) - 1
               else starts[len(starts) - skip])
    else:
        end = len(text)
    return [text[s:end].replace(delimiter, rep)
            for s in starts if s < end]


def pattern_capture_group(tokens: list[str], patterns: list[str],
                          preserve_original: bool = False) -> list[str]:
    """PatternCaptureGroupTokenFilter (pattern/
    PatternCaptureGroupTokenFilter.java:45): captures are emitted in
    min-start order ACROSS patterns (each pattern advancing through its
    matches' groups, first pattern winning ties), stacked at the
    token's position; empty groups are skipped, and with
    preserve_original a capture spanning the whole token is skipped
    (the original is emitted first instead).  Without matches the token
    passes through."""
    compiled = [re.compile(p) for p in patterns]
    out = []
    for t in tokens:
        # per-pattern capture stream in (match, group) order
        streams = []
        for pat in compiled:
            caps = []
            for m in pat.finditer(t):
                for gi in range(1, pat.groups + 1):
                    s, e = m.span(gi)
                    if s == e or s == -1:
                        continue
                    if preserve_original and s == 0 and e == len(t):
                        continue
                    caps.append((s, e))
            streams.append(caps)
        heads = [0] * len(streams)
        emitted = []
        while True:
            best, best_i = None, -1
            for i, caps in enumerate(streams):
                if heads[i] < len(caps):
                    s, e = caps[heads[i]]
                    if best is None or s < best[0]:
                        best, best_i = (s, e), i
            if best_i < 0:
                break
            heads[best_i] += 1
            emitted.append(t[best[0]:best[1]])
        if preserve_original:
            out.append(t)
            out.extend(emitted)
        elif emitted:
            out.extend(emitted)
        else:
            out.append(t)
    return out


def persian_charfilter(text: str) -> str:
    """PersianCharFilter (fa/PersianCharFilter.java:32): zero-width
    non-joiner (U+200C) becomes a space so affixed forms split."""
    return text.replace("‌", " ")


def pattern_replace_charfilter(text: str, pattern: str,
                               replacement: str) -> str:
    """PatternReplaceCharFilter (pattern/
    PatternReplaceCharFilter.java:43): regex replacement applied to the
    character stream BEFORE tokenization."""
    return re.sub(pattern, replacement, text)


def token_offset_payloads(tokens: list[str]) -> list[tuple[str, bytes]]:
    """TokenOffsetPayloadTokenFilter (payloads/
    TokenOffsetPayloadTokenFilter.java:32): payload = 4-byte big-endian
    start offset + 4-byte end offset of each token in the joined
    stream (whitespace-joined reconstruction)."""
    out = []
    pos = 0
    for t in tokens:
        start, end = pos, pos + len(t)
        out.append((t, start.to_bytes(4, "big") + end.to_bytes(4, "big")))
        pos = end + 1
    return out


def type_payloads(pairs: list[tuple[str, str]]) -> \
        list[tuple[str, bytes]]:
    """TypeAsPayloadTokenFilter (payloads/TypeAsPayloadTokenFilter
    .java:31): payload = UTF-8 bytes of the token's type."""
    return [(t, typ.encode("utf-8")) for t, typ in pairs]


def numeric_payloads(pairs: list[tuple[str, str]], payload: float,
                     type_match: str) -> list[tuple[str, bytes | None]]:
    """NumericPayloadTokenFilter (payloads/NumericPayloadTokenFilter
    .java:34): tokens of the given type get the float payload
    (big-endian float32, PayloadHelper.encodeFloat)."""
    import struct
    enc = struct.pack(">f", payload)
    return [(t, enc if typ == type_match else None) for t, typ in pairs]
