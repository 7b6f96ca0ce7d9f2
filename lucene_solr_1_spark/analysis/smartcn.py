"""Chinese word segmentation — a SmartChineseAnalyzer (smartcn) twin.

Reimplements the reference's HHMM segmenter over its own shipped core
dictionary (vendored by tools/gen_smartcn_data.py):

- ``coredict.mem``: Java-serialized ``short[]`` hash-index table,
  ``char[]`` char table, ``char[][][]`` per-first-char word arrays
  (first char stripped, sorted), ``int[][]`` word frequencies
  (WordDictionary.java:152-160).  Parsed by a from-scratch minimal
  Java-serialization reader (primitive + nested object arrays with
  handle/back-reference support).  The double-hash probe table is an
  index only — we rebuild the semantic map {first_char: (words,
  freqs)} directly, preserving the reference's sorted order and its
  binary-search prefix/equal semantics (WordDictionary.java:470-529,
  Utility.compareArray/compareArrayByPrefix).
- Candidate generation mirrors HHMMSegmenter.createSegGraph
  (HHMMSegmenter.java:41-175): single-hanzi always added, dictionary
  prefix extension across SPACE_LIKE gaps, letter/digit/fullwidth
  runs as atomic 未##串/未##数 tokens, delimiters at MAX_FREQUENCE,
  sentence begin/end markers.
- Edge weights mirror BiSegGraph.generateBiSegGraph
  (BiSegGraph.java:51-117): ``-log(0.1*(1+f1)/MAX + 0.9*((1-t)*
  pairFreq/(1+f1) + t))``.

HONEST LIMITATION — the snapshot does NOT ship ``bigramdict.mem``, so
``pairFreq`` is always 0 here.  That makes every transition take the
reference's **unseen-bigram** smoothing branch (the common case in
real text); segmentations that hinge on a high-frequency bigram can
differ.  Agreement with the reference's own TestSmartChineseAnalyzer
goldens is asserted in tests/test_smartcn.py.

Char types, sentence splitting (SentenceTokenizer.java:40 PUNCTION
set), token post-filtering (SegTokenFilter.java: fullwidth folding,
latin lowercasing, delimiter normalization to ','), and the default
stopword list are exact twins.
"""
from __future__ import annotations

import gzip
import math
import pathlib
import struct
from bisect import bisect_left
from dataclasses import dataclass
from functools import lru_cache

_DATA = pathlib.Path(__file__).resolve().parent / "data"

# Utility.java:28-52
STRING_CHAR_ARRAY = "未##串"
NUMBER_CHAR_ARRAY = "未##数"
START_CHAR_ARRAY = "始##始"
END_CHAR_ARRAY = "末##末"
COMMON_DELIMITER = ","
MAX_FREQUENCE = 2079997 + 80000
SPACES = " 　\t\r\n"
SENTENCE_PUNCTION = "。，！？；,!?;"

# CharType ordinals (cn/smart/CharType.java)
DELIMITER, LETTER, DIGIT, HANZI, SPACE_LIKE, FULLWIDTH_LETTER, \
    FULLWIDTH_DIGIT, OTHER = range(8)

# WordType ordinals (cn/smart/WordType.java)
WT_SENTENCE_BEGIN, WT_SENTENCE_END, WT_CHINESE_WORD, WT_STRING, \
    WT_NUMBER, WT_FULLWIDTH_STRING, WT_FULLWIDTH_NUMBER, WT_DELIMITER = range(8)


def get_char_type(ch: str) -> int:
    """Utility.getCharType (Utility.java:155-180), exact ranges."""
    c = ord(ch)
    if 0x4E00 <= c <= 0x9FA5:
        return HANZI
    if 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A:
        return LETTER
    if 0x30 <= c <= 0x39:
        return DIGIT
    if ch in " \t\r\n　":
        return SPACE_LIKE
    if 0x21 <= c <= 0xBB or 0x2010 <= c <= 0x2642 or 0x3001 <= c <= 0x301E:
        return DELIMITER
    if 0xFF21 <= c <= 0xFF3A or 0xFF41 <= c <= 0xFF5A:
        return FULLWIDTH_LETTER
    if 0xFF10 <= c <= 0xFF19:
        return FULLWIDTH_DIGIT
    if 0xFE30 <= c <= 0xFF63:
        return DELIMITER
    return OTHER


# ---------------------------------------------------------------------------
# Minimal Java Object Serialization reader (primitive/nested arrays only)
# ---------------------------------------------------------------------------

_TC_NULL = 0x70
_TC_REFERENCE = 0x71
_TC_CLASSDESC = 0x72
_TC_ARRAY = 0x75
_TC_ENDBLOCKDATA = 0x78
_BASE_HANDLE = 0x7E0000


class _JavaDeser:
    """Just enough of the Java serialization grammar to read
    coredict.mem: TC_ARRAY of primitive/object arrays, classDesc
    handles, TC_REFERENCE back-refs, TC_NULL elements."""

    def __init__(self, data: bytes):
        if data[:4] != b"\xac\xed\x00\x05":
            raise ValueError("not a Java serialization stream")
        self.data = data
        self.pos = 4
        self.handles: list = []

    def _u1(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def _u2(self) -> int:
        v = struct.unpack_from(">H", self.data, self.pos)[0]
        self.pos += 2
        return v

    def _i4(self) -> int:
        v = struct.unpack_from(">i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def _utf(self) -> str:
        n = self._u2()
        s = self.data[self.pos:self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def _class_desc(self) -> str:
        tc = self._u1()
        if tc == _TC_REFERENCE:
            return self.handles[self._i4() - _BASE_HANDLE]
        if tc != _TC_CLASSDESC:
            raise ValueError(f"unexpected tc {tc:#x} for classDesc")
        name = self._utf()
        self.pos += 8  # serialVersionUID
        self.handles.append(name)  # classDesc gets a handle
        self.pos += 1  # flags
        n_fields = self._u2()
        if n_fields:
            raise ValueError("array classDesc with fields?")
        if self._u1() != _TC_ENDBLOCKDATA:
            raise ValueError("expected endBlockData")
        if self._u1() != _TC_NULL:  # superclass desc
            raise ValueError("expected null super classDesc")
        return name

    def read_object(self):
        tc = self._u1()
        if tc == _TC_NULL:
            return None
        if tc == _TC_REFERENCE:
            return self.handles[self._i4() - _BASE_HANDLE]
        if tc != _TC_ARRAY:
            raise ValueError(f"unsupported tc {tc:#x}")
        name = self._class_desc()
        size = self._i4()
        if name == "[S":
            arr = list(struct.unpack_from(f">{size}h", self.data, self.pos))
            self.pos += 2 * size
        elif name == "[C":
            arr = self.data[self.pos:self.pos + 2 * size].decode("utf-16-be")
            self.pos += 2 * size
        elif name == "[I":
            arr = list(struct.unpack_from(f">{size}i", self.data, self.pos))
            self.pos += 4 * size
        elif name.startswith("[["):
            self.handles.append(None)  # placeholder: handle before elements
            idx = len(self.handles) - 1
            arr = [self.read_object() for _ in range(size)]
            self.handles[idx] = arr
            return arr
        else:
            raise ValueError(f"unsupported array type {name}")
        self.handles.append(arr)
        return arr


# ---------------------------------------------------------------------------
# Word dictionary
# ---------------------------------------------------------------------------

class WordDictionary:
    """{first_char: (suffix-words sorted, freqs)} rebuilt from the
    reference's own serialized tables (words stored with the first
    char stripped, reference sort order preserved)."""

    def __init__(self):
        with gzip.open(_DATA / "zh_coredict.mem.gz", "rb") as f:
            data = f.read()
        des = _JavaDeser(data)
        word_index_table = des.read_object()    # short[12071]
        char_index_table = des.read_object()    # char[12071]
        word_tables = des.read_object()         # char[][][]
        freq_tables = des.read_object()         # int[][]
        self.table: dict[str, tuple[list[str], list[int]]] = {}
        for i, c in enumerate(char_index_table):
            if c == "\x00":
                continue
            j = word_index_table[i]
            if j < 0:
                continue
            words = word_tables[j]
            freqs = freq_tables[j]
            if words is None:
                continue
            ws = ["" if w is None else w for w in words]
            self.table[c] = (ws, list(freqs))

    def get_frequency(self, word: str) -> int:
        """WordDictionary.getFrequency: exact-match binary search on
        the suffix array of word[0]."""
        entry = self.table.get(word[0])
        if entry is None:
            return 0
        words, freqs = entry
        i = bisect_left(words, word[1:])
        if i < len(words) and words[i] == word[1:]:
            return freqs[i]
        return 0

    def get_prefix_match(self, word: str, known_start: int = 0) -> int:
        """First index >= known_start whose entry has word[1:] as a
        prefix (WordDictionary.getPrefixMatch semantics)."""
        entry = self.table.get(word[0])
        if entry is None:
            return -1
        words, _ = entry
        suffix = word[1:]
        i = max(bisect_left(words, suffix), known_start)
        if i < len(words) and words[i].startswith(suffix):
            return i
        return -1

    def is_equal(self, word: str, item_index: int) -> bool:
        words, _ = self.table[word[0]]
        return words[item_index] == word[1:]


@lru_cache(maxsize=1)
def _dict() -> WordDictionary:
    return WordDictionary()


@lru_cache(maxsize=1)
def default_stopwords() -> frozenset:
    with gzip.open(_DATA / "zh_stopwords.txt.gz", "rt", encoding="utf-8") as f:
        return frozenset(
            line.strip() for line in f
            if line.strip() and not line.startswith("//"))


# ---------------------------------------------------------------------------
# HHMM segmentation
# ---------------------------------------------------------------------------

@dataclass
class SegToken:
    text: str           # charArray (placeholder for STRING/NUMBER types)
    start: int
    end: int
    word_type: int
    weight: float       # word frequency during graph construction


def _create_seg_graph(sentence: str) -> dict[int, list[SegToken]]:
    """HHMMSegmenter.createSegGraph (HHMMSegmenter.java:41-175)."""
    wd = _dict()
    n = len(sentence)
    ctypes = [get_char_type(c) for c in sentence]
    starts: dict[int, list[SegToken]] = {}

    def add(tok: SegToken) -> None:
        starts.setdefault(tok.start, []).append(tok)

    i = 0
    while i < n:
        ct = ctypes[i]
        if ct == SPACE_LIKE:
            i += 1
        elif ct == HANZI:
            j = i + 1
            word = sentence[i]
            add(SegToken(word, i, j, WT_CHINESE_WORD, wd.get_frequency(word)))
            found = wd.get_prefix_match(word)
            while j <= n and found != -1:
                if wd.is_equal(word, found) and len(word) > 1:
                    add(SegToken(word, i, j, WT_CHINESE_WORD,
                                 wd.get_frequency(word)))
                while j < n and ctypes[j] == SPACE_LIKE:
                    j += 1
                if j < n and ctypes[j] == HANZI:
                    word = word + sentence[j]
                    found = wd.get_prefix_match(word, found)
                    j += 1
                else:
                    break
            i += 1
        elif ct in (LETTER, FULLWIDTH_LETTER):
            has_fw = ct == FULLWIDTH_LETTER
            j = i + 1
            while j < n and ctypes[j] in (LETTER, FULLWIDTH_LETTER):
                if ctypes[j] == FULLWIDTH_LETTER:
                    has_fw = True
                j += 1
            wt = WT_FULLWIDTH_STRING if has_fw else WT_STRING
            add(SegToken(STRING_CHAR_ARRAY, i, j, wt,
                         wd.get_frequency(STRING_CHAR_ARRAY)))
            i = j
        elif ct in (DIGIT, FULLWIDTH_DIGIT):
            has_fw = ct == FULLWIDTH_DIGIT
            j = i + 1
            while j < n and ctypes[j] in (DIGIT, FULLWIDTH_DIGIT):
                if ctypes[j] == FULLWIDTH_DIGIT:
                    has_fw = True
                j += 1
            wt = WT_FULLWIDTH_NUMBER if has_fw else WT_NUMBER
            add(SegToken(NUMBER_CHAR_ARRAY, i, j, wt,
                         wd.get_frequency(NUMBER_CHAR_ARRAY)))
            i = j
        elif ct == DELIMITER:
            add(SegToken(sentence[i], i, i + 1, WT_DELIMITER, MAX_FREQUENCE))
            i += 1
        else:  # OTHER
            add(SegToken(STRING_CHAR_ARRAY, i, i + 1, WT_STRING,
                         wd.get_frequency(STRING_CHAR_ARRAY)))
            i += 1

    add(SegToken(START_CHAR_ARRAY, -1, 0, WT_SENTENCE_BEGIN,
                 _dict().get_frequency(START_CHAR_ARRAY)))
    add(SegToken(END_CHAR_ARRAY, n, n + 1, WT_SENTENCE_END,
                 _dict().get_frequency(END_CHAR_ARRAY)))
    return starts


_SMOOTH = 0.1
_TINY = 1.0 / MAX_FREQUENCE


def _edge_weight(one_word_freq: float, pair_freq: int = 0) -> float:
    """BiSegGraph.java:101-106.  pair_freq is always 0 here
    (bigramdict.mem absent — the reference's unseen-bigram branch)."""
    return -math.log(
        _SMOOTH * (1.0 + one_word_freq) / MAX_FREQUENCE
        + (1.0 - _SMOOTH)
        * ((1.0 - _TINY) * pair_freq / (1.0 + one_word_freq) + _TINY))


def _shortest_path(starts: dict[int, list[SegToken]]) -> list[SegToken]:
    """BiSegGraph construction + getShortPath (BiSegGraph.java)."""
    # index tokens in start-offset order (SegGraph.makeIndex)
    keys = sorted(starts.keys())
    tokens: list[SegToken] = []
    index_of: dict[int, int] = {}
    for k in keys:
        for t in starts[k]:
            index_of[id(t)] = len(tokens)
            tokens.append(t)
    max_start = max(keys)
    # edges grouped by "to" index
    to_edges: dict[int, list[tuple[int, float]]] = {}
    for k in keys:
        for t1 in starts[k]:
            nxt = t1.end
            next_tokens = None
            while nxt <= max_start:
                if nxt in starts:
                    next_tokens = starts[nxt]
                    break
                nxt += 1
            if next_tokens is None:
                break
            w = _edge_weight(t1.weight)
            i1 = index_of[id(t1)]
            for t2 in next_tokens:
                to_edges.setdefault(index_of[id(t2)], []).append((i1, w))
    # DP shortest path over node indices (getShortPath)
    node_count = len(tokens) - 1
    INF = float("inf")
    weight = [0.0] + [INF] * node_count
    pre = [0] * (node_count + 1)
    for cur in range(1, node_count + 1):
        best, best_from = INF, 0
        for frm, w in to_edges.get(cur, ()):
            cand = weight[frm] + w
            if cand < best:
                best, best_from = cand, frm
        weight[cur] = best
        pre[cur] = best_from
    path = []
    cur = node_count
    while cur != 0:
        path.append(cur)
        cur = pre[cur]
    path.append(0)
    return [tokens[i] for i in reversed(path)]


def _filter_token(tok: SegToken, sentence: str) -> str:
    """WordSegmenter.convertSegToken + SegTokenFilter.filter."""
    wt = tok.word_type
    if wt in (WT_STRING, WT_NUMBER, WT_FULLWIDTH_STRING, WT_FULLWIDTH_NUMBER):
        text = sentence[tok.start:tok.end]
        out = []
        for ch in text:
            c = ord(ch)
            if wt in (WT_FULLWIDTH_NUMBER, WT_FULLWIDTH_STRING) and c >= 0xFF10:
                c -= 0xFEE0
            if 0x41 <= c <= 0x5A:
                c += 0x20
            out.append(chr(c))
        return "".join(out)
    if wt == WT_DELIMITER:
        return COMMON_DELIMITER
    return tok.text


def segment_sentence(sentence: str) -> list[SegToken]:
    """Best HHMM segmentation of one sentence (markers removed)."""
    if not sentence:
        return []
    starts = _create_seg_graph(sentence)
    path = _shortest_path(starts)
    return [t for t in path
            if t.word_type not in (WT_SENTENCE_BEGIN, WT_SENTENCE_END)]


def split_sentences(text: str) -> list[tuple[str, int]]:
    """SentenceTokenizer.java:59-110 twin: split on 。，！？；,!?; and
    runs of spaces; returns (sentence_with_trailing_punct, offset)."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i] in SPACES:
            i += 1
        j = i
        while j < n:
            if text[j] in SENTENCE_PUNCTION:
                j += 1
                break
            j += 1
        if j > i:
            out.append((text[i:j], i))
        i = j
    return out


def smartcn_tokenize(text: str, use_stopwords: bool = True,
                     stem_english: bool = False) -> list[str]:
    """SmartChineseAnalyzer token stream.  With stem_english=True the
    full analyzer chain is mirrored (SmartChineseAnalyzer.java applies
    PorterStemFilter after WordTokenFilter; reuses our porter_stem)."""
    stop = default_stopwords() if use_stopwords else frozenset()
    if stem_english:
        from .stemmer import porter_stem
    toks: list[str] = []
    for sentence, _off in split_sentences(text):
        for t in segment_sentence(sentence):
            text_out = _filter_token(t, sentence)
            if stem_english and text_out.isascii():
                text_out = porter_stem(text_out)
            if text_out and text_out not in stop:
                toks.append(text_out)
    return toks


def zh_tokens_expr(col, use_stopwords: bool = True):
    """Analyzer-column form for build_index(analyzers={"text":
    zh_tokens_expr}): string column name/Column -> array<string> of
    HHMM-segmented tokens (Arrow-batched)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from .segcache import segment_series
    cache: dict = {}

    @F.pandas_udf(ArrayType(StringType()))
    def _seg(s):
        return segment_series(
            s, lambda x: smartcn_tokenize(x, use_stopwords), cache)

    return _seg(F.col(col) if isinstance(col, str) else col)


def smartcn_tokenize_df(df, text_col: str = "text",
                        out_col: str = "zh_tokens",
                        use_stopwords: bool = True):
    """Spark surface: Arrow-batched segmentation of a string column.
    Dictionary loads once per executor (lru_cache singleton)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from .segcache import segment_series
    cache: dict = {}

    # no type hints: PEP-563 string annotations break pyspark sniffing
    @F.pandas_udf(ArrayType(StringType()))
    def _seg(s):
        return segment_series(
            s, lambda x: smartcn_tokenize(x, use_stopwords), cache)

    return df.withColumn(out_col, _seg(F.col(text_col)))
