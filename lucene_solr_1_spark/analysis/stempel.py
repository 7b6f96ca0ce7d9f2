"""Stempel Polish stemmer (Egothor trie of patch commands).

Reimplements the reference's stempel module — the last analysis module
in /root/reference whose data actually ships with the snapshot
(kuromoji's TokenInfoDictionary$buffer.dat and smartcn's bigramdict.mem
are absent from the reference tree, so those stay data-blocked):

  * binary table reader for the Egothor serialization
    (ref: stempel/src/java/org/egothor/stemmer/Trie.java:88 readers,
    Row.java:68, MultiTrie.java:70 — Java DataInput: modified-UTF-8
    strings, big-endian ints/chars),
  * MultiTrie2.getLastOnPath patch-command lookup with the reference's
    exact control flow, including its reliance on caught
    IndexOutOfBoundsException as loop exit
    (ref: MultiTrie2.java:110-147),
  * Diff.apply patch interpreter with Java StringBuilder bounds
    semantics — a mid-patch bounds violation keeps the mutations made
    so far (ref: Diff.java:92-130),
  * StempelStemmer.stem / StempelFilter length-3 + keyword gating
    (ref: stempel/StempelStemmer.java:85, StempelFilter.java:63),
  * PolishAnalyzer chain: standard tokenize -> lowercase -> Polish
    stop set -> stempel (ref: pl/PolishAnalyzer.java:123-133).

The shipped table `data/pl_stemmer_20000.tbl.gz` is the reference's
own stemmer_20000.tbl resource (Egothor License 1.00, BSD-style),
repackaged by tools/gen_stempel_table.py — behavioral data, same
category as the KStem lexicon.  Parity: 0 mismatches vs the compiled
reference stemmer over the oracle vocabulary in
tests/data/stempel_vocab.json.gz (tools/gen_stempel_vocab.py).

Keys walk UTF-16 code units (Java chars), so astral input behaves
exactly like the JVM's per-char trie walk.
"""
from __future__ import annotations

import gzip
import struct
from functools import lru_cache
from pathlib import Path

_DATA = Path(__file__).resolve().parent / "data"

_EOM = "*"


class _JavaBounds(Exception):
    """Stand-in for Java's IndexOutOfBoundsException family."""


# ------------------------------------------------------- binary reader

class _DataInput:
    """java.io.DataInput over bytes: big-endian, modified UTF-8."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_boolean(self) -> bool:
        b = self.buf[self.pos]
        self.pos += 1
        return b != 0

    def read_int(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def read_char(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def read_utf(self) -> str:
        (n,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        raw = self.buf[self.pos:self.pos + n]
        self.pos += n
        # modified UTF-8: NUL as C0 80, supplementary as CESU-8
        # surrogate pairs; plain utf-8 decode covers the rest.
        out = []
        i = 0
        while i < len(raw):
            b0 = raw[i]
            if b0 < 0x80:
                out.append(chr(b0))
                i += 1
            elif (b0 & 0xE0) == 0xC0:
                out.append(chr(((b0 & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            else:
                out.append(chr(((b0 & 0x0F) << 12) |
                               ((raw[i + 1] & 0x3F) << 6) |
                               (raw[i + 2] & 0x3F)))
                i += 3
        return "".join(out)


def _utf16_units(s: str) -> str:
    """Java-char view of a Python string (splits astral chars into
    surrogate pairs, so trie walks count code units like the JVM)."""
    if all(ord(c) < 0x10000 for c in s):
        return s
    return s.encode("utf-16-be", "surrogatepass").decode(
        "utf-16-be", "surrogatepass")


class _Trie:
    """One level of patch commands (ref: egothor/stemmer/Trie.java:73).

    rows: list of {code_unit -> (cmd, ref)}; cmds: patch strings."""

    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, din: _DataInput):
        self.forward = din.read_boolean()
        self.root = din.read_int()
        self.cmds = [din.read_utf() for _ in range(din.read_int())]
        self.rows = []
        for _ in range(din.read_int()):
            cells = {}
            for _ in range(din.read_int()):
                ch = din.read_char()
                cmd, _cnt, ref, _skip = (din.read_int(), din.read_int(),
                                         din.read_int(), din.read_int())
                cells[ch] = (cmd, ref)
            self.rows.append(cells)

    def get_last_on_path(self, key: str) -> str | None:
        """ref: Trie.java:280 — last cmd on the walk, or the exact-end
        cmd; key is iterated right-to-left when the trie is backward."""
        if not key:
            raise _JavaBounds  # Java: charAt on empty -> SIOOBE
        units = [ord(c) for c in key]
        if not self.forward:
            units.reverse()
        rows, cmds = self.rows, self.cmds
        now = rows[self.root]
        last = None
        for i in range(len(units) - 1):
            cell = now.get(units[i])
            if cell is not None and cell[0] >= 0:
                last = cmds[cell[0]]
            if cell is None or cell[1] < 0:
                return last
            now = rows[cell[1]]
        cell = now.get(units[-1])
        if cell is not None and cell[0] >= 0:
            return cmds[cell[0]]
        return last


class _MultiTrie2:
    """Multi-level patch-command trie (ref: MultiTrie2.java:66)."""

    def __init__(self, din: _DataInput):
        # MultiTrie(DataInput) header (ref: MultiTrie.java:70)
        self.forward = din.read_boolean()
        self.by = din.read_int()
        self.tries = [_Trie(din) for _ in range(din.read_int())]

    def _skip(self, s: str, count: int) -> str:
        # Java subSequence bounds: count may not exceed the length
        if count < 0 or count > len(s):
            raise _JavaBounds
        return s[count:] if self.forward else s[:len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        """ref: MultiTrie2.java:318 — key chars consumed by a patch
        part: '-'/'D' consume their count, 'R' consumes ONE (the
        `len++; /* intentional fallthrough */` case), 'I' none."""
        ln = 0
        i = 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                if i >= len(cmd):
                    raise _JavaBounds
                ln += ord(cmd[i]) - ord("a") + 1
            elif c == "R":
                ln += 1
            i += 1
        return ln

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def get_last_on_path(self, key: str) -> str:
        """ref: MultiTrie2.java:110 — concatenates per-level commands,
        rewinding the key past '-' (skip) commands; any Java
        IndexOutOfBoundsException ends the walk with the partial
        result."""
        result = []
        try:
            lastkey = key
            prev = None
            lastch = " "
            for trie in self.tries:
                r = trie.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                if len(r) < 2:
                    raise _JavaBounds
                lastch = r[-2]
                if r[0] == "-":
                    if prev is not None:
                        key = self._skip(key, self._length_pp(prev))
                    key = self._skip(key, self._length_pp(r))
                prev = r
                result.append(r)
                if key:
                    lastkey = key
        except _JavaBounds:
            pass
        return "".join(result)


def _diff_apply(dest: list[str], diff: str) -> None:
    """Egothor patch interpreter (ref: Diff.java:92 apply): commands are
    (op, param) char pairs walked right-to-left over dest; a bounds
    violation stops mid-patch, keeping prior mutations (the reference
    swallows the exception)."""
    if diff is None:
        return
    pos = len(dest) - 1
    if pos < 0:
        return
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise _JavaBounds
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                # StringBuilder.delete(start, end): start<0 or
                # start>length or start>end -> SIOOBE
                if pos < 0 or pos > len(dest) or pos > o + 1:
                    raise _JavaBounds
                del dest[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise _JavaBounds
                dest.insert(pos, param)
            pos -= 1
    except _JavaBounds:
        pass


# ------------------------------------------------------------ stemmer

@lru_cache(maxsize=1)
def _default_table() -> _MultiTrie2:
    raw = gzip.decompress((_DATA / "pl_stemmer_20000.tbl.gz").read_bytes())
    din = _DataInput(raw)
    method = din.read_utf().upper()
    if "M" not in method:
        raise ValueError("single-trie stempel tables not expected here")
    return _MultiTrie2(din)


@lru_cache(maxsize=65536)
def stempel_stem(word: str) -> str | None:
    """StempelStemmer.stem (ref: stempel/StempelStemmer.java:85): apply
    the trie's patch commands; None when the patch deletes everything
    (callers keep the original term, like StempelFilter)."""
    units = _utf16_units(word)
    cmd = _default_table().get_last_on_path(units)
    buf = list(units)
    _diff_apply(buf, cmd)
    if buf:
        return ("".join(buf).encode("utf-16-be", "surrogatepass")
                .decode("utf-16-be", "surrogatepass"))
    return None


def stempel_filter_tokens(tokens: list[str], min_length: int = 3,
                          protected: set[str] | None = None) -> list[str]:
    """StempelFilter contract (ref: StempelFilter.java:63): stem only
    non-keyword terms STRICTLY longer than min_length; terms the
    stemmer nulls out pass through unchanged."""
    protected = protected or set()
    out = []
    for t in tokens:
        if len(t) > min_length and t not in protected:
            s = stempel_stem(t)
            out.append(s if s is not None else t)
        else:
            out.append(t)
    return out


@lru_cache(maxsize=1)
def polish_stop_set() -> frozenset[str]:
    """ref: pl/PolishAnalyzer.java:71 — stopwords.txt, '#' comments."""
    words = []
    for line in (_DATA / "pl_stopwords.txt").read_text("utf-8").splitlines():
        if line.startswith("#"):
            continue
        w = line.strip()
        if w:
            words.append(w)
    return frozenset(words)


def polish_analyze(text: str, stem_exclusion: set[str] | None = None
                   ) -> list[str]:
    """PolishAnalyzer chain (ref: pl/PolishAnalyzer.java:123):
    StandardTokenizer -> StandardFilter -> LowerCase -> Stop(Polish)
    [-> KeywordMarker(stemExclusion)] -> StempelFilter."""
    from .standard import MAX_TOKEN_LENGTH, TOKEN_RE
    toks = [t.lower() for t in TOKEN_RE.findall(text)
            if len(t) <= MAX_TOKEN_LENGTH]
    stop = polish_stop_set()
    toks = [t for t in toks if t not in stop]
    return stempel_filter_tokens(toks, protected=stem_exclusion)


def polish_stem(term: str) -> str:
    """Word->word mapper with the StempelFilter gating baked in, for
    the vocabulary-trick stemming path (stemmer.stem_vocab)."""
    if len(term) <= 3:
        return term
    s = stempel_stem(term)
    return s if s is not None else term
