"""Morfologik dictionary lemmatization (Polish), data-pluggable.

Twin of the reference's morfologik module
(lucene/analysis/morfologik/src/java/org/apache/lucene/analysis/
morfologik/MorfologikFilter.java) and of the morfologik-stemming
runtime it wraps (FSA5 automaton + DictionaryLookup), implemented
from the published formats:

  * FSA5 binary automaton — Jan Daciuk's fsa package format as
    adopted by morfologik (magic ``\\fsa``, version 5, filler +
    annotation bytes, gtl byte = node-data-size<<4 | goto-length;
    per-arc layout label byte + little-endian goto field whose three
    low bits are FINAL/LAST/TARGET_NEXT flags, NEXT arcs truncated to
    label + one flag byte, dummy terminal node at offset 0, epsilon
    node pointing at the root).
  * fsa_morph stem coding (Daciuk's fsa_morph / morfologik
    "standard" encoders): entries are
    ``inflected SEP encoded-stem SEP tag`` byte sequences where the
    encoded stem starts with trim codes biased by ``'A'`` —
    suffix-only: ``K tail`` (cut K-'A' bytes from the end, append
    tail); prefix coding: ``P K tail``; infix coding: ``I P K tail``
    (cut P-'A' bytes at position I-'A', K-'A' from the end).

The shipped Polish dictionary (polish.dict / polimorf) is NOT in the
reference snapshot, so the real data cannot be vendored; the grammar
is fully implemented and tests reconstruct a mini-dictionary from the
surface->lemma/tag facts pinned by the reference's own
TestMorfologikAnalyzer.java expectations — the filter reproduces
those token streams exactly, including lemma order (which falls out
of FSA byte order of the suffix-coded entries, as it does for the
real dictionary).

Filter semantics (MorfologikFilter.java:131-156): per input token,
look up the surface form, falling back to its lowercase; on a hit the
token is REPLACED by the first distinct stem and each further
distinct stem is emitted at position increment 0, consecutive
same-stem entries merging their tags (popNextLemma:86-109); keyword
tokens and misses pass through unchanged with cleared tags.
"""

from __future__ import annotations

MAGIC = b"\\fsa"
VERSION = 5
BIT_FINAL = 1
BIT_LAST = 2
BIT_NEXT = 4


# ---------------------------------------------------------------------------
# FSA5 container
# ---------------------------------------------------------------------------

class FSA5:
    """Reader for the FSA5 byte format (arc-addressed automaton)."""

    def __init__(self, data: bytes):
        if data[:4] != MAGIC or data[4] != VERSION:
            raise ValueError("not an FSA5 automaton")
        self.filler = data[5]
        self.annotation = data[6]
        gtl = data[7]
        self.node_data_size = (gtl >> 4) & 0x0F
        self.gtl = gtl & 0x0F
        self.arcs = data[8:]

    # --- arc primitives (offsets are byte offsets into self.arcs) ---

    def _flags(self, arc: int) -> int:
        return self.arcs[arc + 1]  # low bits of the first goto byte

    def is_final(self, arc: int) -> bool:
        return bool(self._flags(arc) & BIT_FINAL)

    def is_last(self, arc: int) -> bool:
        return bool(self._flags(arc) & BIT_LAST)

    def _is_next(self, arc: int) -> bool:
        return bool(self._flags(arc) & BIT_NEXT)

    def label(self, arc: int) -> int:
        return self.arcs[arc]

    def _arc_size(self, arc: int) -> int:
        return 2 if self._is_next(arc) else 1 + self.gtl

    def _goto(self, arc: int) -> int:
        v = 0
        for i in range(self.gtl):
            v |= self.arcs[arc + 1 + i] << (8 * i)
        return v >> 3

    def target(self, arc: int) -> int:
        """Destination NODE offset; 0 = the dummy terminal (leaf)."""
        if self._is_next(arc):
            nxt = arc + self._arc_size(arc)
            return nxt + self.node_data_size
        return self._goto(arc)

    def first_arc(self, node: int) -> int:
        return node + self.node_data_size

    def node_arcs(self, node: int):
        if node == 0:
            return
        arc = self.first_arc(node)
        while True:
            yield arc
            if self.is_last(arc):
                return
            arc += self._arc_size(arc)

    @property
    def root(self) -> int:
        # offset 0: dummy terminal node (one arc); then the epsilon
        # node whose single arc targets the root
        dummy_arc = self.first_arc(0)
        eps_node = dummy_arc + self._arc_size(dummy_arc)
        return self.target(self.first_arc(eps_node))

    # --- traversal ---

    def walk(self, node: int, seq: bytes) -> int | None:
        """Follow `seq` from `node`; -> the final node, or None."""
        for b in seq:
            hit = None
            for arc in self.node_arcs(node):
                if self.label(arc) == b:
                    hit = arc
                    break
            if hit is None:
                return None
            node = self.target(hit)
        return node

    def completions(self, node: int, prefix: bytes = b"") -> list[bytes]:
        """All accepted sequences reachable from `node`, FSA order."""
        return self._complete(node, prefix)

    def _complete(self, node: int, prefix: bytes) -> list[bytes]:
        out: list[bytes] = []
        for arc in self.node_arcs(node):
            seq = prefix + bytes([self.label(arc)])
            if self.is_final(arc):
                out.append(seq)
            t = self.target(arc)
            if t != 0:
                out.extend(self._complete(t, seq))
        return out


def serialize_fsa5(sequences: list[bytes], filler: int = ord("_"),
                   annotation: int = ord("+")) -> bytes:
    """Serialize byte sequences into FSA5 (trie form; minimality is an
    optimization the reader does not require)."""
    sequences = sorted(set(sequences))
    # trie: node = dict label -> [child_index, final]
    nodes: list[dict] = [{}]
    for seq in sequences:
        cur = 0
        for i, b in enumerate(seq):
            slot = nodes[cur].get(b)
            if slot is None:
                slot = [None, False]
                nodes[cur][b] = slot
            if i == len(seq) - 1:
                slot[1] = True
            else:
                if slot[0] is None:
                    nodes.append({})
                    slot[0] = len(nodes) - 1
                cur = slot[0]

    gtl = 4  # fixed goto-field width; addresses fit comfortably
    arc_sz = 1 + gtl

    # layout: dummy terminal node (1 arc) at 0, epsilon node (1 arc),
    # then real nodes in BFS order
    order: list[int] = []
    seen = {0}
    queue = [0]
    while queue:
        nd = queue.pop(0)
        order.append(nd)
        for b in sorted(nodes[nd]):
            child = nodes[nd][b][0]
            if child is not None and child not in seen:
                seen.add(child)
                queue.append(child)

    offsets: dict[int, int] = {}
    pos = 2 * arc_sz  # after dummy + epsilon
    for nd in order:
        offsets[nd] = pos
        pos += arc_sz * max(1, len(nodes[nd]))

    def emit_arc(buf: bytearray, label: int, flags: int,
                 target: int) -> None:
        buf.append(label)
        v = (target << 3) | flags
        for i in range(gtl):
            buf.append((v >> (8 * i)) & 0xFF)

    buf = bytearray()
    buf += MAGIC
    buf.append(VERSION)
    buf.append(filler)
    buf.append(annotation)
    buf.append(gtl)  # node-data-size 0, goto length in low nibble
    emit_arc(buf, 0, BIT_LAST, 0)                       # dummy terminal
    emit_arc(buf, ord("^"), BIT_LAST, offsets[0])       # epsilon -> root
    for nd in order:
        items = sorted(nodes[nd])
        if not items:  # shouldn't happen (leaves are target 0)
            emit_arc(buf, 0, BIT_LAST, 0)
            continue
        for i, b in enumerate(items):
            child, final = nodes[nd][b]
            flags = (BIT_FINAL if final else 0) | \
                    (BIT_LAST if i == len(items) - 1 else 0)
            target = offsets[child] if child is not None else 0
            emit_arc(buf, b, flags, target)
    return bytes(buf)


# ---------------------------------------------------------------------------
# dictionary metadata + stem coding (fsa_morph)
# ---------------------------------------------------------------------------

class DictionaryMetadata:
    """The .info sidecar of a morfologik dictionary (separator byte,
    charset, which trim coding the stems use)."""

    def __init__(self, separator: str = "+", encoding: str = "utf-8",
                 uses_prefixes: bool = False, uses_infixes: bool = False):
        self.separator = ord(separator)
        self.encoding = encoding
        self.uses_prefixes = uses_prefixes
        self.uses_infixes = uses_infixes


def encode_stem(inflected: bytes, stem: bytes,
                meta: DictionaryMetadata) -> bytes:
    """Inverse of decode_stem, used to BUILD dictionaries."""
    if meta.uses_infixes:
        # no infix search heuristics needed for tests: emit with
        # zero-length infix (I='A', P='A'), reducing to suffix coding
        k = _suffix_cut(inflected, stem)
        tail = stem[len(inflected) - k:]
        return bytes([ord("A"), ord("A"), ord("A") + k]) + tail
    if meta.uses_prefixes:
        k = _suffix_cut(inflected, stem)
        tail = stem[len(inflected) - k:]
        return bytes([ord("A"), ord("A") + k]) + tail
    k = _suffix_cut(inflected, stem)
    tail = stem[len(inflected) - k:]
    return bytes([ord("A") + k]) + tail


def _suffix_cut(inflected: bytes, stem: bytes) -> int:
    common = 0
    for a, b in zip(inflected, stem):
        if a != b:
            break
        common += 1
    return len(inflected) - common


def decode_stem(inflected: bytes, encoded: bytes,
                meta: DictionaryMetadata) -> bytes:
    """fsa_morph trim decoding (DictionaryLookup semantics)."""
    A = ord("A")
    if meta.uses_infixes:
        i, p, k = encoded[0] - A, encoded[1] - A, encoded[2] - A
        tail = encoded[3:]
        body = inflected[:i] + inflected[i + p:]
        return body[:len(body) - k] + tail
    if meta.uses_prefixes:
        p, k = encoded[0] - A, encoded[1] - A
        tail = encoded[2:]
        body = inflected[p:]
        return body[:len(body) - k] + tail
    k = encoded[0] - A
    tail = encoded[1:]
    return inflected[:len(inflected) - k] + tail


class MorfDictionary:
    """FSA + metadata, with DictionaryLookup.lookup semantics."""

    def __init__(self, fsa: FSA5, meta: DictionaryMetadata):
        self.fsa = fsa
        self.meta = meta

    @classmethod
    def build(cls, entries: list[tuple[str, str, str]],
              meta: DictionaryMetadata | None = None) -> "MorfDictionary":
        """entries: (inflected, stem, tag) triples."""
        meta = meta or DictionaryMetadata()
        enc = meta.encoding
        sep = bytes([meta.separator])
        seqs = []
        for infl, stem, tag in entries:
            ib, sb = infl.encode(enc), stem.encode(enc)
            seqs.append(ib + sep + encode_stem(ib, sb, meta) + sep
                        + tag.encode(enc))
        return cls(FSA5(serialize_fsa5(seqs, annotation=meta.separator)),
                   meta)

    def lookup(self, word: str) -> list[tuple[str, str]]:
        """-> [(stem, tag)] in FSA order (DictionaryLookup.lookup)."""
        enc = self.meta.encoding
        try:
            wb = word.encode(enc)
        except UnicodeEncodeError:
            return []
        sep = self.meta.separator
        if sep in wb:  # separator inside the word never matches
            return []
        node = self.fsa.walk(self.fsa.root, wb + bytes([sep]))
        if node is None or node == 0:
            return []
        out = []
        for comp in self.fsa._complete(node, b""):
            j = comp.find(bytes([sep]))
            if j < 0:
                encoded, tag = comp, b""
            else:
                encoded, tag = comp[:j], comp[j + 1:]
            stem = decode_stem(wb, encoded, self.meta)
            out.append((stem.decode(enc, "replace"),
                        tag.decode(enc, "replace")))
        return out


# ---------------------------------------------------------------------------
# the filter
# ---------------------------------------------------------------------------

def morfologik_filter(tokens: list[str], dictionary: MorfDictionary,
                      keywords: frozenset | None = None
                      ) -> list[tuple[str, int, list[str]]]:
    """MorfologikFilter.incrementToken over a token list:
    -> [(term, position_increment, tags)].

    Surface lookup falls back to the lowercased form
    (MorfologikFilter.java:142); on a hit the first distinct stem
    replaces the token (posInc preserved = 1 here) and further
    distinct stems follow at posInc 0, consecutive equal stems
    merging tags (popNextLemma:86-109).  Keyword-marked tokens skip
    lookup (SetKeywordMarkerFilter contract)."""
    out: list[tuple[str, int, list[str]]] = []
    for tok in tokens:
        if keywords and tok in keywords:
            out.append((tok, 1, []))
            continue
        lemmas = dictionary.lookup(tok)
        if not lemmas:
            lemmas = dictionary.lookup(tok.lower())
        if not lemmas:
            out.append((tok, 1, []))
            continue
        i = 0
        first = True
        while i < len(lemmas):
            stem = lemmas[i][0]
            tags = []
            while i < len(lemmas) and lemmas[i][0] == stem:
                if lemmas[i][1]:
                    tags.append(lemmas[i][1])
                i += 1
            out.append((stem, 1 if first else 0, tags))
            first = False
    return out
