"""Posting-list codec: FOR-packed 128-blocks + varint tail, pure NumPy.

Re-expresses what Lucene's Lucene41 postings format computes
(ref: lucene/core/src/java/org/apache/lucene/codecs/lucene41/
Lucene41PostingsFormat.java:384 ``BLOCK_SIZE=128`` and its
"Packed Blocks and VInt Blocks" layout; per-block bit width with an
all-equal fast path, ForUtil.java:41,157-177; vInt tail blocks,
Lucene41PostingsWriter.java:226-268,373-407) — with a layout designed
for vectorized NumPy decode instead of Java's streaming reader:

Per-term blob, postings sorted by docID, n = df entries:

    for each full block of 128 postings:
        [1B width_d][packed docid gaps]      (width 0 => all-equal: varint value)
        [1B width_t][packed term freqs]
        [128B raw norm bytes]                (norm byte stored per posting —
                                              the term-partitioned-table analog
                                              of Lucene's separate .nvd norms;
                                              keeps scoring join-free at scale)
    tail (n % 128 postings):
        varints of gaps, then varints of (tf-1), then raw norm bytes

Gap semantics: gaps[0] = docids[0] - prev_last (prev_last = -1 at list
start), gaps[i] = docids[i] - docids[i-1]; all >= 1 (docids strictly
increasing). Each block is independently decodable given its
``first_docid`` from the block-metadata arrays (the analog of
Lucene's skip list, Lucene41SkipWriter.java:46,69-111): random access
into the blob replaces multi-level skip entries.

Block metadata per block (full blocks then tail-as-last-block):
    offset (byte offset in blob), first_docid, n_in_block,
    max_tf, min_len (min decoded field length — block-max WAND bound,
    which Lucene 4.4 lacks; added per the BMW literature).

Bit packing uses little-endian bit order via np.packbits/np.unpackbits
so encode/decode are single vectorized calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import decode_norm_len

BLOCK = 128

__all__ = [
    "BLOCK",
    "varint_encode",
    "varint_decode",
    "pack_bits",
    "unpack_bits",
    "TermPostings",
    "pack_postings",
    "unpack_postings",
    "decode_block",
]


# ---------------------------------------------------------------- varint

def varint_encode(vals: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array -> uint8 byte stream (vectorized)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8)
    nb = np.ones(vals.shape, dtype=np.int64)
    for j in range(1, 10):
        nb += (vals >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        idx = offsets[mask] + j
        chunk = (vals[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out


def varint_decode(buf: np.ndarray, count: int) -> tuple[np.ndarray, int]:
    """Decode `count` LEB128 values from a uint8 array.

    Returns (values uint64, bytes_consumed). Vectorized over values.
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64), 0
    cont = (buf & 0x80) != 0
    ends = np.flatnonzero(~cont)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    maxlen = int(lengths.max())
    for j in range(maxlen):
        mask = lengths > j
        vals[mask] |= (buf[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals, int(ends[-1]) + 1


# ------------------------------------------------------------- bit packing

def pack_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """Pack values into `width`-bit little-endian lanes -> uint8 bytes."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little")


def unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits: first n `width`-bit values -> uint64 array."""
    bits = np.unpackbits(buf, count=n * width, bitorder="little")
    pows = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) * pows).sum(axis=1, dtype=np.uint64)


def _width_of(maxval: int) -> int:
    return max(int(maxval).bit_length(), 1)


# ------------------------------------------------------------ term packing

@dataclass
class TermPostings:
    """One term's packed postings + block metadata (one parquet row)."""

    blob: bytes
    n: int
    block_offset: np.ndarray      # int32, byte offset of each block in blob
    block_first_docid: np.ndarray  # int64
    block_n: np.ndarray           # int32 postings per block
    block_max_tf: np.ndarray      # int32
    block_min_len: np.ndarray     # float32 (decoded min field length)


def pack_postings(docids: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                  prev_last: int = -1) -> TermPostings:
    """Pack one term's (sorted docids, tfs, norm bytes) into a blob."""
    n = len(docids)
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    norms = np.ascontiguousarray(norms, dtype=np.uint8)
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = docids[0] - prev_last
        np.subtract(docids[1:], docids[:-1], out=gaps[1:], casting="unsafe")

    nfull = n // BLOCK
    tail_n = n - nfull * BLOCK
    nblocks = nfull + (1 if tail_n else 0)

    parts: list[np.ndarray] = []
    offs = np.zeros(nblocks, dtype=np.int32)
    firsts = np.zeros(nblocks, dtype=np.int64)
    bns = np.zeros(nblocks, dtype=np.int32)
    maxtfs = np.zeros(nblocks, dtype=np.int32)
    minlens = np.zeros(nblocks, dtype=np.float32)
    pos = 0

    def _emit_packed(vals: np.ndarray) -> list[np.ndarray]:
        if vals.min() == vals.max():
            return [np.array([0], dtype=np.uint8), varint_encode(vals[:1])]
        w = _width_of(int(vals.max()))
        return [np.array([w], dtype=np.uint8), pack_bits(vals, w)]

    for b in range(nfull):
        lo, hi = b * BLOCK, (b + 1) * BLOCK
        offs[b] = pos
        firsts[b] = docids[lo]
        bns[b] = BLOCK
        maxtfs[b] = int(tfs[lo:hi].max())
        minlens[b] = decode_norm_len(norms[lo:hi]).min()
        chunk = (
            _emit_packed(gaps[lo:hi])
            + _emit_packed(tfs[lo:hi].astype(np.uint64))
            + [norms[lo:hi]]
        )
        for c in chunk:
            parts.append(c)
            pos += len(c)

    if tail_n:
        lo = nfull * BLOCK
        offs[-1] = pos
        firsts[-1] = docids[lo]
        bns[-1] = tail_n
        maxtfs[-1] = int(tfs[lo:].max())
        minlens[-1] = decode_norm_len(norms[lo:]).min()
        chunk = [
            varint_encode(gaps[lo:]),
            varint_encode((tfs[lo:] - 1).astype(np.uint64)),
            norms[lo:],
        ]
        for c in chunk:
            parts.append(c)
            pos += len(c)

    blob = b"".join(p.tobytes() for p in parts)
    return TermPostings(blob, n, offs, firsts, bns, maxtfs, minlens)


def _varint_nbytes(vals: np.ndarray) -> np.ndarray:
    nb = np.ones(vals.shape, dtype=np.int64)
    for j in range(1, 10):
        m = vals >= (np.uint64(1) << np.uint64(7 * j))
        if not m.any():
            break
        nb += m.astype(np.int64)
    return nb


def pack_postings_batch(bounds: np.ndarray, docids: np.ndarray, tfs: np.ndarray,
                        norms: np.ndarray) -> list[TermPostings]:
    """Pack many terms at once: flat (docids, tfs, norms) sorted by
    (term, docid); ``bounds`` are term start offsets (len = n_terms + 1).

    The Zipf fast path: all tail sections (every term's final <128
    postings — i.e. *all* postings of the long tail of rare terms) are
    varint-encoded in two single vectorized calls, then sliced per term.
    Only terms with >=128 postings take the per-block FOR loop. This is
    what makes per-segment inversion CPU-cheap at web scale.
    """
    n_terms = len(bounds) - 1
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs64 = np.ascontiguousarray(tfs, dtype=np.int64)
    norms = np.ascontiguousarray(norms, dtype=np.uint8)
    lens = np.diff(bounds)
    gaps = np.empty(len(docids), dtype=np.uint64)
    if len(docids):
        np.subtract(docids[1:], docids[:-1], out=gaps[1:], casting="unsafe")
        gaps[bounds[:-1]] = (docids[bounds[:-1]] + 1).astype(np.uint64)

    nfull = lens // BLOCK
    tail_n = lens - nfull * BLOCK
    # mask of tail positions (vectorized)
    pos_in_term = np.arange(len(docids)) - np.repeat(bounds[:-1], lens)
    tail_mask = pos_in_term >= np.repeat(nfull * BLOCK, lens)
    t_gaps = gaps[tail_mask]
    t_tfs = (tfs64[tail_mask] - 1).astype(np.uint64)
    t_norms = norms[tail_mask]
    # per-term byte extents of the two varint streams
    nb_g = _varint_nbytes(t_gaps)
    nb_t = _varint_nbytes(t_tfs)
    t_bounds = np.concatenate(([0], np.cumsum(tail_n)))
    g_off = np.concatenate(([0], np.cumsum(nb_g)))[t_bounds]
    t_off = np.concatenate(([0], np.cumsum(nb_t)))[t_bounds]
    stream_g = varint_encode(t_gaps)
    stream_t = varint_encode(t_tfs)
    dec_len = decode_norm_len(norms)

    out: list[TermPostings] = []
    for i in range(n_terms):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        nf = int(nfull[i])
        tn = int(tail_n[i])
        nblocks = nf + (1 if tn else 0)
        offs = np.zeros(nblocks, dtype=np.int32)
        firsts = np.zeros(nblocks, dtype=np.int64)
        bns = np.zeros(nblocks, dtype=np.int32)
        maxtfs = np.zeros(nblocks, dtype=np.int32)
        minlens = np.zeros(nblocks, dtype=np.float32)
        parts: list[bytes] = []
        pos = 0
        if nf:
            tp = pack_postings(docids[lo:lo + nf * BLOCK], tfs64[lo:lo + nf * BLOCK],
                               norms[lo:lo + nf * BLOCK], prev_last=-1)
            parts.append(tp.blob)
            offs[:nf] = tp.block_offset
            firsts[:nf] = tp.block_first_docid
            bns[:nf] = tp.block_n
            maxtfs[:nf] = tp.block_max_tf
            minlens[:nf] = tp.block_min_len
            pos = len(tp.blob)
        if tn:
            ts, te = int(t_bounds[i]), int(t_bounds[i + 1])
            gs = stream_g[g_off[i]:g_off[i + 1]].tobytes()
            tt = stream_t[t_off[i]:t_off[i + 1]].tobytes()
            nn = t_norms[ts:te].tobytes()
            parts += [gs, tt, nn]
            offs[-1] = pos
            firsts[-1] = docids[hi - tn]
            bns[-1] = tn
            maxtfs[-1] = int(tfs64[hi - tn:hi].max())
            minlens[-1] = dec_len[hi - tn:hi].min()
        out.append(TermPostings(b"".join(parts), int(lens[i]), offs, firsts,
                                bns, maxtfs, minlens))
    return out


# ----------------------------------------------------------- positions

def pack_positions_batch(term_tf_bounds: np.ndarray, tfs: np.ndarray,
                         flat_positions: np.ndarray) -> list[bytes]:
    """Per-term position blobs (the .pos file analog, Lucene41PostingsFormat
    "Positions"): for every posting, its within-doc token positions as
    delta varints (first absolute, then gaps), all postings of a term
    concatenated in posting order. One vectorized varint pass total.

    term_tf_bounds: posting-index bounds per term (len = n_terms + 1);
    tfs: per-posting freq (== positions count); flat_positions: all
    positions in posting order.
    """
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    pos = np.ascontiguousarray(flat_positions, dtype=np.int64)
    n = len(pos)
    if n == 0:
        return [b""] * (len(term_tf_bounds) - 1)
    posting_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    deltas = np.empty(n, dtype=np.uint64)
    np.subtract(pos[1:], pos[:-1], out=deltas[1:], casting="unsafe")
    deltas[posting_starts] = pos[posting_starts].astype(np.uint64)
    stream = varint_encode(deltas)
    nb = _varint_nbytes(deltas)
    byte_cum = np.concatenate(([0], np.cumsum(nb)))
    # byte extent per term = bytes of its postings' position values
    val_bounds = np.concatenate(([0], np.cumsum(tfs)))[term_tf_bounds]
    term_bytes = byte_cum[val_bounds]
    return [stream[term_bytes[i]:term_bytes[i + 1]].tobytes()
            for i in range(len(term_tf_bounds) - 1)]


def decode_positions(pos_blob: bytes, tfs: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse: -> (flat positions, posting bounds = concat([0],cumsum(tfs)))."""
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    if total == 0:
        return np.empty(0, np.int64), bounds
    buf = np.frombuffer(pos_blob, dtype=np.uint8)
    deltas, _ = varint_decode(buf, total)
    cum = np.cumsum(deltas.astype(np.int64))
    starts = bounds[:-1]
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = cum[starts[1:] - 1]
    return cum - np.repeat(base, tfs), bounds


def decode_block(buf: np.ndarray, offset: int, first_docid: int, n_in_block: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (docids int64, tfs int32, norms uint8)."""
    pos = int(offset)
    if n_in_block == BLOCK:
        w = int(buf[pos]); pos += 1
        if w == 0:
            vals, used = varint_decode(buf[pos:pos + 10], 1)
            gaps = np.full(BLOCK, vals[0], dtype=np.uint64)
            pos += used
        else:
            nbytes = (BLOCK * w + 7) // 8
            gaps = unpack_bits(buf[pos:pos + nbytes], BLOCK, w)
            pos += nbytes
        w = int(buf[pos]); pos += 1
        if w == 0:
            vals, used = varint_decode(buf[pos:pos + 10], 1)
            tfs = np.full(BLOCK, vals[0], dtype=np.uint64)
            pos += used
        else:
            nbytes = (BLOCK * w + 7) // 8
            tfs = unpack_bits(buf[pos:pos + nbytes], BLOCK, w)
            pos += nbytes
        norms = buf[pos:pos + BLOCK]
    else:
        gaps, used = varint_decode(buf[pos:], n_in_block)
        pos += used
        tfs, used = varint_decode(buf[pos:], n_in_block)
        tfs = tfs + np.uint64(1)
        pos += used
        norms = buf[pos:pos + n_in_block]
    docids = (int(first_docid) - int(gaps[0])) + np.cumsum(gaps, dtype=np.int64)
    return docids, tfs.astype(np.int32), norms.astype(np.uint8)


def unpack_postings(blob: bytes, block_offset: np.ndarray, block_first_docid: np.ndarray,
                    block_n: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full term blob -> (docids, tfs, norms)."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    outs = [decode_block(buf, block_offset[b], block_first_docid[b], int(block_n[b]))
            for b in range(len(block_n))]
    if not outs:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.int32), z.astype(np.uint8)
    return (np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
            np.concatenate([o[2] for o in outs]))


# ------------------------------------------- pluggable postings formats

VINT_BLOCK = 127  # < BLOCK, so every block takes decode_block's varint path


def pack_postings_batch_vint(bounds: np.ndarray, docids: np.ndarray,
                             tfs: np.ndarray, norms: np.ndarray
                             ) -> list[TermPostings]:
    """'vint' PostingsFormat: pure delta-varint blocks of <= 127
    postings — every block uses the byte layout of the lucene41 format's
    vInt tail block (varint gaps, varint tf-1, raw norm bytes), so the
    existing block reader decodes it unchanged (decode_block dispatches
    on block_n < 128). Same TermPostings schema, same per-block WAND
    metadata. The trade-off mirrors Lucene's alternative postings
    formats vs Lucene41 (ref: lucene/codecs/src/java/org/apache/lucene/
    codecs/pulsing/PulsingPostingsFormat.java:35, codecs/Codec.java:122
    pluggable registry): no bit-packing work at write, ~1.3-2x larger
    blobs at read.

    Whole streams are varint-encoded in two vectorized calls and sliced
    per block — the same Zipf trick as the lucene41 tail path."""
    n_terms = len(bounds) - 1
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs64 = np.ascontiguousarray(tfs, dtype=np.int64)
    norms = np.ascontiguousarray(norms, dtype=np.uint8)
    gaps = np.empty(len(docids), dtype=np.uint64)
    if len(docids):
        np.subtract(docids[1:], docids[:-1], out=gaps[1:], casting="unsafe")
        gaps[bounds[:-1]] = (docids[bounds[:-1]] + 1).astype(np.uint64)
    tm1 = (tfs64 - 1).astype(np.uint64)
    cum_g = np.concatenate(([0], np.cumsum(_varint_nbytes(gaps))))
    cum_t = np.concatenate(([0], np.cumsum(_varint_nbytes(tm1))))
    stream_g = varint_encode(gaps).tobytes() if len(gaps) else b""
    stream_t = varint_encode(tm1).tobytes() if len(tm1) else b""
    dec_len = decode_norm_len(norms)
    norms_b = norms.tobytes()
    out: list[TermPostings] = []
    for i in range(n_terms):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        starts = np.arange(lo, hi, VINT_BLOCK, dtype=np.int64)
        ends = np.minimum(starts + VINT_BLOCK, hi)
        nblocks = len(starts)
        offs = np.zeros(nblocks, dtype=np.int32)
        maxtfs = np.zeros(nblocks, dtype=np.int32)
        minlens = np.zeros(nblocks, dtype=np.float32)
        parts: list[bytes] = []
        pos = 0
        for j in range(nblocks):
            s, e = int(starts[j]), int(ends[j])
            offs[j] = pos
            chunk = (stream_g[cum_g[s]:cum_g[e]]
                     + stream_t[cum_t[s]:cum_t[e]] + norms_b[s:e])
            parts.append(chunk)
            pos += len(chunk)
            maxtfs[j] = int(tfs64[s:e].max())
            minlens[j] = dec_len[s:e].min()
        out.append(TermPostings(b"".join(parts), hi - lo, offs,
                                docids[starts].astype(np.int64),
                                (ends - starts).astype(np.int32),
                                maxtfs, minlens))
    return out


# PostingsFormat registry (Codec.java:122 / PostingsFormat.forName analog):
# both formats share TermPostings + the block-metadata-driven reader, so
# readers need no format dispatch — the blob is self-describing through
# its block_n array.
POSTINGS_FORMATS = {
    "lucene41": pack_postings_batch,
    "vint": pack_postings_batch_vint,
}
