"""Hypothesis property fuzzing of the pure-NumPy kernels: postings
codec (incl. per-block decode vs whole-blob decode), varint, bit
packing, positions codec, trie split, SmallFloat. No Spark needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_1_spark.index.codec import (decode_block, decode_positions,
                                             pack_bits, pack_positions_batch,
                                             pack_postings, unpack_bits,
                                             unpack_postings, varint_decode,
                                             varint_encode)
from lucene_solr_1_spark.index.numeric import split_range, trie_terms_py
from lucene_solr_1_spark.index.smallfloat import (byte315_to_float,
                                                  float_to_byte315)

_SETTINGS = dict(max_examples=60, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 2**40), min_size=0, max_size=500))
def test_varint_roundtrip_fuzz(vals):
    arr = np.asarray(vals, dtype=np.int64)
    buf = varint_encode(arr)
    out, used = varint_decode(np.asarray(buf, np.uint8), len(arr))
    assert np.array_equal(out, arr)
    assert used == len(buf)


@settings(**_SETTINGS)
@given(st.integers(1, 64),
       st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300))
def test_pack_bits_roundtrip_fuzz(width, vals):
    arr = np.asarray(vals, dtype=np.uint64) & ((1 << width) - 1
                                               if width < 64 else ~np.uint64(0))
    arr = arr.astype(np.int64) if width < 64 else arr.view(np.int64)
    arr = np.abs(arr)
    arr = arr & ((1 << min(width, 62)) - 1)
    out = unpack_bits(np.asarray(pack_bits(arr, width), np.uint8),
                      len(arr), width)
    assert np.array_equal(out, arr)


@st.composite
def postings_lists(draw):
    n = draw(st.integers(1, 700))
    gaps = draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n))
    start = draw(st.integers(0, 2**44))
    docids = start + np.cumsum(np.asarray(gaps, np.int64)) - gaps[0]
    tfs = np.asarray(draw(st.lists(st.integers(1, 10**5),
                                   min_size=n, max_size=n)), np.int32)
    norms = np.asarray(draw(st.lists(st.integers(0, 255),
                                     min_size=n, max_size=n)), np.uint8)
    return docids, tfs, norms


@settings(**_SETTINGS)
@given(postings_lists())
def test_postings_roundtrip_fuzz(p):
    docids, tfs, norms = p
    tp = pack_postings(docids, tfs, norms)
    d, t, nb = unpack_postings(np.frombuffer(tp.blob, np.uint8),
                               tp.block_offset, tp.block_first_docid,
                               tp.block_n)
    assert np.array_equal(d, docids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(nb, norms)


@settings(**_SETTINGS)
@given(postings_lists())
def test_block_decode_equals_whole_blob_fuzz(p):
    """decode_block on every block == the corresponding slice of the
    whole-blob decode (the skip-list contract WAND relies on)."""
    docids, tfs, norms = p
    tp = pack_postings(docids, tfs, norms)
    buf = np.frombuffer(tp.blob, np.uint8)
    pos = 0
    for bi in range(len(tp.block_offset)):
        d, t, nb = decode_block(buf, int(tp.block_offset[bi]),
                                int(tp.block_first_docid[bi]),
                                int(tp.block_n[bi]))
        n = int(tp.block_n[bi])
        assert np.array_equal(d, docids[pos:pos + n])
        assert np.array_equal(t, tfs[pos:pos + n])
        assert np.array_equal(nb, norms[pos:pos + n])
        pos += n
    assert pos == len(docids)


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.integers(0, 2**20), min_size=1, max_size=30),
                min_size=1, max_size=40))
def test_positions_roundtrip_fuzz(pos_lists):
    """pack_positions_batch/decode_positions round-trip: one posting
    per list, tf = len(list), positions ascending (as emitted by the
    inverter)."""
    pos_lists = [sorted(p) for p in pos_lists]
    tfs = np.asarray([len(p) for p in pos_lists], np.int64)
    flat = np.concatenate([np.asarray(p, np.int64) for p in pos_lists])
    bounds = np.asarray([0, len(tfs)], np.int64)
    blobs = pack_positions_batch(bounds, tfs, flat)
    pos, bnds = decode_positions(bytes(blobs[0]), tfs)
    assert np.array_equal(pos, flat)
    assert np.array_equal(np.diff(bnds), tfs)


@settings(**_SETTINGS)
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1),
       st.integers(1, 8))
def test_split_range_fuzz(a, b, step):
    lo, hi = min(a, b), max(a, b)
    rs = split_range(lo, hi, step, bits=16)
    probes = {lo, hi, (lo + hi) // 2, max(0, lo - 1), min(2**16 - 1, hi + 1)}
    for v in probes:
        hits = sum(1 for s, x, y in rs if x <= (v >> s) <= y)
        assert hits == (1 if lo <= v <= hi else 0)


@settings(**_SETTINGS)
@given(st.integers(-2**62, 2**62), st.integers(-2**62, 2**62))
def test_trie_terms_range_membership_fuzz(v, w):
    from lucene_solr_1_spark.index.numeric import range_term_bounds
    lo, hi = min(v, w), max(v, w)
    bounds = range_term_bounds(lo, hi, 8)
    for probe in (lo, hi, (lo + hi) // 2, lo - 1, hi + 1):
        inside = lo <= probe <= hi
        n = sum(1 for t in trie_terms_py(probe) for a, b in bounds
                if a <= t <= b)
        assert n == (1 if inside else 0)


@settings(**_SETTINGS)
@given(st.floats(min_value=6e-10, max_value=7e9, allow_nan=False))
def test_smallfloat_lossy_bound_inside_range_fuzz(x):
    """Within SmallFloat-315's representable range (~5.8e-10..7.5e9 —
    values outside clamp, as in Lucene's floatToByte315) the decoded
    value truncates downward by at most a factor of 2 (3 mantissa
    bits), never rounds up."""
    b = int(float_to_byte315(np.asarray([x], np.float32))[0])
    y = float(byte315_to_float(np.asarray([b], np.uint8))[0])
    assert 0 <= b <= 255
    assert y <= x * 1.000001
    assert y * 2.000001 >= x


@settings(**_SETTINGS)
@given(st.floats(min_value=0.0, max_value=3.4e38, allow_nan=False),
       st.floats(min_value=0.0, max_value=3.4e38, allow_nan=False))
def test_smallfloat_monotone_fuzz(a, b):
    """Encoding preserves order for ANY pair (clamping keeps ties)."""
    lo, hi = sorted((a, b))
    blo = int(float_to_byte315(np.asarray([lo], np.float32))[0])
    bhi = int(float_to_byte315(np.asarray([hi], np.float32))[0])
    assert blo <= bhi
