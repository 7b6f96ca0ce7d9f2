"""FLAC codec (datapipe/flaccodec.py): encoder/decoder round trips
plus hand-assembled streams pinning the decoder-only surface (LPC
subframes, stereo decorrelation modes, rice escape partitions) the
fixture encoder never emits."""

import struct

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.flaccodec import (
    _BitsW, _crc8, _crc16, _utf8_number, decode_flac, encode_flac)


def _rt(x, **kw):
    dec, rate = decode_flac(encode_flac(x, **kw))
    return dec, rate


def test_roundtrip_sine_compresses():
    t = np.arange(5000)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    blob = encode_flac(sig, rate=8000, bps=16)
    dec, rate = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(dec[:, 0], sig)
    assert len(blob) < 2 * len(sig)          # beats raw PCM


def test_roundtrip_stereo_noise_exact():
    rng = np.random.default_rng(9)
    st = rng.integers(-32768, 32768, (3000, 2)).astype(np.int64)
    dec, rate = _rt(st, rate=44100, bps=16)
    assert rate == 44100
    assert np.array_equal(dec, st)


def test_roundtrip_silence_constant_subframe():
    z = np.zeros(9000, np.int64)
    blob = encode_flac(z, rate=16000)
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], z)
    assert len(blob) < 200                   # CONSTANT subframes


def test_roundtrip_ramp_high_order():
    r = np.arange(5000, dtype=np.int64) % 20000 - 10000
    blob = encode_flac(r, rate=8000)
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], r)
    assert len(blob) < 0.2 * 2 * len(r)      # order-k kills a ramp


@pytest.mark.parametrize("n", [1, 191, 4096, 4097, 5001])
def test_roundtrip_odd_lengths(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-100, 100, n).astype(np.int64)
    dec, _ = _rt(x, rate=8000)
    assert np.array_equal(dec[:, 0], x)


def test_roundtrip_8_bit():
    rng = np.random.default_rng(8)
    x = rng.integers(-128, 128, 1000).astype(np.int64)
    dec, _ = _rt(x, rate=8000, bps=8)
    assert np.array_equal(dec[:, 0], x)


def test_crc_rejects_corruption():
    x = np.arange(500, dtype=np.int64)
    blob = bytearray(encode_flac(x, rate=8000))
    blob[-3] ^= 0x40                         # flip a bit in the frame
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


# ------------------------------- hand-built decoder-only surfaces

def _streaminfo(rate, nch, bps, total, block):
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2
    si += bytes([(rate >> 12) & 0xFF, (rate >> 4) & 0xFF,
                 ((rate & 0x0F) << 4) | ((nch - 1) << 1)
                 | ((bps - 1) >> 4),
                 (((bps - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)])
    si += struct.pack(">I", total & 0xFFFFFFFF)
    si += b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big")
            + bytes(si))


def _frame_header(bsize, chan_code, bps_code=4, rate_code=4):
    hdr = _BitsW()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)                          # 16-bit blocksize-1 field
    hdr.write(rate_code, 4)
    hdr.write(chan_code, 4)
    hdr.write(bps_code, 3)
    hdr.write(0, 1)
    hdr.align()
    head = bytes(hdr.out) + _utf8_number(0) + struct.pack(">H", bsize - 1)
    return head + bytes([_crc8(head)])


def _verbatim_subframe(bw, vals, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in vals:
        bw.write(int(v) & ((1 << bps) - 1), bps)


def test_lpc_subframe_decodes():
    """Hand-built LPC order-2 subframe: pred = (2a - b) with shift 0
    (a linear extrapolator) over a pure ramp -> all residuals 0."""
    n, bps = 16, 16
    x = np.arange(n, dtype=np.int64) * 3 + 5
    head = _frame_header(n, chan_code=0)
    bw = _BitsW()
    bw.write(0, 1)
    bw.write(32 + 1, 6)                      # LPC order 2 (type 33)
    bw.write(0, 1)                           # no wasted bits
    bw.write(int(x[0]) & 0xFFFF, bps)        # warmup
    bw.write(int(x[1]) & 0xFFFF, bps)
    bw.write(0, 4)                           # precision-1 = 0 -> 1 bit?
    # 1-bit coefficients can't express (2, -1); use precision 3
    bw = _BitsW()
    bw.write(0, 1)
    bw.write(32 + 1, 6)
    bw.write(0, 1)
    bw.write(int(x[0]) & 0xFFFF, bps)
    bw.write(int(x[1]) & 0xFFFF, bps)
    bw.write(2, 4)                           # precision = 3 bits
    bw.write(0, 5)                           # shift 0
    bw.write(2 & 0x7, 3)                     # coef a (most recent) = 2
    bw.write(-1 & 0x7, 3)                    # coef b = -1
    bw.write(0, 2)                           # rice method 0
    bw.write(0, 4)                           # partition order 0
    bw.write(0, 4)                           # rice param 0
    for _ in range(n - 2):
        bw.unary(0)                          # residual 0
    bw.align()
    frame = head + bytes(bw.out)
    frame += struct.pack(">H", _crc16(frame))
    blob = _streaminfo(8000, 1, bps, n, n) + frame
    dec, rate = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode,chan_code", [
    ("left_side", 8), ("right_side", 9), ("mid_side", 10)])
def test_stereo_decorrelation_modes(mode, chan_code):
    n, bps = 8, 16
    rng = np.random.default_rng(chan_code)
    left = rng.integers(-1000, 1000, n).astype(np.int64)
    right = rng.integers(-1000, 1000, n).astype(np.int64)
    side = left - right
    head = _frame_header(n, chan_code=chan_code)
    bw = _BitsW()
    if mode == "left_side":
        _verbatim_subframe(bw, left, bps)
        _verbatim_subframe(bw, side, bps + 1)
    elif mode == "right_side":
        _verbatim_subframe(bw, side, bps + 1)
        _verbatim_subframe(bw, right, bps)
    else:
        mid = (left + right) >> 1
        _verbatim_subframe(bw, mid, bps)
        _verbatim_subframe(bw, side, bps + 1)
    bw.align()
    frame = head + bytes(bw.out)
    frame += struct.pack(">H", _crc16(frame))
    blob = _streaminfo(8000, 2, bps, n, n) + frame
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], left)
    assert np.array_equal(dec[:, 1], right)


def test_rice_escape_partition():
    """Escape code (param 15) -> raw 5-bit-width residuals."""
    n, bps = 8, 16
    x = np.array([3, -3, 2, -2, 1, -1, 0, 4], np.int64)
    head = _frame_header(n, chan_code=0)
    bw = _BitsW()
    bw.write(0, 1)
    bw.write(8, 6)                           # FIXED order 0
    bw.write(0, 1)
    bw.write(0, 2)                           # method 0 (4-bit params)
    bw.write(0, 4)                           # partition order 0
    bw.write(15, 4)                          # ESCAPE
    bw.write(4, 5)                           # raw width 4 bits
    for v in x:
        bw.write(int(v) & 0xF, 4)
    bw.align()
    frame = head + bytes(bw.out)
    frame += struct.pack(">H", _crc16(frame))
    blob = _streaminfo(8000, 1, bps, n, n) + frame
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], x)


def test_audio_features_flac_real_path(spark):
    from lucene_solr_1_spark.datapipe.multimodal import (MEDIA_SCHEMA,
                                                         audio_features)
    t = np.arange(4000)
    sig = (9000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int64)
    blob = encode_flac(sig, rate=8000, bps=16)
    media = spark.createDataFrame(
        [(0, "audio", "audio/flac", bytearray(blob), {})],
        schema=MEDIA_SCHEMA)
    r = audio_features(media, n_mfcc=5).collect()[0]
    assert r["sample_rate"] == 8000
    assert r["duration_sec"] == pytest.approx(0.5, abs=1e-6)
    assert len(r["mfcc"]) == 5
