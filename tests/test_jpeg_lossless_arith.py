"""Lossless JPEG (SOF3, T.81 Annex H) and arithmetic-coded JPEG
(SOF9, QM coder per T.81 Annex D + F.1.4 statistical models)."""

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.jpegarith import (
    FIXED, QMDecoder, QMEncoder, _Ctx, encode_jpeg_arith)
from lucene_solr_1_spark.datapipe.jpegcodec import (
    decode_jpeg, decode_jpeg_lossless, encode_jpeg,
    encode_jpeg_lossless)


# --------------------------------------------------------- lossless

@pytest.mark.parametrize("predictor", range(1, 8))
def test_lossless_roundtrip_every_predictor(predictor):
    rng = np.random.default_rng(100 + predictor)
    img = rng.integers(0, 256, (13, 17), np.uint8)
    out = decode_jpeg_lossless(encode_jpeg_lossless(img, predictor))
    assert np.array_equal(out[:, :, 0], img)


def test_lossless_rgb_and_dispatch():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 11, 3), np.uint8)
    blob = encode_jpeg_lossless(img, predictor=4)
    assert np.array_equal(decode_jpeg_lossless(blob), img)
    # the unified decode_jpeg entry point dispatches SOF3
    assert np.array_equal(decode_jpeg(blob), img)


@pytest.mark.parametrize("precision", [8, 12, 16])
def test_lossless_high_precision(precision):
    rng = np.random.default_rng(precision)
    img = rng.integers(0, 1 << precision, (8, 8), np.int64)
    blob = encode_jpeg_lossless(img, predictor=7, precision=precision)
    assert np.array_equal(decode_jpeg_lossless(blob)[:, :, 0], img)
    # uint8 projection for the image pipeline
    want = (img >> (precision - 8)).astype(np.uint8)
    assert np.array_equal(decode_jpeg(blob), want)


def test_lossless_restart_and_point_transform():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), np.uint8)
    blob = encode_jpeg_lossless(img, predictor=2, restart_interval=37)
    assert np.array_equal(decode_jpeg_lossless(blob)[:, :, 0], img)
    blob = encode_jpeg_lossless(img, predictor=1, point_transform=2)
    assert np.array_equal(decode_jpeg_lossless(blob)[:, :, 0], img >> 2)


def test_lossless_gradient_closed_form():
    """The contract fixture's property: gradient decode is exact."""
    y, x = np.mgrid[0:18, 0:14]
    img = ((7 * 6 + 13 * y + 29 * x) % 256).astype(np.uint8)
    blob = encode_jpeg_lossless(img, predictor=4)
    assert int(decode_jpeg(blob).astype(np.int64).sum()) == \
        int(img.astype(np.int64).sum())


# -------------------------------------------------------- QM coder

def test_qm_fuzz_roundtrip():
    rng = np.random.default_rng(42)
    for trial in range(40):
        n = int(rng.integers(1, 3000))
        nctx = int(rng.integers(1, 8))
        bits = ((rng.random(n) < 0.05).astype(int) if trial % 3 == 0
                else rng.integers(0, 2, n).astype(int))
        ctx_ids = rng.integers(0, nctx + 1, n)
        enc = QMEncoder()
        ectx = [_Ctx() for _ in range(nctx)]
        for b, ci in zip(bits, ctx_ids):
            enc.encode(FIXED if ci == nctx else ectx[ci], int(b))
        from lucene_solr_1_spark.datapipe.jpegarith import destuff
        dec = QMDecoder(destuff(enc.flush()))
        dctx = [_Ctx() for _ in range(nctx)]
        out = [dec.decode(FIXED if ci == nctx else dctx[ci])
               for ci in ctx_ids]
        assert np.array_equal(out, bits), f"trial {trial}"


def test_qm_compresses_skewed_source():
    """An adaptive context on a 95/5 source must beat 1 bit/symbol."""
    rng = np.random.default_rng(1)
    bits = (rng.random(20000) < 0.05).astype(int)
    enc = QMEncoder()
    ctx = _Ctx()
    for b in bits:
        enc.encode(ctx, int(b))
    blob = enc.flush()
    assert len(blob) * 8 < 0.5 * len(bits)     # < 0.5 bits/symbol


# --------------------------------------------- SOF9 vs SOF0 parity

@pytest.mark.parametrize("shape,quality", [
    ((8, 8), 100), ((16, 24), 90), ((33, 41), 75), ((64, 64), 60)])
def test_arith_equals_baseline_gray(shape, quality):
    rng = np.random.default_rng(shape[0] * 100 + quality)
    img = rng.integers(0, 256, shape, np.uint8)
    d_base = decode_jpeg(encode_jpeg(img, quality=quality))
    d_arith = decode_jpeg(encode_jpeg_arith(img, quality=quality))
    assert np.array_equal(d_base, d_arith)


def test_arith_equals_baseline_rgb_and_restart():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 17, 3), np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=85)),
        decode_jpeg(encode_jpeg_arith(img, quality=85)))
    img = rng.integers(0, 256, (40, 40), np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=80, restart_interval=3)),
        decode_jpeg(encode_jpeg_arith(img, quality=80,
                                      restart_interval=3)))


def test_arith_beats_huffman_on_smooth_content():
    yy, xx = np.mgrid[0:64, 0:64]
    img = (128 + 100 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).astype(np.uint8)
    b_h = encode_jpeg(img, quality=90)
    b_a = encode_jpeg_arith(img, quality=90)
    assert np.array_equal(decode_jpeg(b_h), decode_jpeg(b_a))
    assert len(b_a) < len(b_h)      # the QM coder's raison d'etre


def test_arith_flat_gray_fixture_property():
    for i in (1, 3, 7, 15):
        c = (7 + 13 * i) % 256
        w, h = 8 * (1 + i % 6), 8 * (1 + i % 4)
        img = np.full((h, w), c, np.uint8)
        blob = encode_jpeg_arith(img, quality=100,
                                 restart_interval=(2 if i % 3 == 0 else 0))
        out = decode_jpeg(blob)
        assert out.shape == (h, w)
        assert np.all(out == c)
