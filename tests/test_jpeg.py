"""Baseline JPEG codec (datapipe/jpegcodec.py): hand-assembled
spec-derived bitstreams (encoder-independent decode checks), encode/
decode round-trip properties, 4:2:0 + restart-marker coverage, and the
multimodal pipeline integration."""

import struct

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.jpegcodec import (
    AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, decode_jpeg,
    encode_jpeg)


def _hand_jpeg(scan_bytes: bytes, w: int = 8, h: int = 8) -> bytes:
    """Assemble a 1-component baseline JPEG by hand from the T.81 spec:
    all-ones quant table, Annex K luma Huffman tables, single 8x8 MCU
    scan provided by the caller. Everything here is derived from the
    spec text, NOT from our encoder — so it cross-checks the decoder."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    parts.append(seg(0xDB, bytes([0]) + bytes([1] * 64)))
    parts.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                     + bytes([1, 0x11, 0])))
    parts.append(seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
                     + bytes(DC_LUMA_VALS)))
    parts.append(seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
                     + bytes(AC_LUMA_VALS)))
    parts.append(seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))
    parts.append(scan_bytes)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_hand_assembled_flat_128():
    """DC diff 0 (category-0 code '00', 2 bits) + EOB ('1010', 4 bits)
    + 1-padding = 0x2B: must decode to an 8x8 flat 128 block (level
    shift of the all-zero coefficient block)."""
    img = decode_jpeg(_hand_jpeg(bytes([0x2B])))
    assert img.shape == (8, 8)
    assert (img == 128).all()


def test_hand_assembled_flat_164_pins_dc_scale():
    """Flat gray 164: T.81 FDCT gives DC = 8*(164-128) = 288 -> DC
    category 9 (code '1111110') + 9 magnitude bits '100100000' + EOB
    '1010' + 1-padding = FD 20 AF. Pins the orthonormal IDCT scale,
    EXTEND, and the DC category coding against the spec."""
    img = decode_jpeg(_hand_jpeg(bytes([0xFD, 0x20, 0xAF])))
    assert img.shape == (8, 8)
    assert (img == 164).all()


def test_flat_roundtrip_exact_q100():
    for c in (0, 7, 128, 200, 255):
        img = np.full((16, 24), c, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == (16, 24)
        assert (out == c).all(), f"flat {c} must round-trip exactly"


def test_rgb_roundtrip_q100_within_one():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (24, 17, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4, \
        "all-ones tables: only color-transform/IDCT rounding remains"
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 1.0


def test_gray_noise_roundtrip_q100_within_one():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (21, 13)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_lossy_quality_bounds_error():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(base, 8, 0), 8, 1)    # blockwise-flat
    out = decode_jpeg(encode_jpeg(img, quality=90))
    diff = np.abs(out.astype(float) - img.astype(float))
    assert diff.mean() < 2.0 and diff.max() < 30


def test_420_subsampling_roundtrip():
    rng = np.random.default_rng(6)
    base = rng.integers(0, 255, (2, 3, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(base, 16, 0), 16, 1)  # 32x48, 16px cells
    blob = encode_jpeg(img, quality=95, subsample=(2, 2))
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    # interior of each 16px cell unaffected by chroma downsampling
    inner = (slice(4, 12), slice(4, 12))
    for by in range(2):
        for bx in range(3):
            cell = out[by * 16 + 4: by * 16 + 12, bx * 16 + 4: bx * 16 + 12]
            want = img[by * 16 + 4, bx * 16 + 4]
            assert np.abs(cell.astype(int) - want.astype(int)).max() <= 12


def test_restart_markers_roundtrip_and_presence():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (16, 40)).astype(np.uint8)   # 10 MCUs
    blob = encode_jpeg(img, quality=100, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8)), \
        "restart markers must actually be emitted"
    out = decode_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_decoder_rejects_unsupported_sof_and_garbage():
    # SOF3 (lossless) and SOF9 (arithmetic) are now REAL paths; the
    # differential processes (e.g. SOF5) remain unsupported
    img = np.full((8, 8), 9, np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC5                     # SOF5: differential seq.
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_multimodal_real_jpeg_pipeline(spark):
    """image_features over REAL JPEG fixtures: widths/heights/embedding
    match the closed-form expectation (the contract-entry invariant)."""
    from lucene_solr_1_spark.datapipe.multimodal import (image_features,
                                                         make_jpeg_media)
    media = make_jpeg_media(spark, n=24)
    out = image_features(media, dim=8).orderBy("media_id").toPandas()
    assert len(out) == 24
    for _, r in out.iterrows():
        i = int(r["media_id"])
        c = (7 + 13 * i) % 256
        assert r["width"] == 8 * (1 + i % 6)
        assert r["height"] == 8 * (1 + i % 4)
        emb = np.asarray(r["embedding"], np.float32)
        assert np.allclose(emb, np.float32(c) / np.float32(255.0)), \
            (i, c, emb)


def test_multimodal_resize_jpeg(spark):
    """resize_images takes the real path for JPEG content (decode ->
    nearest resize -> BMP re-encode)."""
    from lucene_solr_1_spark.datapipe.mediacodec import decode_bmp
    from lucene_solr_1_spark.datapipe.multimodal import (make_jpeg_media,
                                                         resize_images)
    media = make_jpeg_media(spark, n=6)
    out = resize_images(media, max_dim=16).orderBy("media_id").toPandas()
    for _, r in out.iterrows():
        img = decode_bmp(bytes(r["content"]))
        assert img.shape[0] == r["height"] and img.shape[1] == r["width"]
        c = (7 + 13 * int(r["media_id"])) % 256
        assert (img == c).all()
