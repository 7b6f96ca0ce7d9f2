"""MJPG-AVI container codec (datapipe/avicodec.py): hand-assembled
container parse checks, encode/decode round-trip properties, the
honest non-MJPG boundary, and the real sample_frames pipeline path
(frames decodable by the baseline-JPEG codec end-to-end)."""

import struct

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.avicodec import (decode_avi_mjpeg,
                                                   encode_avi_mjpeg, is_avi)
from lucene_solr_1_spark.datapipe.jpegcodec import decode_jpeg, encode_jpeg


def test_roundtrip_flat_frames_exact():
    frames = [np.full((16, 24), (11 + 29 * k) % 256, np.uint8)
              for k in range(5)]
    avi = encode_avi_mjpeg(frames, fps=12, quality=100)
    assert is_avi(avi)
    d = decode_avi_mjpeg(avi)
    assert (d["width"], d["height"]) == (24, 16)
    assert d["fps"] == pytest.approx(12.0, abs=0.01)
    assert d["n_frames"] == 5 and len(d["frames"]) == 5
    for k, f in enumerate(d["frames"]):
        img = decode_jpeg(f)
        assert img.shape == (16, 24)
        assert (img == (11 + 29 * k) % 256).all()


def test_frame_blobs_verbatim():
    """The container must carry each frame's JPEG bytes untouched."""
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
              for _ in range(3)]
    blobs = [encode_jpeg(f, quality=90) for f in frames]
    d = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=90))
    assert d["frames"] == blobs


def test_even_padding_odd_sized_frames():
    """Odd-length JPEG payloads must be even-padded per RIFF without
    corrupting the following chunk."""
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (8, 16)).astype(np.uint8)
              for _ in range(6)]
    d = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=85))
    assert len(d["frames"]) == 6
    assert any(len(b) % 2 == 1 for b in d["frames"])  # padding exercised
    for f in d["frames"]:
        assert decode_jpeg(f).shape == (8, 16)


def test_non_mjpg_handler_raises():
    avi = bytearray(encode_avi_mjpeg([np.zeros((8, 8), np.uint8)]))
    i = avi.find(b"vids" + b"MJPG")
    assert i > 0
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_mjpeg(bytes(avi))


def test_rejects_non_avi():
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    assert not is_avi(b"\xff\xd8\xff\xe0")


def test_header_fields_match_spec_layout():
    """Cross-check avih by raw struct offsets (spec-derived, not via
    the decoder): usec/frame at +0, total frames at +16, w/h at
    +32/+36 of the avih payload."""
    frames = [np.zeros((32, 48), np.uint8)] * 7
    avi = encode_avi_mjpeg(frames, fps=25)
    i = avi.find(b"avih")
    usec, = struct.unpack_from("<I", avi, i + 8)
    total, = struct.unpack_from("<I", avi, i + 8 + 16)
    w, h = struct.unpack_from("<II", avi, i + 8 + 32)
    assert usec == 1_000_000 // 25 and total == 7 and (w, h) == (48, 32)


def test_sample_frames_real_path(spark):
    """sample_frames takes the REAL MJPG path: every_n-th frame, capped
    at max_frames, frame bytes decodable by the JPEG codec."""
    from lucene_solr_1_spark.datapipe.multimodal import (
        make_mjpeg_video_media, sample_frames)
    media = make_mjpeg_video_media(spark, n=12)
    rows = sample_frames(media, every_n=2, max_frames=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for i in range(12):
        nf = 1 + i % 4
        want_idx = [k for k in (0, 2) if k < nf]
        got = sorted(by_media[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        for r in got:
            img = decode_jpeg(bytes(r.frame))
            c = (11 + 7 * i + 29 * r.frame_idx) % 256
            assert (img == c).all()
            assert img.shape == (8 * (1 + i % 2), 8 * (1 + i % 3))


def test_non_avi_video_still_raises_without_fake(spark):
    from lucene_solr_1_spark.datapipe.multimodal import (make_fake_media,
                                                         sample_frames)
    media = make_fake_media(spark, n=6)
    with pytest.raises(Exception, match="pyav"):
        sample_frames(media, fake=False).collect()


def test_dib_avi_roundtrip_exact():
    """Uncompressed BI_RGB AVI: frames decode pixel-exact (no entropy
    coding involved — this pins the container + BMP re-emission)."""
    import numpy as np

    from lucene_solr_1_spark.datapipe.avicodec import (decode_avi,
                                                       encode_avi_dib)
    from lucene_solr_1_spark.datapipe.mediacodec import decode_bmp
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (12, 17, 3), np.uint8)
              for _ in range(5)]
    meta = decode_avi(encode_avi_dib(frames, fps=8))
    assert meta["codec"] == "DIB"
    assert (meta["width"], meta["height"]) == (17, 12)
    assert meta["fps"] == 8.0
    for got, want in zip(meta["frames"], frames):
        assert np.array_equal(decode_bmp(got), want)


def test_sample_frames_dib_path(spark):
    """sample_frames flows DIB AVIs through the REAL container parse;
    image_features then decodes the emitted BMPs exactly."""
    import numpy as np

    from lucene_solr_1_spark.datapipe.avicodec import encode_avi_dib
    from lucene_solr_1_spark.datapipe.multimodal import (
        MEDIA_SCHEMA, image_features, sample_frames)
    frames = [np.full((8, 8), 40 + 7 * k, np.uint8) for k in range(4)]
    media = spark.createDataFrame(
        [(0, "video", "video/x-msvideo",
          bytearray(encode_avi_dib(frames, fps=10)), {})],
        schema=MEDIA_SCHEMA)
    sampled = sample_frames(media, every_n=2, max_frames=4)
    rows = sorted((r["frame_idx"], bytes(r["frame"]))
                  for r in sampled.collect())
    assert [i for i, _ in rows] == [0, 2]
    imgs = spark.createDataFrame(
        [(i, "image", b) for i, (_, b) in enumerate(rows)],
        "media_id long, kind string, content binary")
    feats = {r["media_id"]: r for r in
             image_features(imgs, dim=4).collect()}
    assert feats[0]["embedding"][0] == pytest.approx(40 / 255, abs=1e-6)
    assert feats[1]["embedding"][0] == pytest.approx((40 + 14) / 255,
                                                     abs=1e-6)
