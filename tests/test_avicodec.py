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
