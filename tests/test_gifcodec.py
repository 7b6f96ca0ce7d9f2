"""GIF codec (datapipe/gifcodec.py): LZW round-trip properties,
hand-assembled streams for interlace / transparency / disposal
(encoder-independent decode checks), and the multimodal pipeline
integration (first-frame image decode + animated-GIF frame
sampling)."""

import struct

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.gifcodec import (_lzw_decode,
                                                   _lzw_encode,
                                                   _sub_blocks,
                                                   decode_gif,
                                                   decode_gif_frames,
                                                   encode_gif, is_gif)


def test_lzw_roundtrip_property():
    rng = np.random.default_rng(9)
    for n, lo in [(1, 2), (10, 4), (1000, 4), (20000, 8), (5000, 2)]:
        idx = rng.integers(0, 1 << lo, n).astype(np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(idx, lo), lo, n),
                              idx), (n, lo)


def test_lzw_table_reset_at_4096():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 255, 64 * 256).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, idx.size),
                          idx)


def test_single_frame_roundtrip():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 5, (23, 31, 1)) * 50).astype(np.uint8) \
        .repeat(3, axis=2)
    img[..., 2] //= 3
    blob = encode_gif(img)
    assert is_gif(blob)
    assert np.array_equal(decode_gif(blob), img)


def test_animation_roundtrip():
    rng = np.random.default_rng(1)
    frames = [((rng.integers(0, 4, (16, 16, 1)) * 60 + k) % 256)
              .astype(np.uint8).repeat(3, axis=2) for k in range(5)]
    got = decode_gif_frames(encode_gif(frames))
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def _hand_gif(w, h, blocks, gct=((0, 0, 0), (255, 255, 255),
                                 (255, 0, 0), (0, 0, 255))):
    """Assemble a GIF by hand: logical screen + 4-entry global color
    table + caller-provided raw blocks."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x01, 0, 0])        # GCT present, 4 entries
    for c in gct:
        out += bytes(c)
    for b in blocks:
        out += b
    out += b"\x3b"
    return bytes(out)


def _image_block(left, top, w, h, indices, interlaced=False,
                 min_code=2):
    hdr = b"\x2c" + struct.pack("<HHHH", left, top, w, h) \
        + bytes([0x40 if interlaced else 0x00])
    data = _sub_blocks(_lzw_encode(np.asarray(indices, np.uint8),
                                   min_code))
    return hdr + bytes([min_code]) + data


def test_hand_assembled_interlaced():
    """8 rows of constant color i stored in GIF interlace order
    (passes 0,8 / 4 / 2,6 / 1,3,5,7) must come back in raster
    order."""
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    rows = []
    for r in pass_order:
        rows += [r % 4] * 4                  # width 4, palette idx r%4
    blob = _hand_gif(4, 8, [_image_block(0, 0, 4, 8, rows,
                                         interlaced=True)])
    img = decode_gif(blob)
    gct = np.array([(0, 0, 0), (255, 255, 255), (255, 0, 0),
                    (0, 0, 255)], np.uint8)
    for r in range(8):
        assert (img[r] == gct[r % 4]).all(), r


def test_hand_assembled_transparency_and_disposal():
    """Frame 1 paints the full 2x2 canvas; frame 2 (after a GCE with
    transparent index 0) overdraws only its opaque pixels; disposal 2
    on frame 2's GCE is irrelevant for composition of frame 2
    itself."""
    f1 = _image_block(0, 0, 2, 2, [2, 2, 2, 2])        # all red
    gce = b"\x21\xf9" + _sub_blocks(bytes([0x01 | (1 << 2), 0, 0, 0]))
    f2 = _image_block(0, 0, 2, 2, [0, 3, 0, 0])        # blue at (0,1)
    frames = decode_gif_frames(_hand_gif(2, 2, [f1, gce, f2]))
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    assert frames[1][0, 1].tolist() == [0, 0, 255]     # opaque pixel
    assert frames[1][0, 0].tolist() == [255, 0, 0]     # transparent kept
    assert frames[1][1, 0].tolist() == [255, 0, 0]


def test_rejects_non_gif_and_bad_palette_index():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG stuff")
    blob = _hand_gif(2, 1, [_image_block(0, 0, 2, 1, [0, 5],
                                         min_code=3)])
    with pytest.raises(ValueError, match="palette"):
        decode_gif(blob)


def test_multimodal_gif_image_and_frames(spark):
    """GIF content flows the real paths: first-frame decode through
    image_features, animated frame sampling through sample_frames
    (frames re-emitted as PNG the image ops can decode)."""
    from lucene_solr_1_spark.datapipe.mediacodec import decode_png
    from lucene_solr_1_spark.datapipe.multimodal import (MEDIA_SCHEMA,
                                                         image_features,
                                                         sample_frames)
    rows = []
    for i in range(6):
        c = (40 * i) % 255
        img = np.full((8, 16, 3), c, np.uint8)
        rows.append((i, "image", "image/gif",
                     bytearray(encode_gif(img)), {"c": str(c)}))
    for i in range(6, 10):
        nf = 1 + i % 3
        fr = [np.full((8, 8, 3), (30 * i + 11 * k) % 256, np.uint8)
              for k in range(nf)]
        rows.append((i, "video", "image/gif",
                     bytearray(encode_gif(fr)), {"nf": str(nf)}))
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r.media_id: r for r in image_features(media, dim=4).collect()}
    for i in range(6):
        assert (feats[i].width, feats[i].height) == (16, 8)
        assert feats[i].embedding[0] == pytest.approx(
            ((40 * i) % 255) / 255.0, abs=1e-6)
    frames = sample_frames(media, every_n=2, max_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for i in range(6, 10):
        nf = 1 + i % 3
        want = [k for k in (0, 2) if k < nf]
        got = sorted(by_media[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want
        for r in got:
            img = decode_png(bytes(r.frame))
            assert (img == (30 * i + 11 * r.frame_idx) % 256).all()
