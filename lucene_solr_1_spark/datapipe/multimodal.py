"""Multimodal columns: image/audio/video as opaque binary + typed
metadata. The Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is real and tested.

Decode status (honest accounting):
  * REAL, pure NumPy: uncompressed BMP (24/32-bit DIB); PNG with
    Adam7 interlace, palettes + tRNS, bit depths 1-16 (mediacodec.py);
    JPEG — baseline (huffman + dequant + IDCT + YCbCr with
    4:4:4/4:2:0 and restart markers) AND huffman progressive
    (spectral selection + successive approximation), jpegcodec.py —
    decode, grid features, nearest resize + re-encode; GIF87a/89a
    (gifcodec.py: LZW, palettes, transparency, disposal compositing);
    RIFF/WAVE PCM + float32 for audio — decode, duration/rate,
    mel-spectral MFCC-shaped features; video via MJPG AVI (stdlib
    RIFF container parse, avicodec.py) and animated GIF — frame
    sampling emits per-frame JPEG/PNG bytes the image path decodes;
    compressed audio via G.711 u-law/A-law (byte-exact vs the
    canonical g711.c for every int16), IMA/MS ADPCM
    (block-vectorized, audiocodec.py) and FLAC (frame/subframe/rice
    decode + fixture encoder, flaccodec.py); video adds uncompressed
    BI_RGB 'DIB ' AVI next to MJPG (frames re-emitted as BMP).
    JPEG covers ALL FOUR entropy/process variants: baseline (SOF0),
    progressive (SOF2), lossless (SOF3, all 7 predictors, 2-16 bit)
    and arithmetic-coded sequential (SOF9, QM coder — jpegarith.py).
  * STUBBED (container lacks pyav/libvips): perceptual audio codecs
    (MP3/AAC/Vorbis), video
    codecs beyond MJPG AVI and
    animated GIF. These raise NotImplementedError unless `fake=True`,
    in which case a deterministic fake (seeded by the content digest)
    exercises the full pipeline end-to-end.
Dispatch is by magic bytes: BMP/PNG/GIF/JPEG/WAV/AVI content takes
the real path even when fake=True (fake only rescues undecodable
formats).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("content", T.BinaryType()),     # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _fake_floats(content: bytes, n: int) -> np.ndarray:
    seed = int(hashlib.md5(content).hexdigest()[:8], 16)
    return np.random.default_rng(seed).random(n).astype(np.float32)


def _decode_rgb(content: bytes) -> np.ndarray | None:
    """REAL decode for BMP / PNG / GIF / JPEG (baseline, progressive,
    lossless, arithmetic) -> (h, w, 3) uint8 RGB (gray planes
    expanded); None for formats still stubbed."""
    if content[:2] == b"BM":
        from .mediacodec import decode_bmp
        return decode_bmp(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        from .mediacodec import decode_png
        img = decode_png(content)
    elif content[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg
        img = decode_jpeg(content)
    elif content[:6] in (b"GIF87a", b"GIF89a"):
        from .gifcodec import decode_gif
        img = decode_gif(content)            # first composited frame
    else:
        return None
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


def decode_image(content: bytes, fake: bool = False):
    """(width, height): REAL for BMP, PNG (all depths/interlace), GIF,
    and every JPEG process (baseline/progressive/lossless/arithmetic);
    fake/stub otherwise."""
    img = _decode_rgb(content)
    if img is not None:
        return (img.shape[1], img.shape[0])
    if not fake:
        raise NotImplementedError("undecodable image format (real paths: "
                                  "BMP/PNG/baseline JPEG); run with "
                                  "fake=True for pipeline tests")
    h = int(hashlib.md5(content).hexdigest()[:4], 16)
    return (64 + h % 512, 64 + (h >> 3) % 512)     # (width, height)


def image_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode + feature-extract images, Arrow-batched (mapInPandas).
    Partition-safe: stateless per batch, repartitionable by media_id."""

    def extract(batches):
        from .mediacodec import bmp_grid_features
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content)
                w, h = decode_image(content, fake=fake)
                img = _decode_rgb(content)
                if img is not None:              # real BMP/PNG/JPEG path
                    emb = bmp_grid_features(img, dim).tolist()
                else:
                    emb = _fake_floats(content, dim).tolist()
                rows.append((int(r.media_id), w, h, emb))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "embedding"])

    return (df.filter(F.col("kind") == "image")
            .select("media_id", "content")
            .mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA))


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4,
                  fake: bool = False) -> DataFrame:
    """Video frame sampling: 1-to-many mapInPandas (each video row fans
    out to <= max_frames frame rows). REAL path: MJPG AVI (stdlib RIFF
    parse, avicodec.py) — every every_n-th frame's JPEG bytes are
    emitted verbatim, so downstream image ops (image_features, resize)
    decode them through the pure-NumPy jpegcodec path. Other codecs
    need ffmpeg/pyav and stay stubbed; the fake emits digest-derived
    frame bytes so the plumbing is testable regardless."""

    def sample(batches):
        from .avicodec import decode_avi, is_avi
        from .gifcodec import decode_gif_frames, is_gif
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content)
                if is_avi(content):              # real MJPG / DIB path
                    vid = decode_avi(content)
                    picks = vid["frames"][::max(every_n, 1)][:max_frames]
                    for i, fb in enumerate(picks):
                        rows.append((int(r.media_id),
                                     i * max(every_n, 1), fb))
                    continue
                if is_gif(content):              # animated GIF path:
                    from .mediacodec import encode_png
                    fr = decode_gif_frames(content)
                    picks = fr[::max(every_n, 1)][:max_frames]
                    for i, fb in enumerate(picks):
                        # composited frames re-emit as lossless PNG so
                        # the image ops decode them downstream
                        rows.append((int(r.media_id),
                                     i * max(every_n, 1), encode_png(fb)))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode beyond MJPG AVI / animated GIF "
                        "requires pyav")
                n = min(max_frames, 1 + len(content) // max(every_n, 1) % max_frames)
                for i in range(n):
                    fb = hashlib.md5(content + i.to_bytes(4, "little")).digest()
                    rows.append((int(r.media_id), i, fb))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (df.filter(F.col("kind") == "video")
            .select("media_id", "content")
            .mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA))


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("duration_sec", T.FloatType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("mfcc", T.ArrayType(T.FloatType())),
])

RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("content", T.BinaryType()),
])


def audio_features(df: DataFrame, n_mfcc: int = 13,
                   fake: bool = False) -> DataFrame:
    """Decode + feature-extract audio (duration, sample rate, MFCC-shaped
    vector), Arrow-batched. REAL for any RIFF/WAVE payload: PCM and
    IEEE-float plus G.711 u-law/A-law and IMA/MS ADPCM
    (audiocodec.py). Perceptual codecs (MP3/AAC/Vorbis) need
    soundfile/librosa and stay stubbed; the fake derives everything
    from the content digest."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content)
                if content[:4] in (b"RIFF", b"fLaC"):
                    from .mediacodec import decode_wav, spectral_features
                    if content[:4] == b"fLaC":
                        from .flaccodec import decode_flac
                        pcm, rate = decode_flac(content)
                        samples = pcm.astype(np.float32) / 32768.0
                    else:
                        samples, rate = decode_wav(content)
                    rows.append((int(r.media_id),
                                 float(len(samples) / rate), int(rate),
                                 spectral_features(samples, rate,
                                                   n_mfcc).tolist()))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "non-WAV audio decode requires soundfile/librosa; "
                        "run with fake=True for pipeline tests")
                h = int(hashlib.md5(content).hexdigest()[:6], 16)
                rows.append((int(r.media_id),
                             float(0.5 + h % 300),          # duration
                             [8000, 16000, 44100][h % 3],   # sample rate
                             _fake_floats(content, n_mfcc).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "duration_sec",
                                              "sample_rate", "mfcc"])

    return (df.filter(F.col("kind") == "audio")
            .select("media_id", "content")
            .mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA))


def resize_images(df: DataFrame, max_dim: int = 256,
                  fake: bool = False) -> DataFrame:
    """Resize to fit max_dim (aspect preserved), emitting new binary
    content — the thumbnailing stage of a media ingest pipeline. Real
    impl = PIL thumbnail; the fake scales the decoded fake dims and
    emits digest-derived bytes of proportional length."""

    def resize(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content)
                w, h = decode_image(content, fake=fake)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                img = _decode_rgb(content)
                if img is not None:
                    # real path: NumPy nearest resize + BMP re-encode
                    from .mediacodec import encode_bmp, resize_nearest
                    blob = encode_bmp(resize_nearest(img, nw, nh))
                else:
                    blob = hashlib.md5(content + b"resize").digest()
                    blob = (blob * (1 + (nw * nh) // len(blob)))[
                        : max(16, (nw * nh) // 64)]
                rows.append((int(r.media_id), nw, nh, blob))
            yield pd.DataFrame(rows, columns=["media_id", "width",
                                              "height", "content"])

    return (df.filter(F.col("kind") == "image")
            .select("media_id", "content")
            .mapInPandas(resize, schema=RESIZE_SCHEMA))


def make_jpeg_media(spark, n: int = 96) -> DataFrame:
    """Deterministic REAL baseline-JPEG fixtures with analytically known
    decode: flat gray value c=(7+13i)%256 at quality 100 (all-ones
    quantization tables) decodes bit-exactly back to c through the full
    huffman + IDCT path, so width/height/grid-features are a closed-form
    function of media_id that an independent SQL oracle can state.
    Every third image adds a restart interval (RSTn coverage)."""
    from .jpegcodec import encode_jpeg
    rows = []
    for i in range(n):
        c = (7 + 13 * i) % 256
        w, h = 8 * (1 + i % 6), 8 * (1 + i % 4)
        img = np.full((h, w), c, np.uint8)
        content = encode_jpeg(img, quality=100,
                              restart_interval=(2 if i % 3 == 0 else 0))
        rows.append((i, "image", "image/jpeg", bytearray(content),
                     {"flat": str(c), "w": str(w), "h": str(h)}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def make_mjpeg_video_media(spark, n: int = 48, fps: int = 10) -> DataFrame:
    """Deterministic REAL MJPG-AVI fixtures with analytically known
    frames: video i has nf=1+(i%4) flat-gray frames of size
    w=8*(1+i%3) x h=8*(1+i%2); frame k is gray c=(11+7i+29k)%256 at
    quality 100, which decodes bit-exactly (all-ones quant tables) —
    so frame sampling + decode is a closed-form function of
    (media_id, frame_idx) an independent SQL oracle can state."""
    from .avicodec import encode_avi_mjpeg
    rows = []
    for i in range(n):
        nf = 1 + i % 4
        w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)
        frames = [np.full((h, w), (11 + 7 * i + 29 * k) % 256, np.uint8)
                  for k in range(nf)]
        content = encode_avi_mjpeg(frames, fps=fps, quality=100)
        rows.append((i, "video", "video/x-msvideo", bytearray(content),
                     {"nf": str(nf), "w": str(w), "h": str(h)}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def make_lossless_arith_media(spark, n: int = 48) -> DataFrame:
    """Deterministic fixtures for the two remaining JPEG processes:
    even rows carry a LOSSLESS (SOF3) gradient img[y][x] =
    (7 i + 13 y + 29 x) % 256 with predictor 1 + (i//2) % 7 — decode
    is EXACT by definition of the process, so pixel sums are a pure
    closed form; odd rows carry an ARITHMETIC-coded (SOF9) flat gray
    c = (7 + 13 i) % 256 at quality 100 (all-ones quantization), which
    decodes bit-exactly to c through the QM coder."""
    from .jpegarith import encode_jpeg_arith
    from .jpegcodec import encode_jpeg_lossless
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 3, 8 + (i % 3) * 5
            y, x = np.mgrid[0:h, 0:w]
            img = ((7 * i + 13 * y + 29 * x) % 256).astype(np.uint8)
            content = encode_jpeg_lossless(img,
                                           predictor=1 + (i // 2) % 7)
        else:
            c = (7 + 13 * i) % 256
            w, h = 8 * (1 + i % 6), 8 * (1 + i % 4)
            img = np.full((h, w), c, np.uint8)
            content = encode_jpeg_arith(img, quality=100,
                                        restart_interval=(2 if i % 3 == 0
                                                          else 0))
        rows.append((i, "image", "image/jpeg", bytearray(content),
                     {"w": str(w), "h": str(h)}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def make_audio_media(spark, n: int = 96) -> DataFrame:
    """Deterministic REAL compressed-audio fixtures with analytically
    known decode (audiocodec.py): row i carries, by i % 4,
      0: u-law WAV whose payload bytes are (7 + 31 i + 7 k) % 256 —
         each byte expands by the closed-form G.711 u-law rule;
      1: A-law WAV, same byte pattern, A-law expansion rule;
      2: IMA ADPCM silence (505*(1+i%3) samples) — decodes to exact
         zeros through the real block walk;
      3: MS ADPCM silence (500*(1+i%3) samples), likewise exact.
    A SQL oracle can state n_samples / sample_rate / sum(pcm16) for
    every row, so the decoder is hash-checkable end-to-end."""
    import struct as _struct
    rows = []
    for i in range(n):
        kind = i % 4
        if kind in (0, 1):
            ns = 64 + i % 32
            payload = bytes((7 + 31 * i + 7 * k) % 256 for k in range(ns))
            tag = 7 if kind == 0 else 6
            fmt = _struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
            content = (b"RIFF" + _struct.pack("<I", 36 + len(payload))
                       + b"WAVE" + b"fmt "
                       + _struct.pack("<I", len(fmt)) + fmt
                       + b"data" + _struct.pack("<I", len(payload))
                       + payload)
            mime = "audio/basic"
        else:
            from .audiocodec import encode_wav_compressed
            spb = 505 if kind == 2 else 500
            ns = spb * (1 + i % 3)
            codec = "ima_adpcm" if kind == 2 else "ms_adpcm"
            content = encode_wav_compressed(
                np.zeros(ns, np.float32), 8000, codec)
            mime = "audio/adpcm"
        rows.append((i, "audio", mime, bytearray(content),
                     {"codec": str(kind), "n": str(ns)}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def make_flac_media(spark, n: int = 48) -> DataFrame:
    """Deterministic FLAC fixtures (flaccodec.py): row i carries the
    lossless encoding of x_k = ((13 i + 7 k) % 2001) - 1000 for
    k < 300 + (i % 50) at 8 kHz/16-bit — FLAC is lossless, so decoded
    sample sums are a pure closed form a SQL oracle can state."""
    from .flaccodec import encode_flac
    rows = []
    for i in range(n):
        ns = 300 + i % 50
        x = ((13 * i + 7 * np.arange(ns, dtype=np.int64)) % 2001) - 1000
        content = encode_flac(x, rate=8000, bps=16)
        rows.append((i, "audio", "audio/flac", bytearray(content),
                     {"n": str(ns)}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture (binary payloads, typed metadata)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = hashlib.md5(f"media{i}".encode()).digest() * (1 + i % 7)
        rows.append((i, kind, f"{kind}/fake", bytearray(content),
                     {"src": f"synthetic://{i}", "bytes": str(len(content))}))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
