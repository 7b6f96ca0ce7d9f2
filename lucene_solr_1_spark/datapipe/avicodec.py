"""Motion-JPEG AVI container codec in pure stdlib + NumPy.

De-stubs the "all video" gap in multimodal.py for the one codec this
container can honestly decode: an AVI (RIFF) whose video stream is
MJPG — each frame is an independent baseline JPEG, decodable by the
from-scratch NumPy codec in jpegcodec.py. Parsing follows the public
RIFF/AVI layout (Microsoft "AVI RIFF File Reference"):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader (usec/frame, total frames, width, height)
        LIST 'strl'
          'strh' AVIStreamHeader ('vids'/'MJPG', scale, rate, length)
          'strf' BITMAPINFOHEADER (biCompression = 'MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes>   (one chunk per frame, even-padded)
      'idx1' (16-byte entries: ckid, flags, offset, size)

The encoder exists to make deterministic fixtures (and round-trip
property tests); the decoder is the real ingest path used by
multimodal.sample_frames. Compressed codecs other than MJPG still
raise NotImplementedError — the honest boundary, as with progressive
JPEG. Reference analog: Lucene has no media path; this belongs to the
training-data pipeline surface (frame sampling for a 100-TB crawl).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """Encode uint8 frames ((h,w) gray or (h,w,3) RGB, all same size)
    as an MJPG AVI. Deterministic for deterministic inputs."""
    from .jpegcodec import encode_jpeg
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    max_blob = max(len(b) for b in blobs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_blob * fps,          # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(blobs),              # dwTotalFrames
        0, 1,                    # dwInitialFrames, dwStreams
        max_blob,                # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)        # dwWidth, dwHeight, dwReserved[4]
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIIhhhh",
        0, 0, 0, 0,              # flags, priority, language, initialFrames
        1, fps,                  # dwScale, dwRate (fps = rate/scale)
        0, len(blobs),           # dwStart, dwLength (frames)
        max_blob, 0xFFFFFFFF, 0, # bufSize, quality(-1), sampleSize
        0, 0, int(w), int(h)))   # rcFrame
    strf = struct.pack("<IiiHH4sIiiII",
                       40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) +
                 _list(b"strl", _chunk(b"strh", strh) +
                       _chunk(b"strf", strf)))

    movi_payload = b"movi"
    index = []
    for b in blobs:
        # idx1 offsets are relative to the start of the 'movi' fourcc
        index.append((len(movi_payload) - 4, len(b)))
        movi_payload += _chunk(b"00dc", b)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in index))

    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def is_avi(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"AVI "


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in
    buf[start:end]; LIST/RIFF payloads begin with their list type."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi_mjpeg(content: bytes) -> dict:
    """Parse an AVI; return {'width','height','fps','n_frames',
    'frames': [jpeg bytes, ...]}. Raises NotImplementedError for
    non-MJPG video streams (the honest codec boundary)."""
    if not is_avi(content):
        raise ValueError("not a RIFF/AVI file")
    riff_size = struct.unpack_from("<I", content, 4)[0]
    end = min(len(content), 8 + riff_size)
    meta = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0}
    frames: list[bytes] = []
    handler = None

    def scan_list(start: int, stop: int):
        nonlocal handler
        for fourcc, p, size in _walk(content, start, stop):
            if fourcc == b"LIST":
                scan_list(p + 4, p + size)
            elif fourcc == b"avih":
                (usec, _, _, _, total, _, _, _, w, h) = struct.unpack_from(
                    "<10I", content, p)
                meta.update(width=w, height=h, n_frames=total,
                            fps=(1_000_000 / usec if usec else 0.0))
            elif fourcc == b"strh":
                fcc_type = content[p:p + 4]
                if fcc_type == b"vids":
                    handler = content[p + 4:p + 8]
                    scale, rate = struct.unpack_from("<II", content, p + 20)
                    if scale:
                        meta["fps"] = rate / scale
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(content[p:p + size])

    scan_list(12, end)
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} not supported; real path is "
            "MJPG (per-frame baseline JPEG)")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError("MJPG frame is not a JPEG stream")
    meta["frames"] = frames
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta
