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


def encode_avi_dib(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode uint8 frames ((h,w) gray or (h,w,3) RGB, same size) as
    an UNCOMPRESSED (BI_RGB 'DIB ') AVI: each '00db' chunk is the raw
    bottom-up BGR pixel array with 4-byte-aligned rows — the second
    stdlib-decodable video path next to MJPG."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    blobs = []
    for f in frames:
        if f.ndim == 2:
            f = np.repeat(f[:, :, None], 3, axis=2)
        body = np.zeros((h, row_bytes), np.uint8)
        body[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # BGR
        blobs.append(body.tobytes())
    frame_size = row_bytes * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, len(blobs),
        0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIIhhhh",
        0, 0, 0, 0, 1, fps, 0, len(blobs),
        frame_size, 0xFFFFFFFF, 0, 0, 0, int(w), int(h)))
    strf = struct.pack("<IiiHHIIiiII",
                       40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) +
                 _list(b"strl", _chunk(b"strh", strh) +
                       _chunk(b"strf", strf)))
    movi_payload = b"movi"
    index = []
    for b in blobs:
        index.append((len(movi_payload) - 4, len(b)))
        movi_payload += _chunk(b"00db", b)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(
        b"00db" + struct.pack("<III", 0x10, off, size)
        for off, size in index))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in
    buf[start:end]; LIST/RIFF payloads begin with their list type."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi(content: bytes) -> dict:
    """Parse an AVI; return {'width','height','fps','n_frames',
    'codec': 'MJPG'|'DIB', 'frames': [...]}: MJPG frames are the
    embedded baseline-JPEG bytes verbatim; uncompressed BI_RGB/'DIB '
    frames are re-emitted as standalone BMP files (BITMAPFILEHEADER +
    the stream's BITMAPINFOHEADER + the chunk's pixel array) so
    downstream image ops decode them. Raises NotImplementedError for
    compressed codecs beyond these (the honest codec boundary)."""
    if not is_avi(content):
        raise ValueError("not a RIFF/AVI file")
    riff_size = struct.unpack_from("<I", content, 4)[0]
    end = min(len(content), 8 + riff_size)
    meta = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0}
    frames: list[bytes] = []
    handler = None
    strf = None

    def scan_list(start: int, stop: int):
        nonlocal handler, strf
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
            elif fourcc == b"strf" and strf is None:
                strf = content[p:p + size]
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(content[p:p + size])

    scan_list(12, end)
    compression = (struct.unpack_from("<I", strf, 16)[0]
                   if strf and len(strf) >= 20 else None)
    if handler in (b"MJPG", b"mjpg"):
        for f in frames:
            if f[:2] != b"\xff\xd8":
                raise NotImplementedError("MJPG frame is not a JPEG stream")
        meta["codec"] = "MJPG"
    elif handler in (b"DIB ", b"\x00" * 4, b"RGB ") or compression == 0:
        # wrap each raw pixel array as a BMP file for the image ops
        off = 14 + len(strf)
        bmps = []
        for f in frames:
            hdr = (b"BM" + struct.pack("<IHHI", off + len(f), 0, 0, off)
                   + strf)
            bmps.append(hdr + f)
        frames = bmps
        meta["codec"] = "DIB"
    else:
        raise NotImplementedError(
            f"AVI video handler {handler!r} not supported; real paths "
            "are MJPG (per-frame baseline JPEG) and uncompressed DIB")
    meta["frames"] = frames
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta


def decode_avi_mjpeg(content: bytes) -> dict:
    """Back-compat wrapper: decode_avi restricted to MJPG streams."""
    meta = decode_avi(content)
    if meta["codec"] != "MJPG":
        raise NotImplementedError("not an MJPG AVI")
    return meta
