"""Pure-NumPy media codecs for the multimodal pipeline's REAL branch.

The container has no PIL/libvips/pyav/soundfile, so compressed formats
stay stubbed (multimodal.py); these codecs cover the uncompressed
interchange formats whose layouts are fully public:

  * BMP — 'BM' + BITMAPINFOHEADER, 24/32-bit BI_RGB, bottom-up or
    top-down rows, 4-byte row padding (the Windows DIB spec);
  * PNG — 8-bit gray/GA/RGB/RGBA, non-interlaced: stdlib zlib inflate
    + NumPy unfiltering of the five row filters (RFC 2083 §6) — a
    COMPRESSED format handled with zero third-party deps;
  * WAV — RIFF/WAVE chunk walk, PCM 8/16/32-bit and IEEE float32.

Decoders return NumPy arrays; encoders emit spec-compliant bytes so
resize/round-trip paths are testable end-to-end with zero third-party
dependencies. Everything is vectorized (frombuffer + reshape/strides).
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------- BMP

def decode_bmp(content: bytes) -> np.ndarray:
    """-> uint8 array (height, width, 3) RGB. Supports 24/32-bit
    uncompressed DIBs (BI_RGB), bottom-up (positive height) and
    top-down (negative)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (got "
                         f"bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * (bpp // 8) + 3) & ~3
    px = np.frombuffer(content, np.uint8, count=row_bytes * height,
                       offset=data_off)
    rows = px.reshape(height, row_bytes)[:, : width * (bpp // 8)]
    img = rows.reshape(height, width, bpp // 8)
    if not top_down:
        img = img[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(img[..., 2::-1])


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (height, width, 3) RGB -> 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("expected RGB (h, w, 3)")
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR
    data = body.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbour resize via index maps (pure NumPy)."""
    h, w = img.shape[:2]
    ys = (np.arange(new_h) * (h / new_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(new_w) * (w / new_w)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


def bmp_grid_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic real feature vector: mean grayscale over a grid of
    `dim` cells (row-major), normalized to [0, 1] float32 — the
    classic tiny-image descriptor."""
    gray = img.astype(np.float32).mean(axis=2)
    g = int(np.ceil(np.sqrt(dim)))
    cells = resize_nearest(gray[..., None], g, g)[..., 0]
    return (cells.reshape(-1)[:dim] / 255.0).astype(np.float32)


# ----------------------------------------------------------------- WAV

def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """-> (float32 samples shaped (n, channels) in [-1, 1], rate).
    RIFF chunk walk; PCM u8 / s16 / s32 and IEEE float32."""
    if len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 (n, channels) in [-1, 1] -> 16-bit PCM WAV bytes."""
    samples = np.atleast_2d(np.asarray(samples, np.float32))
    if samples.shape[0] < samples.shape[1]:
        samples = samples.T
    n, ch = samples.shape
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def spectral_features(samples: np.ndarray, rate: int,
                      n_bands: int = 13) -> np.ndarray:
    """MFCC-shaped descriptor, real DSP in pure NumPy: mono mix ->
    Hann-windowed frames -> rFFT power -> mel filterbank -> log ->
    DCT-II -> first n_bands coefficients."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    frame = 512
    if len(mono) < frame:
        mono = np.pad(mono, (0, frame - len(mono)))
    hop = frame // 2
    n_frames = max(1, (len(mono) - frame) // hop + 1)
    idx = (np.arange(frame)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = mono[idx] * np.hanning(frame)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # mel filterbank
    n_mels = max(n_bands + 2, 20)
    fmax = rate / 2.0
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    pts = imel(np.linspace(0, mel(fmax), n_mels + 2))
    bins = np.floor((frame + 1) * pts / rate).astype(int).clip(0, frame // 2)
    fb = np.zeros((n_mels, frame // 2 + 1), np.float32)
    for m in range(1, n_mels + 1):
        lo, cen, hi = bins[m - 1], bins[m], bins[m + 1]
        if cen > lo:
            fb[m - 1, lo:cen] = (np.arange(lo, cen) - lo) / (cen - lo)
        if hi > cen:
            fb[m - 1, cen:hi] = (hi - np.arange(cen, hi)) / (hi - cen)
    mels = np.log(power @ fb.T + 1e-10).mean(axis=0)
    # DCT-II
    k = np.arange(n_mels)
    dct = np.cos(np.pi * np.arange(n_bands)[:, None]
                 * (2 * k[None, :] + 1) / (2 * n_mels))
    return (dct @ mels).astype(np.float32)


# ----------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray:
    """-> uint8 array (h, w) gray or (h, w, ch) for RGB/GA/RGBA.
    Stdlib-only: zlib inflate + NumPy unfiltering of the five PNG
    row filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supports
    8-bit depth, color types 0/2/4/6, non-interlaced (PIL-free: the
    compressed-image stub shrinks to JPEG/video only)."""
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(content):
        (length,), typ = struct.unpack_from(">I", content, pos), \
            content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0:
                raise ValueError(f"unsupported PNG depth/compression "
                                 f"({depth}/{comp})")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if ch is None:
                raise ValueError(f"unsupported color type {ctype}"
                                 " (palette needs PLTE handling)")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG size mismatch after inflate")
    rows = raw.reshape(h, stride + 1)
    ftypes, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = data[y].copy()
        if f == 0:
            pass
        elif f == 1:                     # Sub: + left -> per-channel
            row = (row.reshape(w, ch).astype(np.uint32)
                   .cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:                     # Up
            row += prev
        elif f == 3:                     # Average
            px = row.reshape(w, ch)
            up = prev.reshape(w, ch)
            left = np.zeros(ch, np.uint8)
            for x in range(w):
                px[x] += ((left.astype(np.uint16)
                           + up[x].astype(np.uint16)) >> 1).astype(np.uint8)
                left = px[x]
            row = px.reshape(stride)
        elif f == 4:                     # Paeth
            px = row.reshape(w, ch).astype(np.int16)
            up = prev.reshape(w, ch).astype(np.int16)
            left = np.zeros(ch, np.int16)
            ul = np.zeros(ch, np.int16)
            for x in range(w):
                p = left + up[x] - ul
                pa, pb, pc = (np.abs(p - left), np.abs(p - up[x]),
                              np.abs(p - ul))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up[x], ul))
                px[x] = (px[x] + pred) & 0xFF
                left, ul = px[x], up[x]
            row = px.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = row
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 2|3|4) -> non-interlaced 8-bit PNG,
    filter type 0 on every row (valid per spec; decoders must accept)."""
    import zlib

    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ, data):
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(rows.tobytes(), 6)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
