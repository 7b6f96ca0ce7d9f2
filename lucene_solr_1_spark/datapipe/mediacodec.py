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
    RIFF chunk walk; PCM u8 / s16 / s32, IEEE float32, and the
    compressed formats G.711 u-law/A-law + IMA/MS ADPCM
    (audiocodec.py)."""
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
    elif audio_fmt in (2, 6, 7, 0x11):
        from .audiocodec import decode_wav_compressed
        x = decode_wav_compressed(fmt, data)
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


# Adam7 pass grid (RFC 2083 §2.6): (x0, y0, dx, dy) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_defilter(rows: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """(n, stride+1) filter-prefixed byte rows -> (n, stride) unfiltered
    bytes; the five RFC 2083 §6 filters operate on BYTES at lag bpp."""
    n = rows.shape[0]
    npx = stride // bpp                  # bpp divides stride by layout
    ftypes, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((n, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(n):
        f = int(ftypes[y])
        row = data[y].copy()
        if f == 0:
            pass
        elif f == 1:                     # Sub: + left -> lag-bpp cumsum
            row = (row.reshape(npx, bpp).astype(np.uint32)
                   .cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:                     # Up
            row += prev
        elif f == 3:                     # Average
            px = row.reshape(npx, bpp)
            up = prev.reshape(npx, bpp)
            left = np.zeros(bpp, np.uint8)
            for x in range(npx):
                px[x] += ((left.astype(np.uint16)
                           + up[x].astype(np.uint16)) >> 1).astype(np.uint8)
                left = px[x]
            row = px.reshape(stride)
        elif f == 4:                     # Paeth
            px = row.reshape(npx, bpp).astype(np.int16)
            up = prev.reshape(npx, bpp).astype(np.int16)
            left = np.zeros(bpp, np.int16)
            ul = np.zeros(bpp, np.int16)
            for x in range(npx):
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
    return out


def _png_samples(block: np.ndarray, w: int, ch: int, depth: int
                 ) -> np.ndarray:
    """(n, stride) unfiltered bytes -> (n, w, ch) uint8 samples.
    16-bit samples reduce to their high byte (the 8-bit projection a
    feature pipeline wants); sub-byte depths unpack MSB-first."""
    n = block.shape[0]
    if depth == 8:
        return block[:, :w * ch].reshape(n, w, ch)
    if depth == 16:
        return block[:, 0:2 * w * ch:2].reshape(n, w, ch)
    bits = np.unpackbits(block, axis=1)[:, :w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(n, w, depth) * weights).sum(axis=2)
    return vals[:, :, None].astype(np.uint8)


def decode_png(content: bytes) -> np.ndarray:
    """-> uint8 array (h, w) gray or (h, w, ch) for RGB/GA/RGBA.
    Stdlib-only: zlib inflate + NumPy unfiltering of the five PNG row
    filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supports bit
    depths 1/2/4/8/16 (16 projects to the high byte), color types
    0/2/3/4/6 — palette via PLTE (+ optional tRNS alpha) — and both
    non-interlaced and Adam7-interlaced layouts (PIL-free: the
    compressed-image stub shrinks to exotic JPEG modes only)."""
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, w = 8, None
    idat, plte, trns = [], None, None
    while pos + 8 <= len(content):
        (length,), typ = struct.unpack_from(">I", content, pos), \
            content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter "
                                 "method")
            ok_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16),
                         3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
            if ctype not in ok_depths or depth not in ok_depths[ctype]:
                raise ValueError(
                    f"invalid PNG depth/color type ({depth}/{ctype})")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = max(1, ch * depth // 8)

    def stride_of(width: int) -> int:
        return (width * ch * depth + 7) // 8

    if interlace == 0:
        stride = stride_of(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG size mismatch after inflate")
        px = _png_samples(_png_defilter(raw.reshape(h, stride + 1),
                                        stride, bpp), w, ch, depth)
    elif interlace == 1:                 # Adam7: 7 independent passes
        px = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue                 # pass empty for small images
            stride = stride_of(pw)
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("PNG interlaced stream truncated")
            block = raw[off:off + need].reshape(ph, stride + 1)
            off += need
            px[y0::dy, x0::dx] = _png_samples(
                _png_defilter(block, stride, bpp), pw, ch, depth)
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")

    if ctype == 3:                       # palette lookup (+ tRNS alpha)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if (idx >= len(plte)).any():
            raise ValueError("palette index out of range")
        img = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            img = np.concatenate([img, alpha[idx][:, :, None]], axis=2)
        return img
    if ctype == 0 and depth < 8:         # scale low-depth gray to 8-bit
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)) \
            .astype(np.uint8)
    return px[:, :, 0] if ch == 1 else px


def encode_png(img: np.ndarray, interlace: bool = False,
               palette: bool = False) -> bytes:
    """uint8 (h, w) gray or (h, w, 2|3|4) -> 8-bit PNG, filter type 0
    on every row (valid per spec; decoders must accept). interlace=True
    emits the Adam7 layout; palette=True indexes an RGB image's unique
    colors (<= 256) through a PLTE chunk — both exist to build
    deterministic fixtures for the decoder's interlaced/palette
    paths."""
    import zlib

    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape

    def chunk(typ, data):
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data \
            + struct.pack(">I", crc)

    extra = b""
    if palette:
        if ch != 3:
            raise ValueError("palette encoding expects an RGB image")
        colors, idx = np.unique(img.reshape(-1, 3), axis=0,
                                return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette encoding needs <= 256 colors")
        extra = chunk(b"PLTE", colors.astype(np.uint8).tobytes())
        img = idx.reshape(h, w, 1).astype(np.uint8)
        ch, ctype = 1, 3
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            ph, pw = sub.shape[:2]
            parts.append(np.concatenate(
                [np.zeros((ph, 1), np.uint8),
                 sub.reshape(ph, pw * ch)], axis=1).tobytes())
        body = b"".join(parts)
    else:
        body = np.concatenate(
            [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)],
            axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(body, 6))
            + chunk(b"IEND", b""))
