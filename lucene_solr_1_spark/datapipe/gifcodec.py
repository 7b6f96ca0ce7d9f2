"""GIF87a/89a codec in pure stdlib + NumPy — web crawls are full of
GIFs (and animated GIFs are the most common short-loop 'video' on the
open web), and the container has no PIL, so LZW and the block grammar
are implemented from the published specification (GIF89a spec,
CompuServe 1990; LZW per its Appendix F) directly.

Decoder scope: logical screen + global/local color tables, interlaced
and non-interlaced image data, Graphic Control Extensions
(transparency, disposal methods 0-3), multi-frame compositing to full
RGB canvases. Encoder scope (fixtures + round-trip property tests):
single global palette, optional per-frame delay, full-frame images,
variable-width LZW with table reset at 4096.

Reference analog: Lucene has no media path; this belongs to the
training-data pipeline surface (multimodal columns over a 100-TB
crawl), next to jpegcodec/mediacodec/avicodec.
"""

from __future__ import annotations

import struct

import numpy as np

# GIF interlace passes: (start row, step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def is_gif(content: bytes) -> bool:
    return content[:6] in (b"GIF87a", b"GIF89a")


# -------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int
                ) -> np.ndarray:
    """Variable-width LZW (GIF Appendix F): codes are packed
    LSB-first; CLEAR resets the table, widths grow at table size
    2^width up to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         bitorder="little")
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while pos + width <= len(bits) and len(out) < n_pixels:
        code = 0
        for i in range(width):
            code |= int(bits[pos + i]) << i
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream short of pixels")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out_bits: list[int] = []

    def emit(code: int, w: int):
        for i in range(w):
            out_bits.append((code >> i) & 1)

    emit(clear, width)
    cur = b""
    for b in bytes(indices.astype(np.uint8).tobytes()):
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:                                # table full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    arr = np.array(out_bits, np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload into <=255-byte length-prefixed sub-blocks + a
    zero terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(content: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while pos < len(content):
        n = content[pos]
        pos += 1
        if n == 0:
            break
        out += content[pos:pos + n]
        pos += n
    return bytes(out), pos


# ------------------------------------------------------------ decoder

def decode_gif_frames(content: bytes) -> list[np.ndarray]:
    """-> list of fully-composited (h, w, 3) uint8 RGB canvases, one
    per frame, honoring local palettes, interlace, transparency, and
    disposal methods 1 (keep) / 2 (restore background) / 3 (restore
    previous)."""
    if not is_gif(content):
        raise ValueError("not a GIF file")
    w, h = struct.unpack_from("<HH", content, 6)
    packed, bg_idx = content[10], content[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.tile(bg, (h, w, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:                    # trailer
            break
        if block == 0x21:                    # extension
            label = content[pos]
            pos += 1
            data, pos = _read_sub_blocks(content, pos)
            if label == 0xF9 and len(data) >= 4:   # Graphic Control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", content, pos)
        fpacked = content[pos + 8]
        pos += 9
        pal = gct
        if fpacked & 0x80:                   # local color table
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(content, np.uint8, 3 * n,
                                pos).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = content[pos]
        pos += 1
        data, pos = _read_sub_blocks(content, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:                   # de-interlace (4 passes)
            de = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        if (idx >= len(pal)).any():
            raise ValueError("GIF pixel index out of palette range")
        before = canvas.copy() if disposal == 3 else None
        rgb = pal[idx]
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        if disposal == 2:                    # restore background
            canvas[top:top + fh, left:left + fw] = bg
        elif disposal == 3 and before is not None:
            canvas = before
        disposal, transparent = 0, None
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_gif(content: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(content)[0]


# ------------------------------------------------------------ encoder

def encode_gif(frames, delay_cs: int = 4) -> bytes:
    """uint8 (h, w, 3) frame or list of frames (all same size) -> GIF
    bytes with one global palette built from the unique colors
    (<= 256) across all frames. Multi-frame inputs get Graphic
    Control Extensions with the given delay (animation fixtures)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(allpx, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    depth = max(1, int(len(colors) - 1).bit_length())
    tbl = np.zeros((2 ** depth, 3), np.uint8)
    tbl[:len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) & 0x07), 0, 0])
    out += tbl.tobytes()
    min_code = max(2, depth)
    offsets = np.cumsum([0] + [f.size // 3 for f in frames])
    for i, f in enumerate(frames):
        if len(frames) > 1:
            out += bytes([0x21, 0xF9, 4, 0])
            out += struct.pack("<H", delay_cs)
            out += bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = inv[offsets[i]:offsets[i + 1]].astype(np.uint8)
        out += bytes([min_code]) + _sub_blocks(_lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)
