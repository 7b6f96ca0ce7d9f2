"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure NumPy +
stdlib — closes the last multimodal decode stub (VERDICT-r4 Missing #2):
web-crawl media columns are mostly JPEG, and the container has no
PIL/libvips, so the entropy coding and the DCT are implemented from the
published spec directly.

Decoder scope: the baseline process (Annex F.2) — SOI/APPn/COM, DQT
(8-bit tables), SOF0 (8-bit precision, 1 or 3 components, sampling
factors up to 2x2), DHT, DRI + RSTn restart markers, single interleaved
SOS scan — AND the huffman progressive process (SOF2, Annex G.2):
spectral-selection bands, successive approximation for DC and AC
(first + refinement scans, EOBn run codes), interleaved DC /
non-interleaved AC scan geometry, coefficients accumulated across
scans and reconstructed once at EOI. Huffman-decoded coefficients are
dequantized, de-zigzagged, put through the 2-D orthonormal IDCT
(A.3.3) as one batched matrix product, level-shifted and clipped;
chroma is nearest-upsampled and converted with the JFIF YCbCr->RGB
matrix.

Encoder scope (to build deterministic fixtures and round-trip property
tests without third-party deps): baseline 4:4:4 or 4:2:0, Annex K
quantization tables scaled by the libjpeg quality formula (quality=100
-> all-ones tables, near-lossless), Annex K typical Huffman tables
(K.3.3), optional restart interval; progressive 4:4:4 via
encode_jpeg_progressive (spectral bands + successive approximation),
which emits the SAME quantized coefficients as the baseline encoder so
decode(progressive) == decode(baseline) bit-for-bit.

All table constants are the published Annex K values. Implemented from
the T.81 spec text — not a translation of any decoder's source.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- constants

def _zigzag() -> np.ndarray:
    """Natural (row-major) index of the k-th coefficient in zigzag
    order (T.81 Figure A.6): even diagonals run bottom-left to
    top-right, odd ones the reverse."""
    idx = sorted(((r, c) for r in range(8) for c in range(8)),
                 key=lambda rc: (rc[0] + rc[1],
                                 -rc[0] if (rc[0] + rc[1]) % 2 == 0
                                 else rc[0]))
    return np.array([r * 8 + c for r, c in idx], dtype=np.int64)


ZIGZAG = _zigzag()                      # zigzag pos -> natural pos
UNZIGZAG = np.argsort(ZIGZAG)           # natural pos -> zigzag pos

# Annex K.1/K.2 quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]

# orthonormal 8x8 DCT basis (T.81 A.3.3): FDCT F = A f A^T, IDCT f = A^T F A
_A = np.array([[0.5 * (1 / np.sqrt(2) if k == 0 else 1.0)
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


# ------------------------------------------------------ huffman tables

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment of
    T.81 Annex C (Generate_size_table / Generate_code_table)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _canonical_codes."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


# ----------------------------------------------------------- bit I/O

class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """EXTEND procedure (T.81 F.2.2.1): map the t-bit magnitude bits to
    the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------ decoder

def decode_jpeg(content: bytes) -> np.ndarray:
    """-> uint8 (h, w, 3) RGB for 3-component scans, (h, w) grayscale
    for 1-component. Baseline sequential DCT (SOF0) and progressive
    huffman DCT (SOF2, spectral selection + successive approximation,
    T.81 Annex G.2)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    saw_scan = False
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue                            # standalone markers
        seglen = struct.unpack_from(">H", content, pos)[0]
        body = content[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                      # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                zz = np.frombuffer(body, np.uint8, 64, off).astype(np.int64)
                off += 64
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = zz                # DQT stores zigzag order
                qtables[tq] = nat
        elif marker == 0xC4:                    # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC2, 0xC3, 0xC9):  # SOF0/2/3/9
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if marker != 0xC3 and prec != 8:
                raise ValueError("only 8-bit precision")
            if marker == 0xC3 and not (2 <= prec <= 16):
                raise ValueError("lossless precision must be 2..16")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2,
                     "lossless": marker == 0xC3,
                     "arith": marker == 0xC9}
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:                    # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            ecs_start = pos
            # entropy-coded data runs to the next non-RST marker
            p = pos
            while p + 1 < len(content):
                if content[p] == 0xFF and content[p + 1] not in (0x00,) \
                        and not (0xD0 <= content[p + 1] <= 0xD7):
                    break
                p += 1 + (1 if content[p] == 0xFF else 0)
            ecs = content[ecs_start:p]
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame.get("arith"):
                from .jpegarith import decode_arith_scan
                return decode_arith_scan(frame, scan, qtables,
                                         restart_interval, ecs)
            if frame.get("lossless"):
                raw = _decode_lossless_scan(frame, scan, htables,
                                            restart_interval, ecs,
                                            predictor=ss,
                                            point_transform=al)
                # unify with the image pipeline: project to uint8
                shift = max(frame["prec"] - al - 8, 0)
                out = (raw >> shift).astype(np.uint8)
                return out[..., 0] if out.shape[2] == 1 else out
            if not frame.get("progressive"):
                return _decode_scan(frame, scan, qtables, htables,
                                    restart_interval, ecs)
            _decode_progressive_scan(frame, scan, htables,
                                     restart_interval, ecs,
                                     ss, se, ah, al)
            saw_scan = True
            pos = p                             # continue after the scan
    if frame is not None and frame.get("progressive") and saw_scan:
        for c in frame["comps"]:
            if "coef" not in c:
                raise ValueError(
                    f"progressive JPEG never scanned component {c['id']}")
        return _reconstruct(frame, frame["comps"], qtables)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(frame, scan, qtables, htables, restart_interval,
                 ecs: bytes) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["coef"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), np.int64)

    segments = _split_segments(ecs, restart_interval)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in order}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in order}
        my, mx = divmod(m, mcux)
        for c in order:
            dc_tab = htables[(0, c["td"])]
            ac_tab = htables[(1, c["ta"])]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    t = reader.read_symbol(dc_tab)
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:         # ZRL
                                k += 16
                                continue
                            break                # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    c["coef"][my * c["v"] + v, mx * c["h"] + hh] = zz

    return _reconstruct(frame, order, qtables)


def _split_segments(ecs: bytes, restart_interval: int) -> list[bytes]:
    """Destuff the entropy bytes, splitting at RSTn markers (byte-
    aligned restart-segment separators) when a restart interval is in
    force."""
    if not restart_interval:
        return [ecs.replace(b"\xff\x00", b"\xff")]
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(ecs):
        if ecs[i] == 0xFF and i + 1 < len(ecs):
            nxt = ecs[i + 1]
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
        cur.append(ecs[i])
        i += 1
    segments.append(bytes(cur))
    return segments


# ------------------------------------------------- lossless (SOF3)

def _predict(row, above, x, y, sel, default):
    """T.81 H.1.2.1 predictors over reconstructed neighbours:
    a = left, b = above, c = above-left. First sample of the image
    (and of each restart interval) uses the default 1<<(P-Pt-1);
    the rest of line 0 uses a; the first column uses b."""
    if y == 0:
        return row[x - 1] if x else default
    if x == 0:
        return above[0]
    a, b, c = row[x - 1], above[x], above[x - 1]
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _decode_lossless_scan(frame, scan, htables, restart_interval, ecs,
                          predictor: int, point_transform: int
                          ) -> np.ndarray:
    """Lossless sequential huffman scan (T.81 Annex H): each data unit
    is ONE sample; the DC huffman table codes SSSS (0..16, 16 meaning
    diff=32768 with no extra bits), diff = EXTEND(bits, SSSS), sample
    = (prediction + diff) mod 2^16. Components interleave per MCU
    (sampling factors must all be 1). -> uint16 (h, w, ncomps),
    samples still shifted by the point transform (raw precision
    P - Pt)."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise ValueError("lossless: only 1x1 sampling supported")
    order = []
    for s in scan:
        ci = next(i for i, c in enumerate(comps) if c["id"] == s["cs"])
        order.append((ci, htables[(0, s["td"])]))
    nc = len(order)
    default = 1 << (frame["prec"] - point_transform - 1)
    out = np.zeros((h, w, nc), np.int64)
    segments = _split_segments(ecs, restart_interval)
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
            restart_row = (restart_interval
                           and mcu % restart_interval == 0 and mcu)
            for slot, (ci, tab) in enumerate(order):
                ssss = reader.read_symbol(tab)
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(ssss), ssss)
                plane = out[:, :, slot]
                if restart_row or (y == 0 and x == 0):
                    pred = default       # restart resets the predictor
                else:
                    pred = _predict(plane[y], plane[y - 1] if y else None,
                                    x, y, predictor, default)
                plane[y, x] = (int(pred) + diff) & 0xFFFF
            mcu += 1
    return out.astype(np.uint16)


# fixture table: one huffman code per SSSS 0..16, all 5 bits long
# (17 codes of length 5 satisfy Kraft; all-ones stays unused)
_LOSSLESS_BITS = [0, 0, 0, 0, 17] + [0] * 11
_LOSSLESS_VALS = list(range(17))


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 1,
                         precision: int = 8,
                         point_transform: int = 0,
                         restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, ncomps) integer image -> lossless JPEG (SOF3)
    bytes; decode_jpeg(..) >> shift reproduces the input EXACTLY (it
    is lossless). Fixture-grade encoder: fixed 5-bit SSSS table,
    1x1 sampling."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    x = (img.astype(np.int64) >> point_transform) & 0xFFFF
    default = 1 << (precision - point_transform - 1)
    enc = _canonical_codes(_LOSSLESS_BITS, _LOSSLESS_VALS)
    writer = _BitWriter()
    chunks: list[bytes] = []
    mcu = 0
    for y in range(h):
        for xi in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.pad()
                chunks.append(bytes(writer.out))   # already stuffed
                writer = _BitWriter()
            at_restart = (restart_interval
                          and mcu % restart_interval == 0 and mcu)
            for ci in range(nc):
                plane = x[:, :, ci]
                if at_restart or (y == 0 and xi == 0):
                    pred = default
                else:
                    pred = _predict(plane[y], plane[y - 1] if y else None,
                                    xi, y, predictor, default)
                diff = (int(plane[y, xi]) - int(pred)) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    code, ln = enc[16]
                    writer.write(code, ln)
                else:
                    ssss = _csize(diff)
                    code, ln = enc[ssss]
                    writer.write(code, ln)
                    if ssss:
                        writer.write(diff if diff > 0
                                     else diff + (1 << ssss) - 1, ssss)
            mcu += 1
    writer.pad()
    chunks.append(bytes(writer.out))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    dht = bytes([0x00] + _LOSSLESS_BITS + _LOSSLESS_VALS)
    parts.append(seg(0xC4, dht))
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    parts.append(seg(0xC3, sof))
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    parts.append(seg(0xDA, sos))
    for i, chunk in enumerate(chunks):
        parts.append(chunk)                 # _BitWriter already stuffs
        if i + 1 < len(chunks):
            parts.append(bytes([0xFF, 0xD0 + (i % 8)]))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def decode_jpeg_lossless(content: bytes) -> np.ndarray:
    """Raw lossless decode -> uint16 (h, w, ncomps) at precision
    P - Pt (no uint8 projection). Minimal marker walk delegating to
    _decode_lossless_scan."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos, htables, frame, ri = 2, {}, None, 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        seglen = struct.unpack_from(">H", content, pos)[0]
        body = content[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xC3:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [{"id": body[6 + 3 * i], "h": body[7 + 3 * i] >> 4,
                      "v": body[7 + 3 * i] & 0x0F, "tq": body[8 + 3 * i]}
                     for i in range(nc)]
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "lossless": True}
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            scan = [{"cs": body[1 + 2 * i], "td": body[2 + 2 * i] >> 4,
                     "ta": body[2 + 2 * i] & 0x0F} for i in range(ns)]
            ss = body[1 + 2 * ns]
            al = body[3 + 2 * ns] & 0x0F
            p = pos
            while p + 1 < len(content):
                if content[p] == 0xFF and content[p + 1] not in (0x00,) \
                        and not (0xD0 <= content[p + 1] <= 0xD7):
                    break
                p += 1 + (1 if content[p] == 0xFF else 0)
            if frame is None:
                raise ValueError("SOS before SOF3")
            return _decode_lossless_scan(frame, scan, htables, ri,
                                         content[pos:p], predictor=ss,
                                         point_transform=al)
    raise ValueError("lossless JPEG has no SOS scan")


def _reconstruct(frame, comps, qtables) -> np.ndarray:
    """Dequantize + de-zigzag + batched IDCT + level shift + (for
    color) YCbCr->RGB, from the per-component zigzag coefficient
    arrays — shared by the baseline single-scan path and the
    progressive multi-scan accumulator."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        nby, nbx = c["coef"].shape[:2]
        # de-zigzag: coef index k (zigzag) -> natural position ZIGZAG[k]
        nat = np.zeros((nby * nbx, 64), np.int64)
        nat[:, ZIGZAG] = c["coef"].reshape(-1, 64)
        nat = nat * q[None, :]
        fb = nat.reshape(-1, 8, 8).astype(np.float64)
        sp = np.einsum("ij,njk,kl->nil", _A.T, fb, _A) + 128.0
        sp = np.clip(np.round(sp), 0, 255).astype(np.uint8)
        plane = (sp.reshape(nby, nbx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
        # nearest upsample to full MCU resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


# ------------------------------------------------- progressive decoder
# T.81 Annex G.2 (huffman progressive DCT): each SOS carries a spectral
# band [Ss, Se] and a successive-approximation bit position (Ah -> Al).
# Coefficients accumulate across scans in the per-component zigzag
# arrays; reconstruction happens once at EOI. The refinement-bit
# control flow follows the spec figures G.7/G.8 (the same algorithm
# libjpeg documents); two's-complement bit tests (coef & p1) carry over
# to Python ints verbatim.


def _dc_first_block(reader, dc_tab, zz, al, pred):
    t = reader.read_symbol(dc_tab)
    diff = _extend(reader.read_bits(t), t)
    pred += diff
    zz[0] = pred << al
    return pred


def _ac_first_block(reader, ac_tab, zz, ss, se, al, eobrun):
    """First AC scan of a band (G.2.2): run-length/size coding like
    baseline, plus EOBn symbols (s=0, r<15) coding a run of
    end-of-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                      # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, ac_tab, zz, ss, se, al, eobrun):
    """AC refinement scan (G.1.2.3, figure G.8): newly-nonzero
    coefficients arrive with magnitude 1 at bit Al; every
    history-nonzero coefficient crossed on the way emits one
    correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:                       # correction bits to band end
            if zz[k] != 0:
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(frame, scan, htables, restart_interval,
                             ecs, ss, se, ah, al) -> None:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        if "coef" not in c:
            c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                 np.int64)
    if ss > 0 and len(order) != 1:
        raise ValueError("progressive AC scans must be single-component")
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0 (G.1.1.1.1)")

    segments = _split_segments(ecs, restart_interval)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in order}
    eobrun = 0

    if len(order) > 1:                        # interleaved (DC) scan
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in order}
            my, mx = divmod(m, mcux)
            for c in order:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = c["coef"][my * c["v"] + v, mx * c["h"] + hh]
                        if ah == 0:
                            pred[c["id"]] = _dc_first_block(
                                reader, htables[(0, c["td"])], zz, al,
                                pred[c["id"]])
                        else:                 # DC refinement: one raw bit
                            if reader.read_bit():
                                zz[0] |= 1 << al
        return

    # non-interleaved: the component's own block grid (T.81 A.2.2 —
    # ceil of the scaled dimensions, NOT padded to the MCU grid)
    c = order[0]
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    nbx, nby = -(-cw // 8), -(-ch // 8)
    for m in range(nbx * nby):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in order}
            eobrun = 0
        by, bx = divmod(m, nbx)
        zz = c["coef"][by, bx]
        if ss == 0:
            if ah == 0:
                pred[c["id"]] = _dc_first_block(
                    reader, htables[(0, c["td"])], zz, al, pred[c["id"]])
            elif reader.read_bit():
                zz[0] |= 1 << al
        elif ah == 0:
            eobrun = _ac_first_block(reader, htables[(1, c["ta"])],
                                     zz, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(reader, htables[(1, c["ta"])],
                                      zz, ss, se, al, eobrun)


# ------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)            # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scaling rule (jcparam.c semantics,
    re-derived: 5000/q below 50, 200-2q above); q=100 -> all ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _csize(v: int) -> int:
    """bit category of a coefficient value (T.81 F.1.2.1.1)."""
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: tuple[int, int] = (1, 1),
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray -> baseline JFIF bytes.
    subsample=(2, 2) emits 4:2:0 chroma."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane":
                  img.astype(np.float64)}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        sh, sv = subsample
        if (sh, sv) not in ((1, 1), (2, 2)):
            raise ValueError("subsample must be (1,1) or (2,2)")
        if (sh, sv) == (2, 2):
            # pad to even, then 2x2 box average
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2,
                             2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2,
                             2).mean(axis=(1, 3))
        comps = [{"id": 1, "h": sh, "v": sv, "tq": 0, "plane": y},
                 {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
                 {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr}]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component padded planes + FDCT-quantized blocks
    for c in comps:
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        p = c["plane"]
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        blocks = (p.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
        coefs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        q = (qy if c["tq"] == 0 else qc).reshape(8, 8)
        c["q"] = np.round(coefs / q[None]).astype(np.int64).reshape(-1, 64)
        c["nbx"] = pw // 8
    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wtr = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    out_segments = []
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.pad()
            out_segments.append(bytes(wtr.out))
            out_segments.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            wtr = _BitWriter()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            dct, act = (dc_y, ac_y) if c["tq"] == 0 else (dc_c, ac_c)
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    bi = (my * c["v"] + v) * c["nbx"] + (mx * c["h"] + hh)
                    zz = c["q"][bi][ZIGZAG]     # natural -> zigzag order
                    diff = int(zz[0]) - pred[c["id"]]
                    pred[c["id"]] = int(zz[0])
                    t = _csize(diff)
                    code, ln = dct[t]
                    wtr.write(code, ln)
                    if t:
                        wtr.write(diff if diff >= 0
                                  else diff + (1 << t) - 1, t)
                    run = 0
                    for k in range(1, 64):
                        val = int(zz[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = act[0xF0]     # ZRL
                            wtr.write(code, ln)
                            run -= 16
                        s = _csize(val)
                        code, ln = act[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(val if val >= 0 else val + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = act[0x00]         # EOB
                        wtr.write(code, ln)
    wtr.pad()
    out_segments.append(bytes(wtr.out))
    entropy = b"".join(out_segments)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    parts.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    parts.append(seg(0xDB, bytes([0]) + bytes(qy[ZIGZAG].astype(np.uint8))))
    if not gray:
        parts.append(seg(0xDB, bytes([1])
                         + bytes(qc[ZIGZAG].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    parts.append(seg(0xC0, sof))

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    parts.append(dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    parts.append(dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        parts.append(dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        parts.append(dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for c in comps:
        td_ta = 0x00 if c["tq"] == 0 else 0x11
        sos += bytes([c["id"], td_ta])
    sos += bytes([0, 63, 0])
    parts.append(seg(0xDA, sos))
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            dc_al: int = 1, ac_al: int = 0,
                            bands: tuple = ((1, 5), (6, 63))) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray -> PROGRESSIVE (SOF2) JFIF
    bytes, 4:4:4 only. Scan script (the common libjpeg shape):

      1. interleaved DC first scan at Al=dc_al,
      2. DC refinement scans down to bit 0,
      3. per component, per spectral band, an AC first scan at
         Al=ac_al, then (if ac_al > 0) AC refinement scans down to 0.

    The quantized coefficients are IDENTICAL to encode_jpeg's at the
    same quality, so decode(progressive) must equal decode(baseline)
    bit-for-bit — the property the tests pin. Successive-approximation
    encoding follows T.81 G.1.2.2-G.1.2.3 (figures G.7/G.8); EOB runs
    are flushed per block (EOBRUN=1), which is spec-legal and keeps
    the encoder simple."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                  "plane": img.astype(np.float64)}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y},
                 {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
                 {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr}]
    mcux, mcuy = -(-w // 8), -(-h // 8)
    for c in comps:
        p = np.pad(c["plane"], ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
                   mode="edge")
        blocks = (p.reshape(mcuy, 8, mcux, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
        coefs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        q = (qy if c["tq"] == 0 else qc).reshape(8, 8)
        nat = np.round(coefs / q[None]).astype(np.int64).reshape(-1, 64)
        c["zz"] = nat[:, ZIGZAG]             # per-block zigzag coeffs

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(scomps: list, ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scomps)])
        for c in scomps:
            tid = 0x00 if c["tq"] == 0 else 0x11
            body += bytes([c["id"], tid])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        pred = {c["id"]: 0 for c in comps}
        for m in range(mcux * mcuy):
            for c in comps:
                tab = dc_y if c["tq"] == 0 else dc_c
                v = int(c["zz"][m, 0]) >> al     # point transform
                diff = v - pred[c["id"]]
                pred[c["id"]] = v
                t = _csize(diff)
                code, ln = tab[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        wtr.pad()
        return bytes(wtr.out)

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        for m in range(mcux * mcuy):
            for c in comps:
                wtr.write((int(c["zz"][m, 0]) >> al) & 1, 1)
        wtr.pad()
        return bytes(wtr.out)

    def ac_first_scan(c, ss: int, se: int, al: int) -> bytes:
        tab = ac_y if c["tq"] == 0 else ac_c
        wtr = _BitWriter()
        for m in range(c["zz"].shape[0]):
            run = 0
            for k in range(ss, se + 1):
                full = int(c["zz"][m, k])
                mag = abs(full) >> al
                if mag == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = tab[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                val = mag if full >= 0 else -mag
                s = _csize(val)
                code, ln = tab[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(val if val >= 0 else val + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = tab[0x00]             # EOB (run of 1)
                wtr.write(code, ln)
        wtr.pad()
        return bytes(wtr.out)

    def ac_refine_scan(c, ss: int, se: int, al: int) -> bytes:
        # figure G.8 control flow: r counts zero-history positions;
        # history-nonzero positions buffer one correction bit each; a
        # ZRL is forced by ANY nonzero at r>15 — but only up to the
        # LAST newly-nonzero position (eobpos); beyond it zeros and
        # correction bits fold into the EOB code
        tab = ac_y if c["tq"] == 0 else ac_c
        wtr = _BitWriter()
        for m in range(c["zz"].shape[0]):
            mags = [abs(int(c["zz"][m, k])) >> al for k in range(ss, se + 1)]
            eobpos = max((ss + i for i, mg in enumerate(mags) if mg == 1),
                         default=ss - 1)
            run = 0
            pending: list[int] = []              # buffered correction bits
            for k in range(ss, se + 1):
                full = int(c["zz"][m, k])
                mag = mags[k - ss]
                if mag == 0:
                    run += 1
                    continue
                while run > 15 and k <= eobpos:
                    code, ln = tab[0xF0]
                    wtr.write(code, ln)
                    for bit in pending:
                        wtr.write(bit, 1)
                    pending = []
                    run -= 16
                if mag > 1:                      # history-nonzero coeff
                    pending.append(mag & 1)
                    continue
                code, ln = tab[(run << 4) | 1]   # newly nonzero (mag == 1)
                wtr.write(code, ln)
                wtr.write(1 if full >= 0 else 0, 1)
                for bit in pending:
                    wtr.write(bit, 1)
                pending = []
                run = 0
            if run or pending:
                code, ln = tab[0x00]             # EOB, then its bits
                wtr.write(code, ln)
                for bit in pending:
                    wtr.write(bit, 1)
        wtr.pad()
        return bytes(wtr.out)

    parts = [b"\xff\xd8",
             seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
             seg(0xDB, bytes([0]) + bytes(qy[ZIGZAG].astype(np.uint8)))]
    if not gray:
        parts.append(seg(0xDB, bytes([1])
                         + bytes(qc[ZIGZAG].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], 0x11, c["tq"]])
    parts.append(seg(0xC2, sof))                 # SOF2: progressive

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    parts.append(dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    parts.append(dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        parts.append(dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        parts.append(dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))

    parts.append(sos_header(comps, 0, 0, 0, dc_al))
    parts.append(dc_first_scan(dc_al))
    for bit in range(dc_al - 1, -1, -1):
        parts.append(sos_header(comps, 0, 0, bit + 1, bit))
        parts.append(dc_refine_scan(bit))
    for c in comps:
        for ss, se in bands:
            parts.append(sos_header([c], ss, se, 0, ac_al))
            parts.append(ac_first_scan(c, ss, se, ac_al))
    for bit in range(ac_al - 1, -1, -1):
        for c in comps:
            for ss, se in bands:
                parts.append(sos_header([c], ss, se, bit + 1, bit))
                parts.append(ac_refine_scan(c, ss, se, bit))
    parts.append(b"\xff\xd9")
    return b"".join(parts)
