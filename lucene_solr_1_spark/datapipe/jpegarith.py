"""Arithmetic-coded JPEG (SOF9, sequential DCT) in pure NumPy/Python:
the QM binary arithmetic coder with the T.81 Table D.3 probability
state machine and the Annex F.1.4 DC/AC statistical models
(conditioning contexts, magnitude-category trees, fixed-probability
sign bins). Closes the "arithmetic-coded JPEG" stub of
datapipe/multimodal.py.

Implemented from the published ITU-T T.81 (1992) specification:
  * Qe/NMPS/NLPS/SWITCH table transcribed from Table D.3 (113 states);
  * encoder CODELPS/CODEMPS with conditional exchange (D.1.3),
    renormalization (D.1.5) and carry-safe byte emission;
  * decoder DECODE/MPS_EXCHANGE/LPS_EXCHANGE (D.2.2-D.2.4);
  * DC model: zero/sign/magnitude-category/magnitude-bit contexts with
    the previous-diff classification bands (F.1.4.4.1.3, bounds L=0,
    U=1); AC model: per-k EOB and significance contexts with the
    low/high magnitude split at K=5 (F.1.4.4.2).

HONEST DEVIATION, by design: T.81 D.1.6 specifies a stuffed ZERO BIT
after X'FF' bytes in arithmetic entropy data. This implementation uses
the huffman-style 0xFF 0x00 BYTE stuffing instead, so the surrounding
marker walk (shared with the baseline/progressive decoder) parses scan
boundaries identically for all three processes. The encoder/decoder
pair is self-consistent and marker-safe; interchange with external
SOF9 files would additionally need the bit-stuffing BYTEIN variant.
The correctness anchor is the same as the progressive codec's:
decode(arithmetic stream) must equal decode(baseline huffman stream)
BIT-FOR-BIT for the same quantized coefficients.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Table D.3: Qe value and next-state/switch table (113 states)
_QM = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
]
_QE = np.array([q for q, _, _, _ in _QM], np.int64)
_NLPS = np.array([n for _, n, _, _ in _QM], np.int64)
_NMPS = np.array([n for _, _, n, _ in _QM], np.int64)
_SWITCH = np.array([s for _, _, _, s in _QM], np.int64)

FIXED = -1          # pseudo-context: Qe = 0x5A1D, never adapts


def destuff(data: bytes) -> bytes:
    """Remove the 0x00 stuffed after each 0xFF entropy byte."""
    return data.replace(b"\xff\x00", b"\xff")


class _Ctx:
    """One adaptive binary context: (state index, MPS sense)."""
    __slots__ = ("i", "mps")

    def __init__(self):
        self.i = 0
        self.mps = 0


class QMEncoder:
    """T.81 Annex D QM encoder (CODELPS/CODEMPS with conditional
    exchange) over adaptive contexts; carry handled with the
    stacked-0xFF formulation; 0xFF bytes are emitted with a stuffed
    0x00 (see module docstring)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1      # pending byte (carry may still land)
        self.sc = 0           # stacked 0xFF count
        self.out = bytearray()

    def _emit(self, b: int):
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)       # byte stuffing

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry: into the pending byte; stacked FFs roll to 0x00
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self._emit(0x00)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1                # defer: may absorb a carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFFFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def encode(self, ctx, d: int):
        if ctx is FIXED or ctx == FIXED:
            qe, adapt = 0x5A1D, False
            mps = 0
        else:
            qe, adapt, mps = int(_QE[ctx.i]), True, ctx.mps
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return
            if self.a < qe:                      # conditional exchange
                self.c += self.a
                self.a = qe
            if adapt:
                ctx.i = int(_NMPS[ctx.i])
            self._renorm()
        else:
            if self.a < qe:                      # conditional exchange
                pass                             # LPS takes the bottom
            else:
                self.c += self.a
                self.a = qe
            if adapt:
                if _SWITCH[ctx.i]:
                    ctx.mps = 1 - ctx.mps
                ctx.i = int(_NLPS[ctx.i])
            self._renorm()

    def flush(self) -> bytes:
        # CLEARBITS (D.1.8): point C at the smallest final codestring
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        for _ in range(4):               # ct<=11 + 16 value bits < 4*8
            self._byteout()
            self.c = (self.c << 8) & 0xFFFFFFFF
        if self.buffer >= 0:
            self._emit(self.buffer)
        for _ in range(self.sc):
            self._emit(0xFF)
        # trailing 0x00s are redundant (decoder feeds zeros at the end)
        while self.out and self.out[-1] == 0x00:
            self.out.pop()
        return bytes(self.out)


class QMDecoder:
    """QM decoder mirroring QMEncoder's interval updates exactly
    (bottom subinterval = the one whose C offset is unchanged): a
    bit-pump over the DESTUFFED entropy bytes (use destuff() or
    jpegcodec._split_segments first), feeding zero bits past the end
    (the CLEARBITS flush convention makes that sound). Invariant:
    cw in [0, a) where cw is the code window aligned with a."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.byte = 0
        self.nbits = 0
        self.a = 0x10000
        self.cw = 0
        for _ in range(16):
            self.cw = (self.cw << 1) | self._next_bit()

    def _next_bit(self) -> int:
        if self.nbits == 0:
            if self.bp >= len(self.data):
                self.byte = 0
            else:
                self.byte = self.data[self.bp]
                self.bp += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def _renorm(self):
        while self.a < 0x8000:
            self.a <<= 1
            self.cw = (self.cw << 1) | self._next_bit()

    def decode(self, ctx) -> int:
        if ctx is FIXED or ctx == FIXED:
            qe, adapt, mps = 0x5A1D, False, 0
        else:
            qe, adapt, mps = int(_QE[ctx.i]), True, ctx.mps
        a1 = self.a - qe
        if self.cw < a1:
            # bottom region: MPS normally, LPS under cond. exchange
            if a1 & 0x8000:
                self.a = a1
                return mps
            if a1 < qe:
                d = 1 - mps
                if adapt:
                    if _SWITCH[ctx.i]:
                        ctx.mps = 1 - ctx.mps
                    ctx.i = int(_NLPS[ctx.i])
            else:
                d = mps
                if adapt:
                    ctx.i = int(_NMPS[ctx.i])
            self.a = a1
            self._renorm()
            return d
        # top region (size qe): LPS normally, MPS under cond. exchange
        self.cw -= a1
        if a1 < qe:
            d = mps
            if adapt:
                ctx.i = int(_NMPS[ctx.i])
        else:
            d = 1 - mps
            if adapt:
                if _SWITCH[ctx.i]:
                    ctx.mps = 1 - ctx.mps
                ctx.i = int(_NLPS[ctx.i])
        self.a = qe
        self._renorm()
        return d


# -------------------------------------------- DC / AC statistical model
# context areas per T.81 F.1.4 (jdk of offsets: DC zero/sign/magnitude
# contexts per previous-diff class; X1 category tree at 20, magnitude
# bits at +14; AC per-k EOB/significance triplets, category trees at
# 189/217 split at K=5, fixed-probability sign)

_DC_STATS = 64
_AC_STATS = 256
_AC_K = 5           # arith_ac_K default conditioning
_DC_L, _DC_U = 0, 1  # default DC conditioning bounds


def _classify_dc(diff: int) -> int:
    """Previous-diff classification (F.1.4.4.1.3) with the default
    conditioning bounds L=0, U=1: 0 zero, 4/8 small +/-, 12/16
    large +/- (small = |diff| <= 2^U)."""
    if diff == 0:
        return 0
    if abs(diff) <= (1 << _DC_U):
        return 4 if diff > 0 else 8
    return 12 if diff > 0 else 16


class _Stats:
    def __init__(self, n: int):
        self.ctx = [_Ctx() for _ in range(n)]

    def __getitem__(self, i: int) -> _Ctx:
        return self.ctx[i]


def _code_dc(coder, stats: _Stats, prev_class: int, diff: int,
             decode: bool):
    """DC difference model (F.1.4.1). Returns diff when decoding."""
    base = prev_class
    if decode:
        if coder.decode(stats[base]) == 0:
            return 0
        sign = coder.decode(stats[base + 1])
        st = base + 2 + sign
        m = 1
        if coder.decode(stats[st]):
            st2 = 20                     # X1 category tree (Table F.4)
            m = 2
            while coder.decode(stats[st2]):
                m <<= 1
                st2 += 1
                if m == 0x8000:
                    raise ValueError("DC magnitude overflow")
        v = m
        mm = m >> 1
        while mm:                        # magnitude bits at X1 + 14
            if coder.decode(stats[20 + 14]):
                v |= mm
            mm >>= 1
        return v if sign == 0 else -v
    # encode
    if diff == 0:
        coder.encode(stats[base], 0)
        return None
    coder.encode(stats[base], 1)
    sign = 0 if diff > 0 else 1
    coder.encode(stats[base + 1], sign)
    a = abs(diff)
    st = base + 2 + sign
    if a == 1:
        coder.encode(stats[st], 0)
        return None
    coder.encode(stats[st], 1)
    # magnitude category: number of doublings from 2
    m = 2
    st2 = 20
    while (m << 1) <= a:
        coder.encode(stats[st2], 1)
        m <<= 1
        st2 += 1
    coder.encode(stats[st2], 0)
    bit_base = 20 + 14
    mm = m >> 1
    while mm:
        coder.encode(stats[bit_base], 1 if a & mm else 0)
        mm >>= 1
    return None


def _code_ac_block(coder, stats: _Stats, zz: np.ndarray, decode: bool,
                   se: int = 63):
    """AC model (F.1.4.2): per-k EOB decision + significance runs,
    magnitude trees split at K, fixed-probability sign. zz is the
    64-long zigzag coefficient vector (k = 1..se)."""
    if decode:
        k = 1
        while k <= se:
            st = 3 * (k - 1)
            if coder.decode(stats[st]):
                break                        # EOB
            while coder.decode(stats[st + 1]) == 0:
                st += 3
                k += 1
                if k > se:
                    raise ValueError("AC significance ran past Se")
            sign = coder.decode(FIXED)
            m = 1
            if coder.decode(stats[st + 2]):
                m = 2
                if coder.decode(stats[st + 2]):
                    st2 = 189 if k <= _AC_K else 217
                    m = 4
                    while coder.decode(stats[st2]):
                        m <<= 1
                        st2 += 1
                        if m == 0x8000:
                            raise ValueError("AC magnitude overflow")
            v = m
            if m > 1:
                bit_st = (189 if k <= _AC_K else 217) + 14
                mm = m >> 1
                while mm:
                    if coder.decode(stats[bit_st]):
                        v |= mm
                    mm >>= 1
            zz[k] = v if sign == 0 else -v
            k += 1
        return
    # encode
    last = 0
    for k in range(se, 0, -1):
        if zz[k]:
            last = k
            break
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        coder.encode(stats[st], 0)           # not EOB
        while zz[k] == 0:
            coder.encode(stats[st + 1], 0)
            st += 3
            k += 1
        coder.encode(stats[st + 1], 1)
        v = int(zz[k])
        sign = 0 if v > 0 else 1
        coder.encode(FIXED, sign)
        a = abs(v)
        if a == 1:
            coder.encode(stats[st + 2], 0)
        else:
            coder.encode(stats[st + 2], 1)
            if a <= 3:                      # m == 2
                coder.encode(stats[st + 2], 0)
                m = 2
            else:
                coder.encode(stats[st + 2], 1)
                st2 = 189 if k <= _AC_K else 217
                m = 4
                while (m << 1) <= a:
                    coder.encode(stats[st2], 1)
                    m <<= 1
                    st2 += 1
                coder.encode(stats[st2], 0)
            bit_st = (189 if k <= _AC_K else 217) + 14
            mm = m >> 1
            while mm:
                coder.encode(stats[bit_st], 1 if a & mm else 0)
                mm >>= 1
        k += 1
    if last < se:
        coder.encode(stats[3 * (k - 1)], 1)  # EOB


# ------------------------------------------------ SOF9 file format

def encode_jpeg_arith(img: np.ndarray, quality: int = 90,
                      restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray -> arithmetic-coded
    sequential JPEG (SOF9), 4:4:4 sampling, default conditioning
    (L=0, U=1, K=5 — no DAC marker). Same FDCT/quantization as the
    baseline encoder, so decode(SOF9) == decode(SOF0) bit-for-bit."""
    from .jpegcodec import (QUANT_CHROMA, QUANT_LUMA, ZIGZAG, _A,
                            _quality_scale)
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        comps = [{"id": 1, "tq": 0, "plane": img.astype(np.float64)}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        comps = [
            {"id": 1, "tq": 0,
             "plane": 0.299 * r + 0.587 * g + 0.114 * b},
            {"id": 2, "tq": 1, "plane":
             128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b},
            {"id": 3, "tq": 1, "plane":
             128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b}]
    mcux, mcuy = -(-w // 8), -(-h // 8)
    for c in comps:
        p = np.pad(c["plane"], ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
                   mode="edge")
        blocks = (p.reshape(mcuy, 8, mcux, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
        coefs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        q = (qy if c["tq"] == 0 else qc).reshape(8, 8)
        c["q"] = np.round(coefs / q[None]).astype(np.int64).reshape(-1, 64)

    def fresh_state():
        return (QMEncoder(),
                {0: _Stats(_DC_STATS), 1: _Stats(_DC_STATS)},
                {0: _Stats(_AC_STATS), 1: _Stats(_AC_STATS)},
                {c["id"]: 0 for c in comps},
                {c["id"]: 0 for c in comps})

    coder, dc_stats, ac_stats, pred, prev_cls = fresh_state()
    segments: list[bytes] = []
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            segments.append(coder.flush())
            segments.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            coder, dc_stats, ac_stats, pred, prev_cls = fresh_state()
        for c in comps:
            tbl = c["tq"]
            zz = c["q"][m][ZIGZAG]
            diff = int(zz[0]) - pred[c["id"]]
            pred[c["id"]] = int(zz[0])
            _code_dc(coder, dc_stats[tbl], prev_cls[c["id"]], diff,
                     decode=False)
            prev_cls[c["id"]] = _classify_dc(diff)
            _code_ac_block(coder, ac_stats[tbl], zz, decode=False)
    segments.append(coder.flush())
    entropy = b"".join(segments)

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
        sof += bytes([c["id"], 0x11, c["tq"]])
    parts.append(seg(0xC9, sof))                 # SOF9: arithmetic
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], (c["tq"] << 4) | c["tq"]])
    sos += bytes([0, 63, 0])
    parts.append(seg(0xDA, sos))
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def decode_arith_scan(frame, scan, qtables, restart_interval,
                      ecs: bytes) -> np.ndarray:
    """Sequential arithmetic scan (SOF9) -> decoded image via the
    shared dequant/IDCT reconstruction. 4:4:4 sampling only."""
    from .jpegcodec import ZIGZAG, _reconstruct, _split_segments
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise ValueError("arithmetic: only 1x1 sampling supported")
    mcux, mcuy = -(-w // 8), -(-h // 8)
    by_id = {c["id"]: c for c in comps}
    order = [(by_id[s["cs"]], s["td"]) for s in scan]
    for c in comps:
        c["coef"] = np.zeros((mcuy, mcux, 64), np.int64)

    # arithmetic ECS uses 0xFF00 byte stuffing like the huffman scans,
    # and _split_segments destuffs — QMDecoder expects destuffed bytes
    segments = _split_segments(ecs, restart_interval)
    seg_idx = 0

    def fresh(data: bytes):
        dec = QMDecoder(data)
        return (dec, {0: _Stats(_DC_STATS), 1: _Stats(_DC_STATS)},
                {0: _Stats(_AC_STATS), 1: _Stats(_AC_STATS)},
                {c["id"]: 0 for c in comps},
                {c["id"]: 0 for c in comps})

    coder, dc_stats, ac_stats, pred, prev_cls = fresh(segments[0])
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            coder, dc_stats, ac_stats, pred, prev_cls = \
                fresh(segments[seg_idx])
        my, mx = divmod(m, mcux)
        for c, tbl in order:
            diff = _code_dc(coder, dc_stats[tbl], prev_cls[c["id"]],
                            0, decode=True)
            prev_cls[c["id"]] = _classify_dc(diff)
            pred[c["id"]] += diff
            zz = np.zeros(64, np.int64)
            zz[0] = pred[c["id"]]
            _code_ac_block(coder, ac_stats[tbl], zz, decode=True)
            c["coef"][my, mx] = zz
    for c in comps:
        c["coef"] = c["coef"].reshape(mcuy, mcux, 64)
    return _reconstruct(frame, comps, qtables)
