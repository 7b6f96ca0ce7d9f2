"""Compressed-audio decode in pure NumPy: G.711 u-law / A-law and
IMA / Microsoft ADPCM inside the RIFF/WAVE container — the four
compressed formats a WAV file actually carries in the wild. Closes the
"compressed audio" stub of datapipe/multimodal.py the same way
jpegcodec closed image decode: implemented from the published specs
(ITU-T G.711 (1988) segment tables; IMA ADPCM as published in the IMA
Digital Audio Focus Group recommendation (1992) step/index tables;
Microsoft ADPCM per the published WAVEFORMAT_ADPCM coefficient set),
no third-party codec libraries.

Reference parity note: the Lucene/Solr reference indexes text and
treats binary payloads as opaque stored fields (ref: lucene/core/.../
document/Field.java binary ctor; solr ExtractingRequestHandler
delegates media to Tika, out of repo scope) — audio decode here
serves the LLM-data-pipeline media columns, not a reference operator.

Scale shape: everything is a per-row kernel inside Arrow batches
(mapInPandas in multimodal.py) — no shuffle, embarrassingly parallel.
ADPCM's sequential predictor recursion is vectorized ACROSS BLOCKS:
all blocks of a file advance in lock-step (one Python step per sample
position, NumPy vectors over blocks x channels), so cost scales with
samples-per-block, not total samples.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- G.711

_BIAS = 0x84          # 132, the u-law bias
_CLIP = 32635


def _build_mulaw_table() -> np.ndarray:
    """256-entry u-law byte -> int16 linear table (ITU-T G.711,
    u-law expansion: sample = ((mantissa<<3) + 0x84) << exponent
    - 0x84, sign from the top bit of the complemented byte)."""
    u = (~np.arange(256)) & 0xFF
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa.astype(np.int32) << 3) + _BIAS) << exponent) - _BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """256-entry A-law byte -> int16 table (G.711 A-law expansion
    with the 0x55 toggle; seg 0: t = (q<<4)+8; seg>=1: ((q<<4)+0x108)
    << (seg-1))."""
    a = np.arange(256) ^ 0x55
    sign = (a & 0x80) != 0
    seg = (a >> 4) & 0x07
    q = a & 0x0F
    t = (q.astype(np.int32) << 4) + 8
    mag = np.where(seg == 0, t, (t + 0x100) << (np.maximum(seg, 1) - 1))
    # A-law sign bit 0x80 SET means positive (opposite of u-law)
    return np.where(sign, mag, -mag).astype(np.int16)


MULAW_DECODE = _build_mulaw_table()
ALAW_DECODE = _build_alaw_table()


def mulaw_decode(data: bytes) -> np.ndarray:
    """u-law bytes -> int16 samples (vectorized table gather)."""
    return MULAW_DECODE[np.frombuffer(data, np.uint8)]


def alaw_decode(data: bytes) -> np.ndarray:
    return ALAW_DECODE[np.frombuffer(data, np.uint8)]


_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF,
                      0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int32)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF,
                      0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32)


def mulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 -> u-law bytes, the canonical CCITT/Sun g711.c
    quantization (14-bit path: >>2, clip 8159, bias 33, segment
    boundary search) — byte-exact vs that reference implementation
    for every int16 value."""
    x = np.asarray(pcm, np.int32) >> 2
    mask = np.where(x < 0, 0x7F, 0xFF)
    x = np.minimum(np.abs(np.where(x < 0, -x, x)), 8159) + 33
    seg = np.searchsorted(_SEG_UEND, x, side="left").astype(np.int32)
    uval = np.where(seg >= 8, 0x7F,           # out of range: full scale
                    (seg << 4) | ((x >> np.minimum(seg + 1, 8)) & 0x0F))
    return ((uval ^ mask) & 0xFF).astype(np.uint8).tobytes()


def alaw_encode(pcm: np.ndarray) -> bytes:
    """int16 -> A-law bytes, canonical Sun g711.c quantization
    (13-bit path: >>3, negative values offset by -1, 0x55/0xD5
    masks) — byte-exact vs that reference for every int16 value."""
    x = np.asarray(pcm, np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_SEG_AEND, x, side="left").astype(np.int32)
    aval = np.where(seg >= 8, 0x7F,
                    (seg << 4)
                    | np.where(seg < 2, (x >> 1) & 0x0F,
                               (x >> seg) & 0x0F))
    return ((aval ^ mask) & 0xFF).astype(np.uint8).tobytes()


# --------------------------------------------------------- IMA ADPCM

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                            -1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(pred: np.ndarray, index: np.ndarray,
              nibble: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One IMA ADPCM state transition, vectorized over an array of
    independent decoders (blocks x channels)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nibble & 1, step >> 2, 0)
    diff = diff + np.where(nibble & 2, step >> 1, 0)
    diff = diff + np.where(nibble & 4, step, 0)
    pred = np.where(nibble & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + IMA_INDEX_TABLE[nibble], 0, 88)
    return pred, index


def ima_adpcm_decode(data: bytes, channels: int,
                     block_align: int) -> np.ndarray:
    """IMA ADPCM (WAVE format 0x11) -> int16 (n, channels).

    WAV block layout: per channel a 4-byte header (predictor i16,
    step index u8, reserved u8), then interleaved 4-byte channel
    words, each holding 8 nibbles (low nibble first). All blocks
    decode in lock-step (vectorized across blocks)."""
    blob = np.frombuffer(data, np.uint8)
    n_blocks = len(blob) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), np.int16)
    blocks = blob[: n_blocks * block_align].reshape(n_blocks, block_align)
    hdr = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (hdr[:, :, 0].astype(np.int32)
            | (hdr[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 32768, pred - 65536, pred)   # i16
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)

    body = blocks[:, 4 * channels:]
    # interleave: groups of 4 bytes per channel, repeating
    n_words = body.shape[1] // (4 * channels)
    words = body[:, : n_words * 4 * channels].reshape(
        n_blocks, n_words, channels, 4)
    # nibbles: per 4-byte word -> 8 samples, low nibble first
    nib = np.empty((n_blocks, n_words, channels, 8), np.uint8)
    nib[..., 0::2] = words & 0x0F
    nib[..., 1::2] = words >> 4
    spb = n_words * 8 + 1                       # samples per block
    out = np.empty((n_blocks, spb, channels), np.int16)
    out[:, 0, :] = pred.astype(np.int16)        # header predictor IS
    #                                             the first sample
    for w in range(n_words):
        for k in range(8):
            pred, index = _ima_step(pred, index, nib[:, w, :, k])
            out[:, w * 8 + k + 1, :] = pred.astype(np.int16)
    return out.reshape(n_blocks * spb, channels)


def ima_adpcm_encode(pcm: np.ndarray, channels: int = 1,
                     samples_per_block: int = 505) -> tuple[bytes, int]:
    """int16 (n, channels) -> (IMA ADPCM payload, block_align).
    samples_per_block must be 8k+1. Blocks encode in lock-step
    (vectorized across blocks) with greedy nibble quantization —
    the standard encoder."""
    pcm = np.atleast_2d(np.asarray(pcm, np.int16))
    if pcm.shape[0] < pcm.shape[1]:
        pcm = pcm.T
    n, ch = pcm.shape
    assert ch == channels
    spb = samples_per_block
    assert (spb - 1) % 8 == 0
    n_blocks = (n + spb - 1) // spb
    pad = n_blocks * spb - n
    if pad:
        pcm = np.vstack([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    x = pcm.reshape(n_blocks, spb, ch).astype(np.int32)

    pred = x[:, 0, :].copy()
    # per-block starting step index chosen from the block's own mean
    # |delta| (the header stores it, so any choice decodes exactly;
    # seeding near the signal's step avoids the ~50-sample
    # readaptation a zero start costs at every block boundary)
    mean_abs = np.abs(np.diff(x, axis=1)).mean(axis=1)
    index = np.clip(np.searchsorted(IMA_STEP_TABLE, mean_abs),
                    0, 88).astype(np.int32)
    index0 = index.copy()
    n_words = (spb - 1) // 8
    nibbles = np.empty((n_blocks, n_words, ch, 8), np.uint8)
    for w in range(n_words):
        for k in range(8):
            target = x[:, w * 8 + k + 1, :]
            step = IMA_STEP_TABLE[index]
            diff = target - pred
            nib = np.where(diff < 0, 8, 0).astype(np.int32)
            adiff = np.abs(diff)
            nib = nib | np.where(adiff >= step, 4, 0)
            adiff = adiff - np.where(adiff >= step, step, 0)
            half = step >> 1
            nib = nib | np.where(adiff >= half, 2, 0)
            adiff = adiff - np.where(adiff >= half, half, 0)
            quarter = step >> 2
            nib = nib | np.where(adiff >= quarter, 1, 0)
            nibbles[:, w, :, k] = nib.astype(np.uint8)
            pred, index = _ima_step(pred, index, nib)

    block_align = 4 * ch + n_words * 4 * ch
    out = np.empty((n_blocks, block_align), np.uint8)
    first = x[:, 0, :].astype(np.int16)
    hdr = np.empty((n_blocks, ch, 4), np.uint8)
    u16 = first.astype(np.int32) & 0xFFFF
    hdr[:, :, 0] = (u16 & 0xFF).astype(np.uint8)
    hdr[:, :, 1] = (u16 >> 8).astype(np.uint8)
    hdr[:, :, 2] = index0.astype(np.uint8)
    hdr[:, :, 3] = 0
    out[:, : 4 * ch] = hdr.reshape(n_blocks, 4 * ch)
    words = (nibbles[..., 0::2] | (nibbles[..., 1::2] << 4))
    out[:, 4 * ch:] = words.reshape(n_blocks, n_words * 4 * ch)
    return out.tobytes(), block_align


# ---------------------------------------------------------- MS ADPCM

MS_COEFS = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                     [240, 0], [460, -208], [392, -232]], np.int32)
MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                     768, 614, 512, 409, 307, 230, 230, 230], np.int32)


def ms_adpcm_decode(data: bytes, channels: int,
                    block_align: int) -> np.ndarray:
    """Microsoft ADPCM (WAVE format 0x02) -> int16 (n, channels).
    Block header per channel: predictor index u8, idelta i16,
    sample1 i16, sample2 i16; then 4-bit codes, high nibble first,
    channels interleaved per nibble. Vectorized across blocks."""
    blob = np.frombuffer(data, np.uint8)
    n_blocks = len(blob) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), np.int16)
    blocks = blob[: n_blocks * block_align].reshape(n_blocks, block_align)
    ch = channels

    def i16(lo, hi):
        v = lo.astype(np.int32) | (hi.astype(np.int32) << 8)
        return np.where(v >= 32768, v - 65536, v)

    coef_idx = np.clip(blocks[:, :ch].astype(np.int32), 0, 6)
    off = ch
    idelta = i16(blocks[:, off:off + 2 * ch:2], blocks[:, off + 1:off + 2 * ch:2])
    off += 2 * ch
    samp1 = i16(blocks[:, off:off + 2 * ch:2], blocks[:, off + 1:off + 2 * ch:2])
    off += 2 * ch
    samp2 = i16(blocks[:, off:off + 2 * ch:2], blocks[:, off + 1:off + 2 * ch:2])
    off += 2 * ch

    c1 = MS_COEFS[coef_idx, 0]
    c2 = MS_COEFS[coef_idx, 1]
    body = blocks[:, off:]
    nib = np.empty((n_blocks, body.shape[1] * 2), np.uint8)
    nib[:, 0::2] = body >> 4                    # high nibble first
    nib[:, 1::2] = body & 0x0F
    n_codes = nib.shape[1] // ch
    nib = nib[:, : n_codes * ch].reshape(n_blocks, n_codes, ch)

    spb = n_codes + 2
    out = np.empty((n_blocks, spb, ch), np.int16)
    out[:, 0, :] = samp2.astype(np.int16)       # oldest first
    out[:, 1, :] = samp1.astype(np.int16)
    for k in range(n_codes):
        code = nib[:, k, :].astype(np.int32)
        signed = np.where(code >= 8, code - 16, code)
        pred = (samp1 * c1 + samp2 * c2) >> 8
        pred = np.clip(pred + signed * idelta, -32768, 32767)
        out[:, k + 2, :] = pred.astype(np.int16)
        samp2 = samp1
        samp1 = pred
        idelta = np.maximum((MS_ADAPT[code] * idelta) >> 8, 16)
    return out.reshape(n_blocks * spb, ch)


def ms_adpcm_encode(pcm: np.ndarray, channels: int = 1,
                    samples_per_block: int = 500) -> tuple[bytes, int]:
    """int16 -> (MS ADPCM payload, block_align), coefficient pair 0
    (256, 0 — pure first-order), greedy quantization; decodes with
    any compliant decoder."""
    pcm = np.atleast_2d(np.asarray(pcm, np.int16))
    if pcm.shape[0] < pcm.shape[1]:
        pcm = pcm.T
    n, ch = pcm.shape
    assert ch == channels
    spb = samples_per_block
    n_blocks = (n + spb - 1) // spb
    pad = n_blocks * spb - n
    if pad:
        pcm = np.vstack([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    x = pcm.reshape(n_blocks, spb, ch).astype(np.int32)

    samp2 = x[:, 0, :].copy()
    samp1 = x[:, 1, :].copy() if spb > 1 else x[:, 0, :].copy()
    idelta = np.full((n_blocks, ch), 16, np.int32)
    n_codes = spb - 2
    nib = np.empty((n_blocks, n_codes, ch), np.uint8)
    c1, c2 = 256, 0
    for k in range(n_codes):
        target = x[:, k + 2, :]
        pred = (samp1 * c1 + samp2 * c2) >> 8
        code = np.clip(np.round((target - pred) / idelta).astype(np.int32),
                       -8, 7)
        dec = np.clip(pred + code * idelta, -32768, 32767)
        nib[:, k, :] = (code & 0x0F).astype(np.uint8)
        samp2 = samp1
        samp1 = dec
        idelta = np.maximum((MS_ADAPT[code & 0x0F] * idelta) >> 8, 16)

    body_bytes = (n_codes * ch + 1) // 2
    block_align = 7 * ch + body_bytes
    out = np.zeros((n_blocks, block_align), np.uint8)
    out[:, :ch] = 0                                  # coef pair 0

    def put16(col, v):
        out[:, col:col + 2 * ch:2] = (v & 0xFF).astype(np.uint8)
        out[:, col + 1:col + 2 * ch:2] = ((v >> 8) & 0xFF).astype(np.uint8)

    put16(ch, np.full((n_blocks, ch), 16, np.int32))
    put16(3 * ch, x[:, 1, :] if spb > 1 else x[:, 0, :])
    put16(5 * ch, x[:, 0, :])
    flat = nib.reshape(n_blocks, n_codes * ch)
    hi = flat[:, 0::2]
    lo = flat[:, 1::2]
    packed = np.zeros((n_blocks, body_bytes), np.uint8)
    packed[:, : hi.shape[1]] = hi << 4
    packed[:, : lo.shape[1]] |= lo
    out[:, 7 * ch:] = packed
    return out.tobytes(), block_align


# --------------------------------------------------- WAV integration

def decode_wav_compressed(fmt: tuple, data: bytes) -> np.ndarray:
    """Dispatch for non-PCM WAVE formats -> float32 in [-1, 1] flat
    interleaved. fmt = (audio_fmt, channels, rate, byterate,
    block_align, bits)."""
    audio_fmt, channels, _, _, block_align, _ = fmt
    if audio_fmt == 7:                 # u-law
        pcm = mulaw_decode(data)
    elif audio_fmt == 6:               # A-law
        pcm = alaw_decode(data)
    elif audio_fmt == 0x11:            # IMA ADPCM
        pcm = ima_adpcm_decode(data, channels, block_align).reshape(-1)
    elif audio_fmt == 0x02:            # MS ADPCM
        pcm = ms_adpcm_decode(data, channels, block_align).reshape(-1)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}")
    return pcm.astype(np.float32) / 32768.0


def encode_wav_compressed(samples: np.ndarray, rate: int,
                          codec: str = "mulaw") -> bytes:
    """float32 [-1,1] (n,) or (n, ch) -> compressed WAV bytes
    (codec in mulaw | alaw | ima_adpcm | ms_adpcm)."""
    samples = np.atleast_2d(np.asarray(samples, np.float32))
    if samples.shape[0] < samples.shape[1]:
        samples = samples.T
    n, ch = samples.shape
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    if codec == "mulaw":
        payload, tag, block_align, bits = (mulaw_encode(pcm.reshape(-1)),
                                           7, ch, 8)
    elif codec == "alaw":
        payload, tag, block_align, bits = (alaw_encode(pcm.reshape(-1)),
                                           6, ch, 8)
    elif codec == "ima_adpcm":
        payload, block_align = ima_adpcm_encode(pcm, ch)
        tag, bits = 0x11, 4
    elif codec == "ms_adpcm":
        payload, block_align = ms_adpcm_encode(pcm, ch)
        tag, bits = 0x02, 4
    else:
        raise ValueError(codec)
    byterate = rate * block_align if bits == 4 else rate * ch
    fmt = struct.pack("<HHIIHH", tag, ch, rate, byterate, block_align, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
