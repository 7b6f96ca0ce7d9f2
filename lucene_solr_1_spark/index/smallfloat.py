"""SmallFloat 3.15 norm quantization, vectorized in NumPy.

Reproduces the public formula of Lucene's one-byte norm codec
(ref: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98
``floatToByte315`` / ``byte315ToFloat``): a float with 3 mantissa bits
and a zero exponent point of 15.  BM25 encodes ``1/sqrt(fieldLength)``
into this byte at index time and decodes ``1/f^2`` (~fieldLength) at
query time (ref: search/similarities/BM25Similarity.java:95-134).

All functions are pure NumPy so they run identically in the oracle, in
pandas UDFs on executors, and in unit tests off-Spark.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "NORM_INV_TABLE",
    "encode_norm",
    "decode_norm_len",
]


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized floatToByte315: float32 array -> uint8 norm bytes."""
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> (24 - 3)
    zero_point = (63 - 15) << 3  # 384
    out = (smallfloat - zero_point).astype(np.int32)
    # underflow -> 0 for f<=0, else 1 (smallest positive)
    under = smallfloat <= zero_point
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> 255
    out = np.where(smallfloat >= zero_point + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized byte315ToFloat: uint8 array -> float32."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), out).astype(np.float32)


def _build_inv_table() -> np.ndarray:
    """BM25's 256-entry decode table: NORM_INV_TABLE[b] = 1 / f(b)^2.

    (ref: BM25Similarity.java:95-103 — ``NORM_TABLE[i] = 1f/(f*f)``);
    entry 0 maps to +inf in Java (1/0); we keep inf, it never wins top-k.
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


NORM_INV_TABLE: np.ndarray = _build_inv_table()


def encode_norm(field_lengths: np.ndarray) -> np.ndarray:
    """Norm byte per document: floatToByte315(1/sqrt(len)).

    Zero-length fields encode 1/sqrt(0)=inf -> byte 255 in Java
    (overflow clamp); we reproduce that.
    (ref: BM25Similarity.java:138-141 computeNorm)
    """
    lengths = np.asarray(field_lengths, dtype=np.float32)
    with np.errstate(divide="ignore"):
        f = (np.float32(1.0) / np.sqrt(lengths, dtype=np.float32)).astype(np.float32)
    return float_to_byte315(f)


def decode_norm_len(norm_bytes: np.ndarray) -> np.ndarray:
    """Decoded (approximate) field length per norm byte, float32."""
    return NORM_INV_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]
