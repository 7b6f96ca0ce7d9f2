"""SignatureUpdateProcessor — ingest-time dedup signatures.

Reference: ``solr/core/src/java/org/apache/solr/update/processor/``
``SignatureUpdateProcessorFactory.java`` (fields sorted, per present
field ``sig.add(fieldName); sig.add(str(value))`` — collection values
added element-wise — hex-encoded signature stored in
``signatureField``; ``overwriteDupes`` sets ``updateTerm`` so the add
deletes the previous doc with the same signature: last write wins),
``MD5Signature.java`` (UTF-8 MD5 of the concatenated adds),
``Lookup3Signature.java`` (chained ``Hash.lookup3ycs64``),
``TextProfileSignature.java`` (Nutch page profile: letter-or-digit
runs lowercased, tokens strictly longer than minTokenLen, counts
quantized to QUANT = round(maxFreq * quantRate) with the <2 clamp,
sub-QUANT tokens dropped, "token cnt" lines sorted by cnt desc, the
profile fed to MD5).

Faithfulness notes:

* ``lookup3ycs64`` is a bit-exact port of
  ``solr/solrj/.../common/util/Hash.java:186-237`` (the 64-bit
  lookup3ycs over code points, including the missing ``length<<2``
  and the signed-int ``c`` sign extension into the long).
* TextProfileSignature's frequency sort breaks ties by Java HashMap
  iteration order; ``_java_hashmap_order`` reproduces Java 8 HashMap
  bucket order exactly (String.hashCode, ``h ^ h>>>16`` spread, final
  power-of-two capacity at load factor 0.75, split-preserved insertion
  order within buckets) so profiles are byte-identical to the
  reference for any realistic token set (treeified buckets — 8+ hash
  collisions — are not modeled).

Spark surfaces: ``compute_signatures`` adds the hex signature column —
pure JVM ``md5(concat(...))`` for the md5 flavor (codegen, no Python),
Arrow-batched kernels for lookup3/textprofile; ``dedup_by_signature``
implements overwriteDupes as one map-side-combinable ``max_by``
aggregation per signature (last write wins), never a row_number
window — a 10^9-duplicate signature never funnels one partition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["lookup3ycs64", "MD5Signature", "Lookup3Signature",
           "TextProfileSignature", "compute_signatures",
           "dedup_by_signature"]

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


def lookup3ycs64(s: str, initval: int = 0) -> int:
    """Hash.lookup3ycs64 (Hash.java:186-237), unsigned-64 result."""
    a = b = c = (0xDEADBEEF + (initval & _M32)) & _M32
    c = (c + ((initval >> 32) & _M32)) & _M32
    cps = [ord(ch) for ch in s]
    i, n = 0, len(cps)
    mixed = True
    while i < n:
        mixed = False
        a = (a + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        b = (b + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        c = (c + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        # mix(a,b,c)
        a = (a - c) & _M32; a ^= _rotl(c, 4);  c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rotl(a, 6);  a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rotl(b, 8);  b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rotl(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rotl(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rotl(b, 4);  b = (b + a) & _M32
        mixed = True
    if not mixed:
        # final(a,b,c)
        c ^= b; c = (c - _rotl(b, 14)) & _M32
        a ^= c; a = (a - _rotl(c, 11)) & _M32
        b ^= a; b = (b - _rotl(a, 25)) & _M32
        c ^= b; c = (c - _rotl(b, 16)) & _M32
        a ^= c; a = (a - _rotl(c, 4)) & _M32
        b ^= a; b = (b - _rotl(a, 14)) & _M32
        c ^= b; c = (c - _rotl(b, 24)) & _M32
    # Java: return c + (((long)b) << 32) with c SIGN-EXTENDED
    c_signed = c - (1 << 32) if c >= (1 << 31) else c
    return ((b << 32) + c_signed) & _M64


class MD5Signature:
    """UTF-8 MD5 over the concatenated add() contents."""

    def __init__(self) -> None:
        self._md5 = hashlib.md5()

    def add(self, content: str) -> None:
        self._md5.update(content.encode("utf-8"))

    def get_signature(self) -> bytes:
        return self._md5.digest()


class Lookup3Signature:
    """Chained lookup3ycs64; 8-byte big-endian signature."""

    def __init__(self) -> None:
        self._hash = 0

    def add(self, content: str) -> None:
        self._hash = lookup3ycs64(content, self._hash)

    def get_signature(self) -> bytes:
        return self._hash.to_bytes(8, "big")


def _java_string_hash(s: str) -> int:
    """String.hashCode over UTF-16 code units, signed-32 wrap."""
    h = 0
    for ch in s:
        cp = ord(ch)
        if cp > 0xFFFF:  # surrogate pair in Java
            cp -= 0x10000
            for unit in (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)):
                h = (31 * h + unit) & _M32
        else:
            h = (31 * h + cp) & _M32
    return h


def _java_hashmap_order(keys: list[str]) -> list[str]:
    """Java 8 HashMap<String,_> iteration order for the given insertion
    order: final capacity = smallest 16*2^k with size <= 0.75*cap,
    bucket = (h ^ h>>>16) & (cap-1), insertion order inside buckets
    (resize splits preserve it)."""
    cap = 16
    while len(keys) > (cap * 3) // 4:
        cap <<= 1
    spread = [(_java_string_hash(k) ^ (_java_string_hash(k) >> 16)) & (cap - 1)
              for k in keys]
    order = sorted(range(len(keys)), key=lambda i: spread[i])  # stable
    return [keys[i] for i in order]


class TextProfileSignature(MD5Signature):
    """Nutch text profile -> MD5 (TextProfileSignature.java:49-160)."""

    def __init__(self, quant_rate: float = 0.01, min_token_len: int = 2):
        super().__init__()
        self.quant_rate = quant_rate
        self.min_token_len = min_token_len

    def profile(self, content: str) -> str:
        counts: dict[str, int] = {}
        max_freq = 0
        cur: list[str] = []

        def flush():
            nonlocal max_freq
            if len(cur) > self.min_token_len:  # strictly longer
                s = "".join(cur)
                counts[s] = counts.get(s, 0) + 1
                max_freq = max(max_freq, counts[s])
            cur.clear()

        # Character.isLetterOrDigit = category L* or Nd (Python isalnum
        # also accepts No/Nl numerics, which Java treats as delimiters)
        import unicodedata
        for ch in content:
            if ch.isalpha() or unicodedata.category(ch) == "Nd":
                cur.append(ch.lower())
            else:
                flush()
        flush()
        # QUANT = Math.round(maxFreq * quantRate), clamped
        quant = int(max_freq * self.quant_rate + 0.5)
        if quant < 2:
            quant = 2 if max_freq > 1 else 1
        profile = []
        for tok in _java_hashmap_order(list(counts)):
            cnt = (counts[tok] // quant) * quant
            if cnt >= quant:
                profile.append((tok, cnt))
        profile.sort(key=lambda t: -t[1])  # stable: HashMap-order ties
        return "\n".join(f"{tok} {cnt}" for tok, cnt in profile)

    def add(self, content: str) -> None:
        super().add(self.profile(content))


_SIG_CLASSES = {"md5": MD5Signature, "lookup3": Lookup3Signature,
                "textprofile": TextProfileSignature}


def signature_hex(doc: dict[str, object], fields: list[str] | None = None,
                  signature_class: str = "md5", **params) -> str:
    """Scalar twin of processAdd's signature computation: fields sorted,
    ``add(fieldName); add(str(value))`` per present field, hex output
    (SignatureUpdateProcessorFactory.java:138-185)."""
    names = sorted(fields) if fields else sorted(doc)
    sig = _SIG_CLASSES[signature_class](**params)
    for name in names:
        if name in doc and doc[name] is not None:
            sig.add(name)
            val = doc[name]
            if isinstance(val, (list, tuple)):
                for v in val:
                    sig.add(str(v))
            else:
                sig.add(str(val))
    return sig.get_signature().hex()


def compute_signatures(df: DataFrame, fields: list[str],
                       signature_class: str = "md5",
                       signature_field: str = "signatureField",
                       **params) -> DataFrame:
    """Add the hex signature column.

    md5 stays fully JVM-side (``md5(concat(fieldName, value, ...))`` in
    sorted field order — codegen, zero Python); lookup3 / textprofile
    run as one Arrow-batched kernel over the selected columns (narrow,
    no shuffle)."""
    names = sorted(fields)
    if signature_class == "md5":
        # null fields are SKIPPED (neither name nor value feeds the
        # digest), like the scalar twin and processAdd's f != null
        # guard — a bare concat would instead null the whole signature.
        # Multi-valued fields feed each element separately (ADVICE r5:
        # SignatureUpdateProcessorFactory.java:166-171 adds every
        # collection element; a bare cast would digest Spark's '[a, b]'
        # rendering and diverge from the scalar twin).
        from pyspark.sql import types as T
        dtypes = {f.name: f.dataType for f in df.schema.fields}

        def value_str(name):
            c = F.col(name)
            if isinstance(dtypes.get(name), T.ArrayType):
                return F.array_join(
                    F.transform(c, lambda x: F.coalesce(
                        x.cast("string"), F.lit("None"))), "")
            return c.cast("string")

        parts = [F.when(F.col(name).isNotNull(),
                        F.concat(F.lit(name), value_str(name)))
                 .otherwise(F.lit(""))
                 for name in names]
        return df.withColumn(signature_field,
                             F.md5(F.concat(*parts)))

    def _kernel(pdfs):
        import numpy as np
        for pdf in pdfs:
            sigs = []
            cols = [pdf[n] for n in names]
            for vals in zip(*cols):
                sig = _SIG_CLASSES[signature_class](**params)
                for name, v in zip(names, vals):
                    if v is None:
                        continue
                    sig.add(name)
                    # multi-valued fields: each element separately, the
                    # scalar twin's isinstance branch (ADVICE r5)
                    if isinstance(v, (list, tuple, np.ndarray)):
                        for x in v:
                            sig.add(str(x))
                    else:
                        sig.add(str(v))
                sigs.append(sig.get_signature().hex())
            out = pdf.copy()
            out[signature_field] = pd.array(sigs, dtype="string")
            yield out

    from pyspark.sql import types as T
    schema = T.StructType(df.schema.fields
                          + [T.StructField(signature_field, T.StringType())])
    return df.mapInPandas(_kernel, schema)


def dedup_by_signature(df: DataFrame, signature_field: str = "signatureField",
                       order_col: str = "doc_id") -> DataFrame:
    """overwriteDupes semantics: the add's updateTerm deletes any doc
    with the same signature, so the LAST write wins.  One map-side-
    combinable max_by per signature."""
    others = [c for c in df.columns if c != signature_field]
    keep = (df.groupBy(signature_field)
            .agg(F.max_by(F.struct(*others), F.col(order_col)).alias("_w")))
    return keep.select(signature_field, *[F.col(f"_w.{c}").alias(c)
                                          for c in others])
