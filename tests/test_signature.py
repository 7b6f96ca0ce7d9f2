"""SignatureUpdateProcessor twins (solr/signature.py).

lookup3ycs64 is pinned through the reference's own TestHash.java
strategy: the 11 published lookup3.c "hello world" prefix vectors pin
a test-local lookup3 port, and the ycs64 low-32 bits must equal
lookup3 with the -(len<<2) bias (Hash.java:243-248 equivalence).
"""

from __future__ import annotations

import hashlib
import random

import pytest

from lucene_solr_1_spark.solr.signature import (
    Lookup3Signature, MD5Signature, TextProfileSignature,
    _java_hashmap_order, _java_string_hash, compute_signatures,
    dedup_by_signature, lookup3ycs64, signature_hex)

_M32 = 0xFFFFFFFF


def _rotl(x, n):
    return ((x << n) | (x >> (32 - n))) & _M32


def _lookup3(k: list[int], initval: int) -> int:
    """Test-local port of Hash.lookup3 (the hashword C variant WITH the
    (length<<2) seed term) — the oracle for the ycs64 equivalence."""
    a = b = c = (0xDEADBEEF + (len(k) << 2) + initval) & _M32
    i, length = 0, len(k)
    while length > 3:
        a = (a + k[i]) & _M32
        b = (b + k[i + 1]) & _M32
        c = (c + k[i + 2]) & _M32
        a = (a - c) & _M32; a ^= _rotl(c, 4);  c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rotl(a, 6);  a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rotl(b, 8);  b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rotl(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rotl(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rotl(b, 4);  b = (b + a) & _M32
        length -= 3
        i += 3
    if length:
        if length == 3:
            c = (c + k[i + 2]) & _M32
        if length >= 2:
            b = (b + k[i + 1]) & _M32
        a = (a + k[i]) & _M32
        c ^= b; c = (c - _rotl(b, 14)) & _M32
        a ^= c; a = (a - _rotl(c, 11)) & _M32
        b ^= a; b = (b - _rotl(a, 25)) & _M32
        c ^= b; c = (c - _rotl(b, 16)) & _M32
        a ^= c; a = (a - _rotl(c, 4)) & _M32
        b ^= a; b = (b - _rotl(a, 14)) & _M32
        c ^= b; c = (c - _rotl(b, 24)) & _M32
    return c


def test_lookup3_c_vectors():
    """The lookup3.c hashword outputs published in TestHash.java:31."""
    hashes = [0xC4C20DD5, 0x3AB04CC3, 0xEBE874A3, 0x0E770EF3, 0xEC321498,
              0x73845E86, 0x8A2DB728, 0x03C313BB, 0xFE5B9199, 0x95965125,
              0xCBC4E7C2]
    s = "hello world"
    for i in range(len(s)):
        k = [ord(ch) for ch in s[: i + 1]]
        assert _lookup3(k, (i * 12345) & _M32) == hashes[i], i


def test_ycs64_low32_equals_lookup3():
    """tstEquiv (TestHash.java:60-69): (int)lookup3ycs64(s, seed) ==
    lookup3(codepoints, seed - (len<<2))."""
    rng = random.Random(42)
    for _ in range(500):
        n = rng.randint(0, 20)
        cps = []
        while len(cps) < n:
            cp = rng.randint(0, 0x10FFFF)
            if (cp & 0xF800) == 0xD800:
                continue
            cps.append(cp)
        s = "".join(chr(c) for c in cps)
        # int seeds: the tstEquiv identity assumes the high word of
        # initval is 0 (ycs64 folds initval>>>32 into c)
        seed = rng.randint(0, 2**31 - 1)
        low32 = lookup3ycs64(s, seed) & _M32
        assert low32 == _lookup3(cps, (seed - (n << 2)) & _M32)


def test_lookup3_signature_chains():
    sig = Lookup3Signature()
    sig.add("hello")
    sig.add("world")
    h = lookup3ycs64("world", lookup3ycs64("hello", 0))
    assert sig.get_signature() == h.to_bytes(8, "big")
    assert len(sig.get_signature().hex()) == 16


def test_md5_signature_concatenates():
    sig = MD5Signature()
    sig.add("text")
    sig.add("hello")
    assert sig.get_signature() == hashlib.md5(b"texthello").digest()


def test_java_string_hash():
    # String.hashCode("one") = 110182 etc. — classic 31-polynomial
    assert _java_string_hash("one") == 110182
    assert _java_string_hash("") == 0
    # surrogate-pair handling: hash over UTF-16 units
    gclef = "\U0001D11E"
    assert _java_string_hash(gclef) == (31 * 0xD834 + 0xDD1E) & _M32


def test_text_profile_quantization():
    tp = TextProfileSignature()
    # aaa x2, bbbb x1, ccc x1; 'dd' dropped (strictly longer than 2);
    # maxFreq 2 -> quant 2 -> freq-1 tokens discarded
    assert tp.profile("aaa bbbb aaa ccc dd") == "aaa 2"
    # all freq 1 -> quant 1 -> all kept, HashMap iteration order:
    # spread-hash buckets six(3) one(7) ten(12) two(13) in a cap-16 map
    assert tp.profile("one two six ten") == "six 1\none 1\nten 1\ntwo 1"
    # non-alnum split + lowercase; unicode No numerics ('½') are
    # delimiters in Java isLetterOrDigit — foo/bar each occur twice
    assert tp.profile("Foo-bar! foo½bar") == "bar 2\nfoo 2"
    assert tp.profile("FooFoo, fooFOO") == "foofoo 2"


def test_text_profile_hashmap_tie_order_beyond_resize():
    # 13 distinct tokens forces the Java map to capacity 32
    toks = [f"tok{i:02d}" for i in range(13)]
    order = _java_hashmap_order(toks)
    assert sorted(order) == sorted(toks)
    spread = [(_java_string_hash(t) ^ (_java_string_hash(t) >> 16)) & 31
              for t in order]
    assert spread == sorted(spread)


def test_signature_hex_sorts_fields_and_adds_names():
    doc = {"text": "hello", "lang": "en"}
    got = signature_hex(doc, ["text", "lang"], "md5")
    assert got == hashlib.md5(b"langentexthello").hexdigest()
    # missing field skipped, collection values added element-wise
    doc2 = {"tags": ["a", "b"], "text": "x"}
    got2 = signature_hex(doc2, ["tags", "text", "absent"], "md5")
    assert got2 == hashlib.md5(b"tagsabtextx").hexdigest()


def test_compute_signatures_md5_matches_scalar(spark):
    rows = [(1, "en", "hello world"), (2, "de", "hallo welt"),
            (3, "en", "hello world")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r["signatureField"]
           for r in compute_signatures(df, ["text", "lang"]).collect()}
    for did, lang, text in rows:
        assert out[did] == signature_hex({"lang": lang, "text": text},
                                         ["text", "lang"])
    assert out[1] == out[3] != out[2]


def test_compute_signatures_textprofile_kernel_matches_scalar(spark):
    rows = [(1, "aaa bbbb aaa ccc dd"), (2, "one two six ten"),
            (3, "x y z"), (4, "aaa bbbb aaa ccc dd extra aaa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["signatureField"]
           for r in compute_signatures(df, ["text"],
                                       "textprofile").collect()}
    for did, text in rows:
        assert got[did] == signature_hex({"text": text}, ["text"],
                                         "textprofile")


def test_dedup_by_signature_last_wins(spark):
    rows = [(1, "en", "same"), (2, "en", "same"), (3, "en", "other")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    sigs = compute_signatures(df, ["text", "lang"])
    kept = dedup_by_signature(sigs).collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [2, 3]  # overwriteDupes: last write wins


def test_compute_signatures_md5_skips_null_fields(spark):
    rows = [(1, None, "hello"), (2, "en", None), (3, None, None),
            (4, "en", "hello")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["signatureField"]
           for r in compute_signatures(df, ["text", "lang"]).collect()}
    # parity with the scalar twin, which skips absent/null fields
    assert got[1] == signature_hex({"text": "hello"}, ["text", "lang"])
    assert got[2] == signature_hex({"lang": "en"}, ["text", "lang"])
    assert got[3] == hashlib.md5(b"").hexdigest()
    # null-field docs must NOT collapse to one NULL signature
    assert len({got[1], got[2], got[3], got[4]}) == 4


def test_signature_all_fields_when_fields_unset():
    # SignatureUpdateProcessorFactory with no 'fields' param signs ALL
    # document fields in sorted name order
    # (SignatureUpdateProcessorFactoryTest.testDupeAllFieldsDetection)
    doc = {"b": "2", "a": "1", "c": "3"}
    got = signature_hex(doc)  # fields=None
    assert got == hashlib.md5(b"a1b2c3").hexdigest()


def test_multivalued_field_parity(spark):
    """ADVICE r5 (medium): multi-valued fields must feed each element
    separately in BOTH the md5 JVM path and the Arrow kernel, matching
    signature_hex / SignatureUpdateProcessorFactory.java:166-171."""
    rows = [(1, ["a", "b"], "x"), (2, ["ab"], "x"), (3, [], "x"),
            (4, None, "x")]
    df = spark.createDataFrame(
        rows, "doc_id long, tags array<string>, text string")
    for cls in ("md5", "lookup3"):
        got = {r["doc_id"]: r["signatureField"]
               for r in compute_signatures(
                   df, ["tags", "text"], signature_class=cls).collect()}
        for did, tags, text in rows:
            doc = {"text": text}
            if tags is not None:
                doc["tags"] = list(tags)
            want = signature_hex(doc, ["tags", "text"],
                                 signature_class=cls)
            assert got[did] == want, (cls, did, got[did], want)
    # ['a','b'] vs ['ab'] concatenate identically through the digest —
    # the reference's element-wise add has the same property
    md5 = {r["doc_id"]: r["signatureField"]
           for r in compute_signatures(df, ["tags", "text"]).collect()}
    assert md5[1] == md5[2]
