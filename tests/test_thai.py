"""Thai word segmentation + ThaiAnalyzer parity tests.

Goldens come from two sources:

* tests/data/thai_fuzz.json.gz — 2,500 strings (dictionary-word
  concatenations, random Thai runs, special-char injections ฯ/ๆ/ฤๅ/ฦๅ,
  truncated words, mixed Thai/Latin/digit text) with boundary lists
  produced by the live JVM ``BreakIterator.getWordInstance(new
  Locale("th"))`` — the exact object the reference's ThaiWordFilter
  wraps (ThaiWordFilter.java:52).  The full 44k-case run at generation
  time had 0 mismatches; this is the committed sample.
* the reference's own TestThaiAnalyzer vectors
  (analysis/common/src/test/org/apache/lucene/analysis/th/
  TestThaiAnalyzer.java:50-132, current-version cases).
"""
from __future__ import annotations

import gzip
import json
import os

import pytest

from lucene_solr_1_spark.analysis.thai import (
    THAI_STOP_WORDS,
    is_thai_token,
    thai_analyze,
    thai_breaks,
    thai_segments,
    thai_word_tokens,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "thai_fuzz.json.gz")


def test_jvm_fuzz_parity():
    with gzip.open(DATA, "rt", encoding="utf-8") as f:
        cases = json.load(f)
    assert len(cases) == 2500
    bad = []
    for text, golden in cases:
        b = thai_breaks(text)
        mine = ",".join(f"{s}-{e}" for s, e in zip(b, b[1:]))
        if mine != golden:
            bad.append((text, golden, mine))
    assert not bad, bad[:5]


def test_reference_simple_sentence():
    # TestThaiAnalyzer.java:50-51 (empty stop set)
    assert thai_analyze("การที่ได้ต้องแสดงว่างานดี", stopwords=None) == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_reference_default_stopwords():
    # TestThaiAnalyzer.java:57-58 (default Thai stop set since 3.6)
    assert thai_analyze("การที่ได้ต้องแสดงว่างานดี") == ["แสดง", "งาน", "ดี"]
    for w in ("การ", "ที่", "ได้", "ต้อง", "ว่า"):
        assert w in THAI_STOP_WORDS


def test_reference_mixed_latin():
    # TestThaiAnalyzer.java:147-150 (current version: UAX#29 tokenizer)
    assert thai_analyze("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com",
                        stopwords=None) == [
        "บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"]


def test_reference_thai_digits():
    # TestThaiAnalyzer.java:72-74: Thai numerals stay one <ALPHANUM> run
    assert thai_analyze("การที่ได้ต้องแสดงว่างานดี ๑๒๓", stopwords=None) == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี", "๑๒๓"]


def test_reference_english_stopset_adjacent():
    # TestThaiAnalyzer.java:124-132: english stop set, stopword adjacent
    # to thai text with no whitespace
    eng = frozenset({"the", "a", "an", "of"})
    assert thai_analyze("การที่ได้ต้อง the แสดงว่างานดี", stopwords=eng) == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
    assert thai_analyze("การที่ได้ต้องthe แสดงว่างานดี", stopwords=eng) == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_word_filter_gate():
    # ThaiWordFilter.java:105: only tokens whose FIRST char is Thai
    assert is_thai_token("ไทย") and not is_thai_token("abc")
    assert thai_word_tokens(["hello", "ภาษาไทย"]) == ["hello", "ภาษา", "ไทย"]


def test_segments_roundtrip():
    s = "การที่ได้ต้องแสดงว่างานดี"
    segs = thai_segments(s)
    assert "".join(segs) == s
    assert segs == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_empty_and_non_thai():
    assert thai_breaks("") == [0]
    assert thai_analyze("", stopwords=None) == []
    assert thai_analyze("plain english text", stopwords=None) == [
        "plain", "english", "text"]
