"""Script-normalizer tests — vectors copied from the reference's own
TestArabicNormalizationFilter / TestPersianNormalizationFilter /
TestHindiNormalizer / TestIndicNormalizer / TestIrishLowerCaseFilter."""
from __future__ import annotations

from lucene_solr_1_spark.analysis.normalizers import (
    arabic_normalize,
    hindi_normalize,
    indic_normalize,
    irish_lowercase,
    keyword_repeat,
    limit_token_position,
    persian_normalize,
)


def test_arabic():
    cases = [
        ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"),
        ("بنى", "بني"), ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"),
        ("مَبنا", "مبنا"), ("علِي", "علي"), ("بُوات", "بوات"),
        ("ولداً", "ولدا"), ("ولدٍ", "ولد"), ("ولدٌ", "ولد"),
        ("نلْسون", "نلسون"), ("هتميّ", "هتمي"),
    ]
    for inp, exp in cases:
        assert arabic_normalize(inp) == exp, (inp, arabic_normalize(inp), exp)


def test_persian():
    cases = [
        ("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
        ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"), ("زادہ", "زاده"),
    ]
    for inp, exp in cases:
        assert persian_normalize(inp) == exp, (inp, persian_normalize(inp), exp)


def test_hindi():
    cases = [
        ("अँगरेज़ी", "अंगरेजि"), ("अँगरेजी", "अंगरेजि"),
        ("अँग्रेज़ी", "अंगरेजि"), ("अँग्रेजी", "अंगरेजि"),
        ("अंगरेज़ी", "अंगरेजि"), ("अंगरेजी", "अंगरेजि"),
        ("अंग्रेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
        ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("क़र्ज़", "करज"),
        ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
        ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
        ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
        ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
    ]
    for inp, exp in cases:
        assert hindi_normalize(inp) == exp, (inp, hindi_normalize(inp), exp)


def test_indic():
    cases = [
        ("अाॅअाॅ", "ऑऑ"), ("अाॆअाॆ", "ऒऒ"), ("अाेअाे", "ओओ"),
        ("अाैअाै", "औऔ"), ("अाअा", "आआ"), ("अाैर", "और"),
        ("ত্‍", "ৎ"),  # bengali khanda-ta via ZWJ rule
    ]
    for inp, exp in cases:
        assert indic_normalize(inp) == exp, (inp, indic_normalize(inp), exp)


def test_irish_lowercase():
    # TestIrishLowerCaseFilter.java:41-44
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"
    assert irish_lowercase("Teanga") == "teanga"


def test_keyword_repeat_and_limit():
    stem = lambda t: t.rstrip("s")
    assert keyword_repeat(["dogs", "run"], stem) == ["dogs", "dog", "run"]
    assert limit_token_position(list("abcde"), 3) == ["a", "b", "c"]
