"""Algorithmic Japanese filter tests — vectors from the reference's
TestJapaneseIterationMarkCharFilter.java:59-127 and
TestJapaneseKatakanaStemFilter.java."""
from __future__ import annotations

from lucene_solr_1_spark.analysis.ja_filters import (
    iteration_mark_normalize,
    katakana_stem,
)


def test_iteration_marks_kanji():
    assert iteration_mark_normalize("時々") == "時時"
    assert iteration_mark_normalize("馬鹿々々しい") == "馬鹿馬鹿しい"


def test_iteration_marks_katakana():
    assert iteration_mark_normalize("ミスヾ") == "ミスズ"


def test_iteration_marks_hiragana():
    assert iteration_mark_normalize("おゝの") == "おおの"
    assert iteration_mark_normalize("みすゞ") == "みすず"
    assert iteration_mark_normalize("じゞ") == "じじ"
    assert iteration_mark_normalize("じゝ") == "じし"
    assert iteration_mark_normalize("ところゞゝゝ") == "ところどころ"


def test_iteration_marks_malformed():
    # java:96-120 — exact pass-through semantics for illegal spans
    assert iteration_mark_normalize("abcところゝゝゝゝ") == "abcところcところ"
    assert iteration_mark_normalize("abcところゞゝゝゝ") == "abcところcところ"
    assert iteration_mark_normalize("ところゞゝゝゞゝゞ") == "ところどころゞゝゞ"
    assert iteration_mark_normalize("々") == "々"
    assert iteration_mark_normalize("ゞ") == "ゞ"
    assert iteration_mark_normalize("ゞゝ") == "ゞゝ"
    assert iteration_mark_normalize("。ゝ") == "。ゝ"
    assert iteration_mark_normalize("。。ゝゝ") == "。。ゝゝ"
    assert iteration_mark_normalize("？ゝ") == "？？"
    assert iteration_mark_normalize("ねやぽゞつむぴ") == "ねやぽぽつむぴ"
    assert iteration_mark_normalize("ねやぽゝつむぴ") == "ねやぽぽつむぴ"


def test_iteration_marks_empty_and_flags():
    assert iteration_mark_normalize("") == ""
    # kanji-only mode leaves kana marks alone and vice versa
    assert iteration_mark_normalize("時々", normalize_kanji=False) == "時々"
    assert iteration_mark_normalize("みすゞ", normalize_kana=False) == "みすゞ"


def test_katakana_stem():
    # TestJapaneseKatakanaStemFilter semantics
    assert katakana_stem("コンピューター") == "コンピューター"[:-1]
    assert katakana_stem("コーヒー") == "コーヒ"
    assert katakana_stem("タクシー") == "タクシ"
    # too short: unchanged (min length 4 counts the mark)
    assert katakana_stem("パーティー")[-1] != "ー"
    assert katakana_stem("カー") == "カー"
    assert katakana_stem("センター") == "センタ"
    # non-katakana or mixed: unchanged
    assert katakana_stem("abcー") == "abcー"
    assert katakana_stem("寿司ー") == "寿司ー"
    # no trailing mark: unchanged
    assert katakana_stem("コンピュータ") == "コンピュータ"
