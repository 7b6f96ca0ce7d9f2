"""SmartChineseAnalyzer (smartcn) twin tests.

Goldens come from the reference's own TestSmartChineseAnalyzer.java
(line refs in cases below).  The bigram dictionary is absent from the
snapshot (all transitions take the unseen-bigram smoothing branch —
see analysis/smartcn.py docstring); every golden here passes anyway.
"""
from __future__ import annotations

from lucene_solr_1_spark.analysis.smartcn import (
    _dict,
    default_stopwords,
    get_char_type,
    segment_sentence,
    smartcn_tokenize,
    smartcn_tokenize_df,
    split_sentences,
    HANZI, LETTER, DIGIT, DELIMITER, SPACE_LIKE, FULLWIDTH_LETTER,
    FULLWIDTH_DIGIT, OTHER,
)


def test_dictionary_loads():
    wd = _dict()
    # 6768 GB2312 hanzi minus a few unmapped slots
    assert len(wd.table) > 6000
    assert wd.get_frequency("我") > 10000
    assert wd.get_frequency("购买") > 0
    assert wd.get_frequency("不存在词") == 0
    # prefix-match semantics: 道具 extends from 道
    assert wd.get_prefix_match("道具") != -1
    i = wd.get_prefix_match("道具")
    assert wd.is_equal("道具", i) or wd.table["道"][0][i].startswith("具")


def test_char_types():
    assert get_char_type("我") == HANZI
    assert get_char_type("a") == LETTER
    assert get_char_type("7") == DIGIT
    assert get_char_type("，") == DELIMITER
    assert get_char_type(" ") == SPACE_LIKE
    assert get_char_type("　") == SPACE_LIKE  # ideographic space
    assert get_char_type("Ｔ") == FULLWIDTH_LETTER
    assert get_char_type("１") == FULLWIDTH_DIGIT
    # € (U+20AC) falls in the reference's [0x2010,0x2642] DELIMITER range
    assert get_char_type("€") == DELIMITER
    assert get_char_type("あ") == OTHER  # hiragana is outside every range


def test_reference_goldens():
    # TestSmartChineseAnalyzer.java:38-129
    assert smartcn_tokenize("我购买了道具和服装。") == \
        ["我", "购买", "了", "道具", "和", "服装"]
    # two sentences (java:52-54)
    assert smartcn_tokenize("我购买了道具和服装。 我购买了道具和服装。") == \
        ["我", "购买", "了", "道具", "和", "服装"] * 2
    # ideographic space separator (java:63-65)
    assert smartcn_tokenize("我购买了道具和服装　我购买了道具和服装。") == \
        ["我", "购买", "了", "道具", "和", "服装"] * 2
    # no stopwords: trailing full stop folds to comma (java:79)
    assert smartcn_tokenize("我购买了道具和服装。", use_stopwords=False) == \
        ["我", "购买", "了", "道具", "和", "服装", ","]
    # mixed latin + porter stemming (java:111-112)
    assert smartcn_tokenize("我购买 Tests 了道具和服装", stem_english=True) == \
        ["我", "购买", "test", "了", "道具", "和", "服装"]
    # numerics (java:119-120)
    assert smartcn_tokenize("我购买 Tests 了道具和服装1234", stem_english=True) == \
        ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]
    # fullwidth folding (java:127-128)
    assert smartcn_tokenize("我购买 Ｔｅｓｔｓ 了道具和服装１２３４",
                            stem_english=True) == \
        ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]


def test_sentence_split():
    parts = split_sentences("我购买了道具和服装。 我购买了道具和服装。")
    assert len(parts) == 2
    assert parts[0][0].endswith("。")


def test_segment_tiles_input():
    import random
    rng = random.Random(7)
    pools = ["我购买了道具和服装北京大学", "abcXYZ", "0123", "。，！"]
    for _ in range(100):
        s = "".join(rng.choice(rng.choice(pools))
                    for _ in range(rng.randint(1, 30)))
        toks = segment_sentence(s)
        # offsets tile the non-space portion of the sentence
        cursor = 0
        for t in toks:
            assert t.start >= cursor
            assert t.end > t.start
            cursor = t.end
        assert cursor <= len(s)


def test_stopwords_loaded():
    # the reference's default list is punctuation-only (52 entries)
    stop = default_stopwords()
    assert "," in stop and "。" in stop and len(stop) >= 50


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [("a", "我购买了道具和服装。"), ("b", None)], ["id", "text"])
    out = {r["id"]: r["zh_tokens"]
           for r in smartcn_tokenize_df(df, "text").collect()}
    assert out["a"] == ["我", "购买", "了", "道具", "和", "服装"]
    assert out["b"] == []
