"""Classic n-gram SpellChecker twin (solr/ngram_spell.py)."""

from __future__ import annotations

import pytest

from lucene_solr_1_spark.solr.ngram_spell import (
    form_grams, get_max_gram, get_min_gram, spell_gram_table,
    suggest_similar)


def test_gram_bands():
    # SpellChecker.java:555-573
    assert (get_min_gram(4), get_max_gram(4)) == (1, 2)
    assert (get_min_gram(5), get_max_gram(5)) == (2, 3)
    assert (get_min_gram(6), get_max_gram(6)) == (3, 4)
    assert (get_min_gram(12), get_max_gram(12)) == (3, 4)
    assert form_grams("word", 2) == ["wo", "or", "rd"]
    assert form_grams("ab", 3) == []


@pytest.fixture(scope="module")
def dictionary(spark):
    rows = [("working", 10), ("works", 8), ("word", 20), ("world", 15),
            ("sword", 3), ("wording", 2), ("apple", 5), ("zzz", 1)]
    return spark.createDataFrame(rows, "term string, df long")


def test_gram_table_layout(spark, dictionary):
    gt = spell_gram_table(dictionary).toPandas()
    # 'word' (len 4): bands 1..2 only
    w = gt[gt.term == "word"]
    assert set(w.ng) == {1, 2}
    g2 = w[w.ng == 2]
    assert list(g2.gram) == ["wo", "or", "rd"]
    assert list(g2.is_start) == [True, False, False]
    assert list(g2.is_end) == [False, False, True]
    # 'working' (len 7): bands 3..4 only
    assert set(gt[gt.term == "working"].ng) == {3, 4}
    # single-gram case: a full-length gram is both start AND end
    z3 = gt[(gt.term == "zzz") & (gt.ng == 2)]
    assert len(z3) == 2


def test_when_not_in_index_short_circuits(spark, dictionary):
    got = suggest_similar(spark, dictionary, "word", num_sug=3)
    assert [d["word"] for d in got] == ["word"]


def test_suggest_ranks_by_distance_then_freq(spark, dictionary):
    got = suggest_similar(spark, dictionary, "wird", num_sug=3,
                          suggest_mode="always")
    # levenstein('wird','word') = 1 - 1/4 = 0.75 is the best correction
    assert got[0]["word"] == "word"
    assert got[0]["score"] == pytest.approx(0.75)
    # everything returned clears the 0.5 accuracy bar
    assert all(d["score"] >= 0.5 for d in got)


def test_suggest_long_word_band(spark, dictionary):
    got = suggest_similar(spark, dictionary, "workng", num_sug=3,
                          suggest_mode="always")
    assert "working" in [d["word"] for d in got]


def test_more_popular_mode(spark, dictionary):
    # 'sword' (df 3): suggestions must be strictly more frequent
    got = suggest_similar(spark, dictionary, "sword", num_sug=5,
                          suggest_mode="more_popular")
    assert all(d["freq"] > 3 for d in got)
    assert all(d["word"] != "sword" for d in got)


def test_accuracy_filter(spark, dictionary):
    got = suggest_similar(spark, dictionary, "wird", num_sug=10,
                          suggest_mode="always", accuracy=0.76)
    assert got == []  # best candidate scores 0.75 < 0.76


def test_batch_matches_single_word_api(spark, dictionary):
    from lucene_solr_1_spark.solr.ngram_spell import suggest_similar_batch
    words = ["wird", "workng", "word", "qqqq"]
    batch = suggest_similar_batch(spark, dictionary, words,
                                  suggest_mode="always")
    # 'word' under ALWAYS mode is not short-circuited
    for w in words:
        single = suggest_similar(spark, dictionary, w, num_sug=5,
                                 suggest_mode="always")
        assert batch[w] == single, w


def test_batch_when_not_in_index_short_circuit(spark, dictionary):
    from lucene_solr_1_spark.solr.ngram_spell import suggest_similar_batch
    batch = suggest_similar_batch(spark, dictionary, ["word", "wird"])
    assert batch["word"] == [{"word": "word", "score": 1.0, "freq": 20}]
    assert batch["wird"][0]["word"] == "word"
