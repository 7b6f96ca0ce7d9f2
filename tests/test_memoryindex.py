"""MemoryIndex twin + percolation (search/memoryindex.py).

Reference semantics: lucene/memory/.../MemoryIndex.java — single-doc
index scored under DefaultSimilarity (docFreq in {0,1}, byte315 norms,
per-query queryNorm + coord).  Hand vectors below are computed from
the published formulas (DefaultSimilarity.java / TFIDFSimilarity
javadoc) independently of the implementation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_1_spark.search.memoryindex import (
    MemoryIndex, percolate, score_queries_batch)

C = 1.0 + math.log(0.5)  # idf of a present term: 1 + ln(maxDoc=1 / (df=1 + 1))


def mk(text: str, dtype=np.float32) -> MemoryIndex:
    mi = MemoryIndex(dtype=dtype)
    mi.add_field("text", text)
    return mi


# --------------------------------------------------------------------- norms


def test_norm_byte315_quantized_hand_values():
    # dl=5: 1/sqrt(5)=0.44721 -> e=-2, mantissa 1.7888 -> trunc 1.75 -> 0.4375
    assert mk("merge scan merge table hash")._norm("text") == 0.4375
    # dl=3: 0.57735 -> e=-1, m=1.1547 -> trunc 1.0 -> 0.5
    assert mk("merge scan table")._norm("text") == 0.5
    # dl=1 and dl=4 are exactly representable
    assert mk("merge")._norm("text") == 1.0
    assert mk("merge scan table hash")._norm("text") == 0.5
    # dl=9: 1/3 -> e=-2, m=1.3333 -> trunc 1.25 -> 0.3125
    assert mk("w1 w2 w3 w4 w5 w6 w7 w8 w9")._norm("text") == 0.3125


def test_stopwords_count_positions_not_tokens():
    # 'the'/'a' are analyzed away but keep position increments
    mi = mk("the a merge table hash")
    assert mi._norm("text") == 0.5  # dl = 3, not 5
    # raw positions preserved: table(3) hash(4) stay adjacent
    assert mi.search({"type": "phrase", "terms": ["table", "hash"]}) > 0.0


def test_stopword_hole_breaks_phrase():
    mi = mk("table the hash")
    assert mi.search({"type": "phrase", "terms": ["table", "hash"]}) == 0.0


def test_all_stopword_field_is_not_added():
    mi = mk("the a an and")
    assert mi._fields == {}
    assert mi.search({"type": "term", "term": "the"}) == 0.0


# ------------------------------------------------------------------- scoring


def test_term_score_hand_vector():
    mi = mk("merge scan merge table hash")
    got = mi.search({"type": "term", "term": "merge"})
    # sqrt(tf=2) * idf * norm  (queryNorm cancels one idf factor)
    assert got == pytest.approx(math.sqrt(2) * C * 0.4375, rel=1e-6)
    assert mi.search({"type": "term", "term": "zzz"}) == 0.0


def test_phrase_score_hand_vector():
    mi = mk("merge scan merge table hash")
    got = mi.search({"type": "phrase", "terms": ["table", "hash"]})
    # PhraseWeight idf = sum of per-term idfs = 2c; value = idf after norm
    assert got == pytest.approx(1.0 * (2 * C) * 0.4375, rel=1e-6)
    assert mi.search({"type": "phrase", "terms": ["hash", "table"]}) == 0.0


def test_bool_or_absent_clause_still_normalizes():
    mi = mk("merge scan merge table hash")
    got = mi.search({"type": "bool", "should": [
        {"type": "term", "term": "merge"}, {"type": "term", "term": "zzz"}]})
    # absent clause contributes idf=1.0 to sumOfSquaredWeights; coord 1/2
    exp = math.sqrt(2) * C * C / math.sqrt(C * C + 1.0) * 0.4375 * 0.5
    assert got == pytest.approx(exp, rel=1e-6)


def test_bool_and_hand_vector_and_must_semantics():
    mi = mk("merge scan merge table hash")
    got = mi.search({"type": "bool", "must": [
        {"type": "term", "term": "merge"}, {"type": "term", "term": "scan"}]})
    exp = (math.sqrt(2) + 1.0) * C * C / math.sqrt(2 * C * C) * 0.4375
    assert got == pytest.approx(exp, rel=1e-6)
    assert mi.search({"type": "bool", "must": [
        {"type": "term", "term": "merge"},
        {"type": "term", "term": "zzz"}]}) == 0.0


def test_bool_must_not():
    mi = mk("merge scan merge table hash")
    q = {"type": "bool", "must": [{"type": "term", "term": "merge"}],
         "must_not": [{"type": "term", "term": "scan"}]}
    assert mi.search(q) == 0.0
    mi2 = mk("merge table merge")
    # one scoring clause, coord(1,1)=1, queryNorm cancels an idf
    assert mi2.search(q) == pytest.approx(math.sqrt(2) * C * 0.5, rel=1e-6)


def test_single_clause_bool_rewrites_to_term():
    mi = mk("merge scan merge table hash")
    lone = mi.search({"type": "bool",
                      "should": [{"type": "term", "term": "merge"}]})
    assert lone == mi.search({"type": "term", "term": "merge"})


def test_append_field_with_gap():
    mi = MemoryIndex()
    mi.add_field("text", "merge table")
    mi.add_field("text", "hash scan", position_increment_gap=10)
    # dl = 4; appended stream starts past the gap — no false adjacency
    assert mi._norm("text") == 0.5
    assert mi.search({"type": "phrase", "terms": ["table", "hash"]}) == 0.0
    info = mi._fields["text"]
    assert info.positions["hash"] == [12]  # lastPosition(1) + gap(10) + 1
    assert info.positions["scan"] == [13]


def test_boost_multiplies_on_append():
    mi = MemoryIndex()
    mi.add_field("text", "merge", boost=2.0)
    mi.add_field("text", "scan", boost=3.0)
    assert mi._fields["text"].boost == pytest.approx(6.0)
    with pytest.raises(ValueError):
        mi.add_field("text", "x", boost=0.0)


def test_float32_vs_float64_rank_agreement():
    texts = ["merge scan merge", "merge table hash merge merge",
             "scan scan table hash join", "merge join table hash scan"]
    q = {"type": "bool", "should": [
        {"type": "term", "term": "merge"}, {"type": "term", "term": "scan"}]}
    for t in texts:
        s32 = mk(t, np.float32).search(q)
        s64 = mk(t, np.float64).search(q)
        assert s32 == pytest.approx(s64, rel=1e-5)


# ------------------------------------------------------- closed-form byte315


def test_duckdb_closed_form_norm_matches_smallfloat_exhaustively():
    """The contract oracle states byte315(1/sqrt(dl)) in SQL: CAST to
    REAL reproduces the float32 rounding, then the 2-explicit-mantissa-
    bit truncation is FLOOR((m-1)*4)/4.  Exhaustive for dl 1..10^6."""
    import duckdb
    from lucene_solr_1_spark.index.smallfloat import (
        byte315_to_float, encode_norm)
    got = duckdb.sql("""
        WITH dls AS (SELECT unnest(range(1, 1000001)) AS dl),
        x AS (SELECT dl, CAST(CAST(1.0/SQRT(CAST(dl AS DOUBLE)) AS REAL)
                         AS DOUBLE) AS xr FROM dls),
        e AS (SELECT dl, xr, FLOOR(LOG2(xr)) AS e FROM x)
        SELECT POW(2.0, e) * (1 + FLOOR((xr/POW(2.0, e) - 1)*4)/4) AS norm
        FROM e ORDER BY dl""").fetchnumpy()["norm"]
    dl = np.arange(1, 1000001)
    exp = byte315_to_float(encode_norm(dl)).astype(np.float64)
    assert np.array_equal(got, exp)


# ---------------------------------------------------------------- percolate


QUERIES = [
    ("q_term", {"type": "term", "term": "merge"}),
    ("q_or", {"type": "bool", "should": [
        {"type": "term", "term": "merge"}, {"type": "term", "term": "scan"}]}),
    ("q_and", {"type": "bool", "must": [
        {"type": "term", "term": "merge"}, {"type": "term", "term": "join"}]}),
    ("q_not", {"type": "bool", "must": [{"type": "term", "term": "merge"}],
               "must_not": [{"type": "term", "term": "scan"}]}),
    ("q_phrase", {"type": "phrase", "terms": ["table", "hash"]}),
]


def test_score_queries_batch_matches_driver_loop():
    import pandas as pd
    texts = ["merge scan merge table hash", "merge join table",
             "the a an", "table hash table hash merge",
             "scan join window", "merge merge merge"]
    ids = np.arange(len(texts), dtype=np.int64)
    got = score_queries_batch(ids, texts, QUERIES)
    rows = []
    for did, t in zip(ids, texts):
        mi = mk(t)
        for qid, spec in QUERIES:
            s = mi.search(spec)
            if s > 0:
                rows.append((did, qid, s))
    exp = pd.DataFrame(rows, columns=["doc_id", "query_id", "score"])
    assert len(got) == len(exp)
    assert np.array_equal(got["doc_id"].to_numpy(), exp["doc_id"].to_numpy())
    assert list(got["query_id"]) == list(exp["query_id"])
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_percolate_spark_parity_and_plan(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = percolate(docs, QUERIES)
    pdf = (out.orderBy("query_id", "doc_id")
              .toPandas())
    # driver-side ground truth through the scalar twin
    src = docs.select("doc_id", "text").toPandas()
    exp_rows = []
    for did, text in zip(src["doc_id"], src["text"]):
        mi = mk(text)
        for qid, spec in QUERIES:
            s = mi.search(spec)
            if s > 0:
                exp_rows.append((int(did), qid, s))
    exp_rows.sort(key=lambda r: (r[1], r[0]))
    assert len(pdf) == len(exp_rows) > 0
    assert pdf["doc_id"].tolist() == [r[0] for r in exp_rows]
    assert pdf["query_id"].tolist() == [r[1] for r in exp_rows]
    assert np.allclose(pdf["score"].to_numpy(),
                       np.array([r[2] for r in exp_rows]), rtol=1e-6)
    # scale shape: ONE narrow map over the scan — no Exchange before it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_percolate_contract_oracle_parity(spark):
    """The contract entry (DOUBLE + round-4) against its DuckDB oracle
    at sf0.001 — the same comparison the driver runs at sf0.01."""
    import duckdb
    from lucene_solr_1_spark.contract import make_oracle_sql, make_queries
    sf_dir = "/root/testdata/sf0.001"
    got = make_queries()["memory_percolate"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = con.execute(make_oracle_sql()["memory_percolate"]).df()
    assert len(got) == len(exp) > 0
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["query_id"].tolist() == exp["query_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_fast_kernel_bit_identical_to_scalar():
    from lucene_solr_1_spark.search.memoryindex import (
        score_queries_batch_fast)
    texts = ["merge scan merge table hash", "merge join table",
             "the a an", "", "table hash table hash merge",
             "scan join window", "merge merge merge",
             "hash table the merge", "x" * 300 + " merge table hash",
             "hash merge scan table hash join window group"]
    ids = np.arange(len(texts), dtype=np.int64) * 7 + 3
    for dt in (np.float32, np.float64):
        slow = score_queries_batch(ids, texts, QUERIES, dtype=dt)
        fast = score_queries_batch_fast(ids, texts, QUERIES, dtype=dt)
        assert len(slow) == len(fast)
        assert slow["doc_id"].tolist() == fast["doc_id"].tolist()
        assert list(slow["query_id"]) == list(fast["query_id"])
        assert np.array_equal(slow["score"].to_numpy(),
                              fast["score"].to_numpy())


def test_fast_kernel_phrase_at_position_zero():
    # rawpos-off shifting must not leak a phrase match across docs:
    # doc B starts with the phrase's SECOND word
    from lucene_solr_1_spark.search.memoryindex import (
        score_queries_batch_fast)
    texts = ["window table", "hash scan"]  # no cross-doc "table hash"
    ids = np.arange(2, dtype=np.int64)
    q = [("p", {"type": "phrase", "terms": ["table", "hash"]})]
    assert len(score_queries_batch_fast(ids, texts, q)) == 0
    texts2 = ["window table hash", "hash scan"]
    assert score_queries_batch_fast(
        ids, texts2, q)["doc_id"].tolist() == [0]


def test_bool_with_phrase_and_nested_clauses_parity():
    # clauses may be phrase specs (PhraseWeight in a BooleanQuery) and
    # single-clause bool chains unwrap recursively — both kernels agree
    from lucene_solr_1_spark.search.memoryindex import (
        score_queries_batch_fast)
    texts = ["merge scan table hash", "table hash", "scan only here"]
    ids = np.arange(3, dtype=np.int64)
    regs = [
        ("b1", {"type": "bool",
                "must": [{"type": "phrase", "terms": ["table", "hash"]}]}),
        ("b2", {"type": "bool",
                "should": [{"type": "phrase", "terms": ["table", "hash"]},
                           {"type": "term", "term": "scan"}]}),
        ("b3", {"type": "bool", "must": [{"type": "term", "term": "scan"}],
                "must_not": [{"type": "phrase",
                              "terms": ["table", "hash"]}]}),
        ("b4", {"type": "bool", "should": [
            {"type": "bool",
             "should": [{"type": "term", "term": "merge"}]}]}),
    ]
    for dt in (np.float32, np.float64):
        s = score_queries_batch(ids, texts, regs, dtype=dt)
        f = score_queries_batch_fast(ids, texts, regs, dtype=dt)
        assert s["doc_id"].tolist() == f["doc_id"].tolist()
        assert list(s["query_id"]) == list(f["query_id"])
        assert np.array_equal(s["score"].to_numpy(), f["score"].to_numpy())
    # b3: doc 2 has scan but no phrase -> matches; doc 0 excluded
    ids_b3 = [d for d, q in zip(s["doc_id"], s["query_id"]) if q == "b3"]
    assert ids_b3 == [2]


def test_sloppy_phrase_slop_parameter():
    from lucene_solr_1_spark.search.memoryindex import (
        score_queries_batch_fast)
    mi = mk("table scan hash merge")  # table..hash with one word between
    exact = {"type": "phrase", "terms": ["table", "hash"]}
    sloppy = {"type": "phrase", "terms": ["table", "hash"], "slop": 1}
    assert mi.search(exact) == 0.0
    s = mi.search(sloppy)
    # one windowed match: sqrt(1) * 2c * norm(dl=4)
    assert s == pytest.approx(1.0 * (2 * C) * 0.5, rel=1e-6)
    # slop inside a bool clause
    b = {"type": "bool", "must": [
        {"type": "phrase", "terms": ["table", "hash"], "slop": 1},
        {"type": "term", "term": "merge"}]}
    assert mi.search(b) > 0.0
    # fast kernel parity incl. slop
    texts = ["table scan hash merge", "table hash", "hash table",
             "table a b hash"]
    ids = np.arange(len(texts), dtype=np.int64)
    regs = [("sl1", sloppy), ("ex", exact), ("b", b),
            ("sl2", {"type": "phrase", "terms": ["table", "hash"],
                     "slop": 2})]
    for dt in (np.float32, np.float64):
        slow = score_queries_batch(ids, texts, regs, dtype=dt)
        fast = score_queries_batch_fast(ids, texts, regs, dtype=dt)
        assert slow["doc_id"].tolist() == fast["doc_id"].tolist()
        assert list(slow["query_id"]) == list(fast["query_id"])
        assert np.array_equal(slow["score"].to_numpy(),
                              fast["score"].to_numpy())


def test_sloppy_repeated_term_needs_distinct_positions():
    # a single 'data' occurrence must NOT satisfy both slots of
    # ["data", "data"] (SloppyPhraseScorer repeat-group behavior)
    from lucene_solr_1_spark.search.memoryindex import (
        score_queries_batch_fast)
    q = {"type": "phrase", "terms": ["data", "data"], "slop": 1}
    assert mk("data breach report").search(q) == 0.0
    assert mk("data data report").search(q) > 0.0
    texts = ["data breach report", "data data report", "data x data"]
    ids = np.arange(3, dtype=np.int64)
    for dt in (np.float32, np.float64):
        slow = score_queries_batch(ids, texts, [("r", q)], dtype=dt)
        fast = score_queries_batch_fast(ids, texts, [("r", q)], dtype=dt)
        assert slow["doc_id"].tolist() == fast["doc_id"].tolist() == [1, 2]
        assert np.array_equal(slow["score"].to_numpy(),
                              fast["score"].to_numpy())
