"""Multi-field indexing + field-qualified search (SURVEY §2 FieldInfos
data model; ref: lucene/core/.../index/FieldInfos.java,
document/Field.java, similarities/BM25Similarity.java:82-89 — per-field
CollectionStatistics).

Oracle: single-process NumPy BM25 with PER-FIELD norms and avgdl;
rank- and score-identity (bit-exact float32) against the distributed
engine, the TestBoolean2 pattern."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.analysis.standard import analyze_series
from lucene_solr_1_spark.index.build import FIELD_SEP, build_index, term_key
from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE, encode_norm
from lucene_solr_1_spark.search.bm25 import K1, B, idf as bm25_idf
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.queryparser import parse_query

VOCAB = ("merge join scan sort hash table filter group window spark "
         "query data row batch index shard").split()


def _mkdocs(n=400, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        t_len = int(rng.integers(2, 6))
        b_len = int(rng.integers(10, 60))
        title = " ".join(rng.choice(VOCAB, t_len))
        body = " ".join(rng.choice(VOCAB, b_len))
        rows.append((f"doc{i:08d}", title, body))
    return pd.DataFrame(rows, columns=["url", "title", "body"])


class FieldOracle:
    """Single-process mirror of the multi-field index: per-field postings,
    per-field norms/avgdl, docids = engine's hash-bucket scheme."""

    def __init__(self, docs: pd.DataFrame, num_segments: int):
        h = docs["url"].map(
            lambda u: int(hashlib.md5(u.encode()).hexdigest()[:15], 16))
        bucket = (h % num_segments).to_numpy()
        order = np.lexsort((docs["url"].to_numpy(), h.to_numpy(), bucket))
        ranks = np.zeros(len(docs), dtype=np.int64)
        for b in range(num_segments):
            sel = bucket[order] == b
            ranks[order[sel]] = np.arange(sel.sum())
        self.docids = (bucket.astype(np.int64) << 44) | ranks
        self.max_doc = len(docs)
        self.fields = {}
        self.postings: dict[str, tuple] = {}   # key -> (docid arr, tf arr, norm arr)
        for fld in ("title", "body"):
            toks = analyze_series(docs[fld])
            lens = toks.str.len().to_numpy(np.int64)
            norms = encode_norm(lens)
            self.fields[fld] = {"sum_ttf": int(lens.sum()),
                                "norms": norms}
            for i, ts in enumerate(toks):
                cnt: dict[str, int] = {}
                for t in ts:
                    cnt[t] = cnt.get(t, 0) + 1
                for t, tf in cnt.items():
                    key = term_key(fld, t)
                    self.postings.setdefault(key, []).append(
                        (self.docids[i], tf, norms[i]))
        for key, lst in self.postings.items():
            lst.sort()
            d = np.array([x[0] for x in lst], np.int64)
            tf = np.array([x[1] for x in lst], np.int64)
            nb = np.array([x[2] for x in lst], np.uint8)
            self.postings[key] = (d, tf, nb)

    def avgdl(self, fld: str) -> np.float32:
        return np.float32(np.float64(self.fields[fld]["sum_ttf"])
                          / np.float64(self.max_doc))

    def score_term(self, fld: str, term: str) -> dict[int, np.float32]:
        key = term_key(fld, term)
        if key not in self.postings:
            return {}
        d, tf, nb = self.postings[key]
        w = np.float32(bm25_idf(len(d), self.max_doc))
        wv = np.float32(w * np.float32(K1 + 1.0))
        dec = NORM_INV_TABLE.astype(np.float32)
        cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
                 + (np.float32(B) * dec) / self.avgdl(fld))).astype(np.float32)
        s = ((wv * tf.astype(np.float32))
             / (tf.astype(np.float32) + cache[nb])).astype(np.float32)
        return dict(zip(d.tolist(), s))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs_pdf = _mkdocs()
    root = os.path.join(str(tmp_path_factory.mktemp("mf")), "idx")
    paths = build_index(spark, spark.createDataFrame(docs_pdf), root,
                        num_segments=4, fields=["title", "body"])
    oracle = FieldOracle(docs_pdf, num_segments=4)
    return docs_pdf, oracle, IndexSearcher(spark, paths.root)


def _topk(scores: dict[int, np.float32], k: int) -> list[tuple]:
    items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return items


def test_per_field_norms_rank_identity(spark, built):
    """Same term, different fields: per-field df/avgdl/norms give
    different rankings; each must be bit-identical to the oracle."""
    _, oracle, searcher = built
    assert searcher.fields and set(searcher.fields) == {"title", "body"}
    for fld in ("title", "body"):
        exp = _topk(oracle.score_term(fld, "merge"), 10)
        got = searcher.search([searcher.term_key(fld, "merge")], k=10).toPandas()
        assert got["docid"].tolist() == [d for d, _ in exp]
        assert np.array_equal(got["score"].to_numpy(np.float32),
                              np.array([s for _, s in exp], np.float32))
    # the two fields genuinely rank differently (title is much shorter)
    t = searcher.search([searcher.term_key("title", "merge")], k=10).toPandas()
    b = searcher.search([searcher.term_key("body", "merge")], k=10).toPandas()
    assert t["docid"].tolist() != b["docid"].tolist()


def test_default_field_and_parser_qualifier(spark, built):
    _, oracle, searcher = built
    assert searcher.default_field == "body"
    # bare term == default-field term
    bare = searcher.search(["scan"], k=10).toPandas()
    qual = searcher.search([searcher.term_key("body", "scan")], k=10).toPandas()
    assert bare["docid"].tolist() == qual["docid"].tolist()
    # parser: field:term resolves; OR across fields scores per-field
    q = parse_query("title:merge body:scan", searcher)
    assert term_key("title", "merge") in q.should
    assert term_key("body", "scan") in q.should
    got = searcher.search(q).toPandas()
    exp: dict[int, np.float32] = {}
    st = oracle.score_term("title", "merge")
    sb = oracle.score_term("body", "scan")
    for d in set(st) | set(sb):
        # engine combine: left-to-right float32 add with 0.0f identity
        exp[d] = np.float32(st.get(d, np.float32(0.0))
                            + sb.get(d, np.float32(0.0)))
    expk = _topk(exp, 10)
    assert got["docid"].tolist() == [d for d, _ in expk]
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          np.array([s for _, s in expk], np.float32))


def test_dismax_fields(spark, built):
    """search_dismax: per-term max over fields + tiebreak, summed."""
    _, oracle, searcher = built
    tie = 0.3
    got = searcher.search_dismax("merge scan", ["title", "body"],
                                 tiebreak=tie, k=10).toPandas()
    exp: dict[int, np.float32] = {}
    for term in ("merge", "scan"):
        per = [oracle.score_term("title", term), oracle.score_term("body", term)]
        for d in set(per[0]) | set(per[1]):
            a = per[0].get(d, np.float32(0.0))
            b = per[1].get(d, np.float32(0.0))
            mx, mn = (a, b) if a >= b else (b, a)
            val = np.float32(mx + np.float32(np.float32(tie) * mn))
            exp[d] = np.float32(exp.get(d, np.float32(0.0)) + val)
    expk = _topk(exp, 10)
    assert got["docid"].tolist() == [d for d, _ in expk]


def test_stats_are_per_field(spark, built):
    _, oracle, searcher = built
    for fld in ("title", "body"):
        assert searcher.fields[fld]["sum_ttf"] == oracle.fields[fld]["sum_ttf"]
    assert (searcher._avgdl_for(term_key("title", "x"))
            != searcher._avgdl_for(term_key("body", "x")))


def test_edismax_parser_and_execution(spark, built):
    """dismax/edismax string entry point: qf boosts, tie, +/- and mm vs a
    brute-force oracle (DisMaxQParserPlugin semantics)."""
    from lucene_solr_1_spark.search.queryparser import parse_dismax, parse_qf
    _, oracle, searcher = built
    assert parse_qf("title^2 body") == {"title": 2.0, "body": 1.0}
    tie = 0.2
    q = parse_dismax("merge scan -window", searcher, qf="title^2 body",
                     tie=tie, k=10)
    assert q.should == ["merge", "scan"] and q.must_not == ["window"]
    got = q().toPandas()

    # brute force with boosts applied to weight_value (b*idf*(k1+1))
    def scored(fld, term, b):
        from lucene_solr_1_spark.search.bm25 import K1, B, idf as bm25_idf
        from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE
        from lucene_solr_1_spark.index.build import term_key
        key = term_key(fld, term)
        if key not in oracle.postings:
            return {}
        d, tf, nb = oracle.postings[key]
        w = np.float32(bm25_idf(len(d), oracle.max_doc))
        wv = np.float32(w * np.float32(K1 + 1.0))
        if b != 1.0:
            wv = np.float32(wv * np.float32(b))
        dec = NORM_INV_TABLE.astype(np.float32)
        cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
                 + (np.float32(B) * dec) / oracle.avgdl(fld))).astype(np.float32)
        s = ((wv * tf.astype(np.float32))
             / (tf.astype(np.float32) + cache[nb])).astype(np.float32)
        return dict(zip(d.tolist(), s))

    exp: dict[int, np.float32] = {}
    for term in ("merge", "scan"):
        pt = scored("title", term, 2.0)
        pb = scored("body", term, 1.0)
        for d in set(pt) | set(pb):
            a = pt.get(d, np.float32(0.0))
            b2 = pb.get(d, np.float32(0.0))
            mx, mn = (a, b2) if a >= b2 else (b2, a)
            val = np.float32(mx + np.float32(np.float32(tie) * mn))
            exp[d] = np.float32(exp.get(d, np.float32(0.0)) + val)
    # -window: excluded if window matches ANY field
    excl = set(scored("title", "window", 1.0)) | set(scored("body", "window", 1.0))
    exp = {d: s for d, s in exp.items() if d not in excl}
    expk = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got["docid"].tolist() == [d for d, _ in expk]
    # mm: requiring both optional clauses shrinks the result set
    q2 = parse_dismax("merge scan", searcher, qf="title body", mm=2, k=3000)
    both = q2().toPandas()
    one = parse_dismax("merge scan", searcher, qf="title body", mm=1, k=3000)().toPandas()
    assert len(both) < len(one)
    m_any = set(scored("title", "merge", 1.0)) | set(scored("body", "merge", 1.0))
    s_any = set(scored("title", "scan", 1.0)) | set(scored("body", "scan", 1.0))
    assert set(both["docid"]) == (m_any & s_any)


@pytest.fixture(scope="module")
def built_masked(spark, tmp_path_factory):
    """Parallel-field docs (the FieldMaskingSpanQuery javadoc shape):
    title and body are same-length token sequences, so cross-field
    position comparison is meaningful."""
    import random
    rnd = random.Random(5)
    first = ["amy", "bob", "carl", "dora", "evan", "faye"]
    last = ["jones", "smith", "wu", "ross", "king", "lane"]
    rows = []
    for i in range(60):
        n = rnd.randint(3, 7)
        rows.append((f"d{i}",
                     " ".join(rnd.choice(first) for _ in range(n)),
                     " ".join(rnd.choice(last) for _ in range(n))))
    pdf = pd.DataFrame(rows, columns=["url", "title", "body"])
    root = os.path.join(str(tmp_path_factory.mktemp("mfm")), "idx")
    paths = build_index(spark, spark.createDataFrame(pdf), root,
                        num_segments=2, fields=["title", "body"],
                        positions=True)
    return pdf, IndexSearcher(spark, paths.root)


def test_field_masking_span(spark, built_masked):
    """Masked cross-field span == brute force over the two fields'
    parallel positions, for adjacent (ordered, slop 0) and near
    (unordered, slop 1) compositions."""
    from lucene_solr_1_spark.analysis.standard import analyze_with_positions
    from lucene_solr_1_spark.search.phrase import (_phrase_freq,
                                                   field_masking_span)
    pdf, searcher = built_masked

    def brute(w1, w2, slop, ordered):
        out = set()
        for _, r in pdf.iterrows():
            t_toks, t_pos = analyze_with_positions(r["title"])
            b_toks, b_pos = analyze_with_positions(r["body"])
            pls = [np.array([p for t, p in zip(t_toks, t_pos) if t == w1],
                            dtype=np.int64),
                   np.array([p for t, p in zip(b_toks, b_pos) if t == w2],
                            dtype=np.int64)]
            if _phrase_freq(pls, slop, ordered) > 0:
                out.add(r["url"])
        return out

    # docid -> url via the docs table
    url_of = {r["docid"]: r["url"] for r in
              spark.read.parquet(searcher.paths.docs)
              .select("docid", "url").collect()}
    for (w1, w2, slop, ordered) in [("amy", "jones", 0, True),
                                    ("bob", "wu", 1, False),
                                    ("carl", "king", 2, True)]:
        got = field_masking_span(searcher, [("title", w1), ("body", w2)],
                                 slop=slop, ordered=ordered, k=100).toPandas()
        assert {url_of[d] for d in got["docid"]} == brute(w1, w2, slop, ordered)
