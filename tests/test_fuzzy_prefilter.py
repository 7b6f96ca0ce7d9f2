"""Fuzzy expansion pre-filter (search/queryparser.py::fuzzy_prefilter):
exact-superset property vs plain levenshtein over a real vocabulary, and
the >=10x evaluated-row reduction the VERDICT-r4 fix demands."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.search.queryparser import fuzzy_prefilter


@pytest.fixture(scope="module")
def vocab(spark):
    """A realistic 50k-word dictionary (the synthetic testdata corpus
    has a deliberately tiny vocabulary, so the ratio is measured on a
    deterministically generated word distribution instead): seeded
    syllable products with natural length spread 3-16 chars."""
    import numpy as np
    rng = np.random.default_rng(42)
    syl = ["ba", "co", "di", "er", "fu", "ga", "hi", "jo", "ku", "la",
           "me", "no", "pi", "qu", "ra", "se", "ti", "un", "vo", "wa",
           "x", "yz", "tion", "ing", "ment", "dis", "pre", "sta"]
    words = {"merge", "distribution", "quick"}
    while len(words) < 50_000:
        n = int(rng.integers(2, 6))
        words.add("".join(rng.choice(syl) for _ in range(n)))
    v = spark.createDataFrame([(w,) for w in sorted(words)],
                              "term string").cache()
    v.count()
    return v


@pytest.mark.parametrize("needle,k", [("merge", 2), ("distribution", 2),
                                      ("quick", 1)])
def test_prefilter_is_exact_superset(spark, vocab, needle, k):
    """Terms passing levenshtein <= k ALL pass the pre-filter — results
    with the pre-filter in front are byte-identical."""
    full = {r["term"] for r in vocab.filter(
        F.levenshtein("term", F.lit(needle)) <= k).collect()}
    pre = {r["term"] for r in vocab.filter(
        fuzzy_prefilter(F.col("term"), needle, k)).collect()}
    assert full <= pre, "pre-filter must never drop a true match"
    both = {r["term"] for r in
            vocab.filter(fuzzy_prefilter(F.col("term"), needle, k))
                 .filter(F.levenshtein("term", F.lit(needle)) <= k).collect()}
    assert both == full


def test_prefilter_prunes_10x(spark, vocab):
    """The levenshtein DP runs on >=10x fewer rows than the unfiltered
    scan (the crossJoin-every-term anti-pattern this replaces)."""
    total = vocab.count()
    for needle, k in (("merge", 2), ("distribution", 2)):
        evaluated = vocab.filter(
            fuzzy_prefilter(F.col("term"), needle, k)).count()
        assert evaluated * 10 <= total, \
            f"{needle}: {evaluated}/{total} rows reach the DP"


def test_fuzzy_like_this_unchanged(spark, tmp_root):
    """fuzzy_like_this_terms over the pre-filtered branches returns the
    same variants/boosts as brute force over the vocabulary."""
    import os

    import numpy as np
    from lucene_solr_1_spark.fixtures.webtext import gen_docs
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher
    from lucene_solr_1_spark.search.fuzzylikethis import \
        fuzzy_like_this_terms
    from lucene_solr_1_spark.fixtures.webtext import VOCAB
    root = os.path.join(tmp_root, "idx_flt_pre")
    docs_pdf = gen_docs(300)
    build_index(spark, spark.createDataFrame(docs_pdf), root, num_segments=3)
    searcher = IndexSearcher(spark, root)
    q1, q2 = str(VOCAB[0]), str(VOCAB[3])        # terms in the fixture vocab
    got = fuzzy_like_this_terms(searcher, [q1, q2], min_similarity=0.6)
    # brute-force oracle: python levenshtein over the full term dict
    ts = spark.read.parquet(searcher.paths.termstats).toPandas()

    def lev(a, b):
        m = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1,
                                       prev + (ca != cb))
        return int(m[-1])

    import math
    n_docs = searcher.max_doc
    by_q = {}
    for q in (q1, q2):
        vs = []
        for t in sorted(ts["term"]):
            d = lev(t, q)
            s = 1.0 - d / min(len(t), len(q))
            if s >= 0.6:
                vs.append((t, s))
        vs.sort(key=lambda x: (-x[1], x[0]))
        by_q[q] = vs[:50]
    exact_df = dict(zip(ts["term"], ts["df"]))
    scored = []
    for q, vs in by_q.items():
        df_q = exact_df.get(q, 0)
        if not df_q:
            df_q = int(sum(exact_df[t] for t, _ in vs) // len(vs))
        idf = math.log(n_docs / (df_q + 1)) + 1.0
        scored += [(t, (s ** 2) * idf) for t, s in vs]
    scored.sort(key=lambda x: (-x[1], x[0]))
    scored = scored[:50]
    top = scored[0][1]
    want = [(t, b / top) for t, b in scored]
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, gb), (_, wb) in zip(got, want):
        assert gb == pytest.approx(wb, rel=1e-9)
