"""MemoryIndex / percolation (index/memory.py) — single-doc match +
JVM-side batch percolation parity."""

import pandas as pd

from lucene_solr_1_spark.index.memory import MemoryIndex, percolate_expr


def test_memory_index_match_and_phrase():
    mi = MemoryIndex.from_text("The quick brown fox jumps over the lazy dog")
    assert mi.matches(["quick", "zebra"], "OR")
    assert not mi.matches(["quick", "zebra"], "AND")
    assert mi.matches(["quick", "fox", "zebra"], "MSM2")
    assert mi.matches_phrase(["quick", "brown", "fox"])
    assert not mi.matches_phrase(["brown", "quick"])
    assert mi.score(["quick"]) > 0.0
    assert mi.score(["zebra"]) == 0.0


def test_percolate_expr_parity(spark):
    from pyspark.sql import functions as F
    from lucene_solr_1_spark.analysis.standard import analyze_expr

    docs = pd.DataFrame({"text": [
        "spark streams merge quickly",
        "the lazy dog sleeps",
        "merge sort beats bubble sort",
        ""]})
    queries = {"q_merge": (["merge"], "OR"),
               "q_and": (["merge", "sort"], "AND"),
               "q_msm": (["spark", "dog", "sort"], "MSM1")}
    sdf = spark.createDataFrame(docs)
    got = (sdf.select(percolate_expr(analyze_expr("text"), queries)
                      .alias("m")).toPandas()["m"].apply(list).tolist())
    exp = []
    for t in docs["text"]:
        mi = MemoryIndex.from_text(t)
        exp.append([n for n, (ts, op) in queries.items()
                    if mi.matches(ts, op)])
    assert got == exp
