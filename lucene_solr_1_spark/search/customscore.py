"""CustomScoreQuery + BoostingQuery twins (lucene/queries module).

* CustomScoreQuery (queries/CustomScoreQuery.java:47,
  CustomScoreProvider.java:68-80): wraps a sub-query and multiplies
  its score by a per-document ValueSource value — the default
  provider's ``customScore = subQueryScore * valSrcScore`` (one value
  source).  Docs with no value row keep their sub-query score
  (valSrcScore defaults to 1 like a missing FunctionValues).

* BoostingQuery (queries/BoostingQuery.java:34-74): matches exactly
  the `match` query's docs; docs that ALSO match the `context` query
  have their score multiplied by `boost` (the reference implements
  this as a zero-boost context clause plus a coord hack returning
  `boost` when every clause matched — same arithmetic).

Both are one extra narrow projection over the engine's scored
candidates — the join against the value/context side is the only
addition, broadcast-sized in practice (values come from a column of
the docs table; context hits are a scored-candidates output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _subquery_scores(searcher, terms: list[str]) -> DataFrame:
    """DataFrame(docid, score): BooleanQuery-SHOULD sum over terms
    (the engine's disjunction arithmetic, float32 discipline)."""
    cands = searcher._scored_candidates(list(terms))
    return cands.groupBy("docid").agg(
        F.sum("score").cast("float").alias("score"))


def custom_score_search(searcher, terms: list[str], values: DataFrame,
                        k: int = 10, value_col: str = "val") -> DataFrame:
    """Top-k DataFrame(docid, score, rank) for
    CustomScoreQuery(sub, FunctionQuery(valsrc)).

    `values`: DataFrame(docid, <value_col>) — the ValueSource.
    """
    sub = _subquery_scores(searcher, terms)
    # alias the value column so a caller-supplied name (e.g. "score")
    # can never collide with the sub-query's score column
    vals = values.select("docid", F.col(value_col).alias("__csq_val"))
    joined = sub.join(vals, "docid", "left")
    scored = joined.select(
        "docid",
        (F.col("score") * F.coalesce(F.col("__csq_val"), F.lit(1.0))
         ).cast("float").alias("score"))
    from .engine import topk_with_rank
    return topk_with_rank(scored, k)


def boosting_search(searcher, match_terms: list[str],
                    context_terms: list[str], boost: float,
                    k: int = 10) -> DataFrame:
    """Top-k for BoostingQuery(match, context, boost): match docs,
    demoting (boost < 1) or promoting those that also match context."""
    sub = _subquery_scores(searcher, match_terms)
    ctx = (searcher._scored_candidates(list(context_terms))
           .select("docid").distinct()
           .withColumn("_in_ctx", F.lit(True)))
    scored = (sub.join(ctx, "docid", "left")
              .select("docid",
                      F.when(F.col("_in_ctx"),
                             (F.col("score") * F.lit(float(boost))
                              ).cast("float"))
                      .otherwise(F.col("score")).alias("score")))
    from .engine import topk_with_rank
    return topk_with_rank(scored, k)
