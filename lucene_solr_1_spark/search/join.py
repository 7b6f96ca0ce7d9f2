"""Query-time value joins — JoinUtil analogs with score modes.

Reference: lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java:64 (createJoinQuery), ScoreMode.java (None/Total/Max/Avg),
TermsWithScoreCollector.java: run `fromQuery` on the "from" side,
collect the fromField values — aggregating each value's matching-doc
scores per the score mode — then match "to" docs whose toField holds a
collected value, scored by the value's aggregate.

Spark shape: the collected (value, agg score) set is itself a DataFrame
(one groupBy = one map-side-combinable shuffle on the join value), and
the to-side match is an equi-join that Catalyst/AQE plans as a
broadcast hash join whenever the from side is small — which it is for
selective from-queries, exactly when Lucene's TermsQuery set lookup is
cheap.  Nothing is collected to the driver, so a 10^12-doc from side
degrades gracefully to a shuffle join instead of OOMing.

ToChildBlockJoinQuery (join/ToChildBlockJoinQuery.java:42) is the
inverse block join: parents matching the parent filter project all
their children; child score = parent score (ScoreMode.None in 4.4's
child direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AGGS = {"total": F.sum, "max": F.max, "avg": F.avg}


def join_query(from_hits: DataFrame, from_field: str, to_df: DataFrame,
               to_field: str, score_mode: str = "none",
               score_col: str = "score") -> DataFrame:
    """to_df rows whose `to_field` appears among from_hits[from_field],
    with a `join_score` column per ScoreMode (none/total/max/avg).

    ScoreMode.None → left-semi join (no score column materialized on the
    from side at all, mirroring TermsCollector vs TermsWithScoreCollector).
    """
    if score_mode == "none":
        keys = from_hits.select(F.col(from_field).alias("_jk")).distinct()
        return to_df.join(keys, to_df[to_field] == keys["_jk"], "left_semi")
    agg = _AGGS[score_mode]
    keys = (from_hits.groupBy(F.col(from_field).alias("_jk"))
            .agg(agg(score_col).alias("join_score")))
    return (to_df.join(keys, to_df[to_field] == keys["_jk"], "inner")
            .drop("_jk"))


def to_child_block_join(parents: DataFrame, children: DataFrame,
                        parent_key: str,
                        parent_score_col: str | None = None) -> DataFrame:
    """ToChildBlockJoinQuery analog: children of matching parents.

    `parents` is the already-filtered parent set (the parent filter's
    DocSet); each child row joins its parent's key, inheriting the
    parent's score when `parent_score_col` is given (the 4.4 child
    direction always propagates the parent score —
    ToChildBlockJoinQuery.java:177 `parentScore`)."""
    cols = [parent_key] + ([parent_score_col] if parent_score_col else [])
    pk = parents.select(*cols).distinct() if not parent_score_col \
        else parents.select(*cols)
    if parent_score_col:
        pk = pk.withColumnRenamed(parent_score_col, "parent_score")
    return children.join(pk, parent_key, "inner")
