"""Result grouping — lucene/grouping two-pass collector analogs.

Reference: TermFirstPassGroupingCollector (top-N group heads by the
group sort) then TermSecondPassGroupingCollector (top-k docs within
each selected group) — lucene/grouping/src/java/org/apache/lucene/
search/grouping/*.java:36. In Spark the two passes collapse into one
window plan: rank docs within groups, rank groups by their head doc —
Catalyst executes it as two window stages over one shuffle when the
window keys share partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grouped_topk(scored: DataFrame, group_col: str, sort_cols: list,
                 n_groups: int = 10, k_per_group: int = 2) -> DataFrame:
    """Top `n_groups` groups (by best doc), top `k_per_group` docs each.

    `sort_cols` like [F.desc('score'), F.asc('docid')] — ties must be
    fully broken for determinism (HitQueue discipline).
    """
    w_in = Window.partitionBy(group_col).orderBy(*sort_cols)
    ranked = scored.withColumn("rank_in_group", F.row_number().over(w_in))
    heads = ranked.filter(F.col("rank_in_group") == 1) \
                  .withColumn("group_rank",
                              F.row_number().over(Window.orderBy(*sort_cols))) \
                  .filter(F.col("group_rank") <= n_groups) \
                  .select(group_col, "group_rank")
    return (ranked.filter(F.col("rank_in_group") <= k_per_group)
            .join(F.broadcast(heads), group_col)
            .orderBy("group_rank", "rank_in_group"))


def group_distinct_count(scored: DataFrame, group_col: str) -> DataFrame:
    """matches + ngroups (grouping's distinct-values collector)."""
    return scored.agg(F.count("*").alias("matches"),
                      F.countDistinct(group_col).alias("ngroups"))
