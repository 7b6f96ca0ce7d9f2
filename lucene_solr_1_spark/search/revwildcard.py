"""ReversedWildcardFilter query side — leading wildcards as prefix
pushdown (ref: solr/core/src/java/org/apache/solr/analysis/
ReversedWildcardFilter.java:36 and SolrQueryParserBase's
getWildcardQuery reversal: Solr indexes each token reversed so a
leading-wildcard query rewrites to a PREFIX query on the reversed
dictionary instead of a full term scan).

Here the reversed dictionary is a derived parquet (rev_term, term)
range-partitioned and sorted by rev_term, so a suffix query ``*foo``
becomes ``rev_term startswith 'oof'`` — a min/max-prunable scan of
O(matching files), exactly the pushdown shape of the normal prefix
path. At 100 TB the term dictionary is the only thing scanned either
way; this turns the leading-wildcard full-dictionary regex scan into
the same file-pruned range probe every other MultiTermQuery gets.

``expand_leading_wildcard`` handles the pure-suffix form (``*foo``);
general patterns with interior wildcards still take the regex path in
queryparser._expand (Solr does the same: only patterns that become
prefix-shaped after reversal are rewritten).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def rev_dict_path(index_root: str) -> str:
    return os.path.join(index_root, "termstats_rev")


def build_reversed_dictionary(spark: SparkSession, termstats_path: str,
                              out_path: str,
                              out_partitions: int = 8) -> str:
    """One pass over the term dictionary: (rev_term, term, df),
    range-partitioned + sorted by rev_term for min/max file pruning."""
    (spark.read.parquet(termstats_path)
     .select(F.reverse("term").alias("rev_term"), "term", "df")
     .repartitionByRange(out_partitions, "rev_term")
     .sortWithinPartitions("rev_term")
     .write.mode("overwrite").parquet(out_path))
    return out_path


def is_pure_suffix_pattern(raw: str) -> bool:
    """``*foo`` — exactly one wildcard, leading, no '?'."""
    return (len(raw) > 1 and raw.startswith("*")
            and "*" not in raw[1:] and "?" not in raw)


def expand_leading_wildcard(spark: SparkSession, rev_path: str,
                            raw: str, max_expansions: int) -> list[str]:
    """Terms matching ``*foo`` via the reversed dictionary prefix
    probe, top-by-df like every other MultiTermQuery rewrite."""
    if not is_pure_suffix_pattern(raw):
        raise ValueError(f"not a pure suffix pattern: {raw!r}")
    needle = raw[1:].lower()[::-1]
    rows = (spark.read.parquet(rev_path)
            .filter(F.col("rev_term").startswith(needle))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions).collect())
    return [r["term"] for r in rows]
