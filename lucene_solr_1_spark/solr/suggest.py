"""Suggest / spellcheck over the term dictionary.

Analogs of lucene/suggest (FST-based AnalyzingSuggester — here the
term-sorted, min/max-pruned termstats table plays the FST's role) and
lucene/suggest spellchecker (DirectSpellChecker-style: best corrections
by edit distance, then df) — ref: lucene/suggest/src/java/org/apache/
lucene/search/suggest/, lucene/suggest/.../spell/DirectSpellChecker.java.
Both are single declarative plans over termstats: prefix LIKE with
pushdown, or a levenshtein filter, ordered by (distance, df desc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suggest(searcher, prefix: str, n: int = 10) -> DataFrame:
    """Autocomplete: most-frequent terms with the given prefix."""
    ts = searcher.spark.read.parquet(searcher.paths.termstats)
    return (ts.filter(F.col("term").startswith(prefix.lower()))
            .orderBy(F.desc("df"), F.asc("term"))
            .select("term", "df").limit(n))


def spellcheck(searcher, word: str, max_edits: int = 2, n: int = 5,
               min_df: int = 1) -> DataFrame:
    """Corrections ordered by (edit distance asc, df desc, term asc);
    exact dictionary hits return themselves first (distance 0)."""
    w = word.lower()
    ts = searcher.spark.read.parquet(searcher.paths.termstats)
    dist = F.levenshtein(F.col("term"), F.lit(w))
    return (ts.filter((dist <= max_edits) & (F.col("df") >= min_df))
            .withColumn("distance", dist)
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .select("term", "distance", "df").limit(n))
