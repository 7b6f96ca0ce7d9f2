"""Benchmark decontamination: flag training documents that share any
word n-gram with a held-out evaluation set.

The standard LLM-pipeline guard (GPT-3 appendix C / PaLM / Llama style:
13-gram overlap against eval benchmarks) — a training doc containing any
benchmark n-gram is quarantined before training.

100-TB shape: the benchmark side is small (eval suites are at most
~10^7 grams), the training side is the 100-TB corpus.  So: build the
benchmark gram set ONCE, dedupe it, and broadcast it; the training side
is one narrow explode + broadcast LEFT SEMI join + one groupBy(doc_id)
— the only shuffle is the per-doc tally over the (tiny) matched subset.
Grams can be hashed (xxhash64) before the join so the broadcast ships
8-byte longs instead of strings — ~10× smaller for 13-grams.

Reference analog: none (the reference is a search engine, not a
training pipeline); the gram machinery reuses the shingle substrate of
`datapipe/dedup.py` (SIGMOD'03 winnowing) at word granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_ngrams(df: DataFrame, text_col: str, n: int):
    """doc_id + exploded word n-grams (space-joined), JVM-only.

    Splits on runs of non-alphanumerics, lowercases — the usual
    normalization so cosmetic punctuation differences don't hide
    contamination."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                     lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_w") - (n - 1)),
        lambda i: F.array_join(F.slice(F.col("_w"), i, n), " "))
    return (df.withColumn("_w", words)
              .filter(F.size("_w") >= n)
              .select("doc_id", F.explode(grams).alias("gram")))


def benchmark_ngrams(bench_df: DataFrame, text_col: str = "text",
                     n: int = 8, hashed: bool = False) -> DataFrame:
    """Distinct n-gram set of the benchmark corpus (one small shuffle;
    build once, persist/broadcast)."""
    g = _word_ngrams(bench_df, text_col, n).select("gram").distinct()
    if hashed:
        g = g.select(F.xxhash64("gram").alias("gram"))
    return g


def flag_contaminated(train_df: DataFrame, bench_grams: DataFrame,
                      text_col: str = "text", n: int = 8,
                      hashed: bool = False) -> DataFrame:
    """Per contaminated training doc: how many of its n-gram positions
    hit the benchmark set (``n_hit_grams``) and how many distinct grams
    hit (``n_hit_distinct``).  Docs with zero hits are absent (filter
    semantics — the caller anti-joins to get the clean set).

    The benchmark side is explicitly ``broadcast()``: the semi join is
    map-side, so the 100-TB training scan never shuffles its grams."""
    tg = _word_ngrams(train_df, text_col, n)
    if hashed:
        tg = tg.select("doc_id", F.xxhash64("gram").alias("gram"))
    hits = tg.join(F.broadcast(bench_grams), "gram", "left_semi")
    return (hits.groupBy("doc_id")
                .agg(F.count("*").alias("n_hit_grams"),
                     F.countDistinct("gram").alias("n_hit_distinct")))


def decontaminate(train_df: DataFrame, bench_df: DataFrame,
                  text_col: str = "text", n: int = 8,
                  hashed: bool = True) -> DataFrame:
    """The composed op: training rows that survive (share NO n-gram with
    the benchmark set).  broadcast anti join — scale-safe."""
    grams = benchmark_ngrams(bench_df, text_col, n, hashed=hashed)
    flagged = flag_contaminated(train_df, grams, text_col, n, hashed=hashed)
    return train_df.join(F.broadcast(flagged.select("doc_id")),
                         "doc_id", "left_anti")
