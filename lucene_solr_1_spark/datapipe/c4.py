"""C4-style cleaning for web-crawl training corpora (Raffel et al.,
"Exploring the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", 2020 §2.2 — the published C4 heuristics):

* line rules — keep only lines ending in terminal punctuation and with
  ≥ 5 words; drop lines containing the word "javascript";
* page rules — drop pages with < 3 retained sentences, pages containing
  "lorem ipsum", a curly brace, or any configured blocked word;
* global three-sentence-span deduplication — any span of three
  consecutive sentences that occurs more than once in the corpus is
  removed from all but its first occurrence (first = lowest (doc, span
  position)); a sentence is dropped when ANY duplicated losing span
  covers it, and the page is reassembled from the surviving sentences
  (the tensorflow-datasets c4_utils reassembly convention).

Scale design: line/page rules are narrow per-row array expressions
(zero shuffle). Span dedup is explode → groupBy(span hash) winner pick
→ join back → per-doc collect of removed sentence indices → reassemble:
every stage is hash-partitioned on content hash or doc key with
map-side combines, no driver-side state, no Python — the same 100-TB
shape as the MinHash pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def _n_words(col: Column) -> Column:
    return F.size(F.filter(F.split(col, r"\s+"), lambda w: w != ""))


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   key: str = "doc_id", min_words_per_line: int = 5,
                   min_sentences: int = 3,
                   blocked_words: tuple[str, ...] = ()) -> DataFrame:
    """The C4 line + page rules as one narrow transform: returns
    (key, clean_text, n_lines_kept, c4_ok). `clean_text` keeps only
    lines that end in terminal punctuation, have ≥ min_words_per_line
    words, and don't contain "javascript" (case-insensitive); `c4_ok`
    is 0 for pages with < min_sentences kept sentences, a "lorem
    ipsum", a '{', or any blocked word."""
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda l: F.trim(l) != "")
    def _terminal(l: Column) -> Column:
        r = F.rtrim(l)
        cond = F.lit(False)
        for p in TERMINAL_PUNCT:
            cond = cond | r.endswith(p)
        return cond

    kept = F.filter(
        lines,
        lambda l: _terminal(l)
        & (_n_words(l) >= min_words_per_line)
        & ~F.lower(l).rlike(r"\bjavascript\b"))
    clean = F.concat_ws("\n", kept)
    low = F.lower(F.col(text_col))
    n_sents = F.size(F.filter(
        F.split(clean, r"[.!?]+"), lambda s: F.trim(s) != ""))
    ok = ((n_sents >= min_sentences)
          & ~low.contains("lorem ipsum")
          & ~F.col(text_col).contains("{"))
    for w in blocked_words:
        ok = ok & ~low.rlike(rf"\b{w}\b")
    return df.select(
        key,
        clean.alias("clean_text"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        ok.cast("int").alias("c4_ok"))


def split_sentences(text_col: str = "text") -> Column:
    """Default sentence splitter: terminal-punctuation runs. Pluggable —
    span_dedup takes any array<string> column (the contract entry uses
    fixed-width token chunks so the synthetic corpus exercises it)."""
    return F.filter(F.split(F.col(text_col), r"[.!?]+"),
                    lambda s: F.trim(s) != "")


def span_dedup(df: DataFrame, sentences_col: str = "sentences",
               key: str = "doc_id", span: int = 3) -> DataFrame:
    """Global `span`-sentence-span dedup over (key, array<string>
    sentences): emits (key, kept_sentences, n_sentences, n_removed)
    where a sentence is removed iff it is covered by an occurrence of a
    duplicated span that is NOT the corpus-first occurrence (first =
    min (key, position) — deterministic and order-free).

    Plan: spans = explode of md5-hashed windows; the corpus-first
    occurrence per hash is min(struct(key, pos)) — a map-side-
    combinable AGGREGATION, deliberately not a row_number window, so a
    boilerplate span with 10^9 occurrences (hot hash) never funnels
    through one window partition; losers join back on the hash (AQE
    skew-join splits hot hashes) and explode to their covered sentence
    indices; one groupBy(key) collects the removal set; reassembly is
    a narrow filter over the original array."""
    base = df.select(key, F.col(sentences_col).alias("_s"))
    n = F.size("_s")
    spans = (base
             .select(key,
                     F.posexplode(F.when(n >= span, F.transform(
                         F.sequence(F.lit(1), n - span + 1),
                         lambda i: F.md5(F.concat_ws(
                             "\x1e", F.slice("_s", i, span)))))
                         .otherwise(F.array().cast("array<string>")))
                     .alias("pos", "h")))
    winners = (spans.groupBy("h")
               .agg(F.min(F.struct(key, "pos")).alias("w"),
                    F.count("*").alias("cnt"))
               .filter(F.col("cnt") > 1))
    losers = (spans.join(winners, "h")
              .filter((F.col(key) != F.col(f"w.{key}"))
                      | (F.col("pos") != F.col("w.pos")))
              .select(key, F.explode(F.sequence(
                  F.col("pos"), F.col("pos") + span - 1)).alias("ridx")))
    removed = (losers.groupBy(key)
               .agg(F.collect_set("ridx").alias("_rm")))
    out = (base.join(removed, key, "left")
           .withColumn("_rm", F.coalesce(
               "_rm", F.array().cast("array<int>")))
           .select(
               key,
               F.filter("_s", lambda s, i: ~F.array_contains("_rm", i))
               .alias("kept_sentences"),
               F.size("_s").cast("int").alias("n_sentences"),
               F.size("_rm").cast("int").alias("n_removed")))
    return out
