"""Classic n-gram SpellChecker — ``spell/SpellChecker.java`` twin.

Reference: ``lucene/suggest/src/java/org/apache/lucene/search/spell/
SpellChecker.java`` — the auxiliary spell index stores, per dictionary
word, its n-grams in ``gram{n}`` fields plus the first gram in
``start{n}`` and last in ``end{n}``, for n in the word-length-dependent
band (``getMin``/``getMax``: len>5 -> 3..4, len==5 -> 2..3, else 1..2;
:555-573, ``addGram`` :585-603).  ``suggestSimilar`` (:319-418) ORs
every query gram (start boosted ``bStart=2.0``, end ``bEnd=1.0``),
takes ``10*numSug`` first-pass hits, then re-ranks by the
StringDistance (default LevensteinDistance, similarity scaled by
max length), filters below ``accuracy`` (0.5), and keeps the top
``numSug`` under SuggestWordScoreComparator order (score desc, freq
desc, term asc); ``SUGGEST_WHEN_NOT_IN_INDEX`` short-circuits to the
word itself, ``SUGGEST_MORE_POPULAR`` requires candidate df > word df.

Honest deviation (documented once, mirrored in the contract oracle):
the reference's FIRST-pass ranking is TF-IDF over the gram index; the
twin ranks candidates by boosted gram-overlap (2.0*start + 1.0*end +
1.0 per matching gram instance, tie term-asc).  The first pass only
SELECTS candidates — final ordering is the reference-exact distance
re-rank — so outputs can differ only when the 10*numSug cut severs a
candidate the TF-IDF ranking would have kept (requires a dictionary
vastly larger than the candidate budget AND near-tie overlap scores).

Spark shape: the gram table build is one explode (narrow); a batch of
misspelled words percolates through one join + groupBy on the (small)
gram table; the distance re-rank touches <= 10*numSug strings per
word via the reference-exact float32 kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .spelldist import levenstein

__all__ = ["get_min_gram", "get_max_gram", "form_grams", "spell_gram_table",
           "suggest_similar", "suggest_similar_batch"]


def get_min_gram(word_len: int) -> int:
    return 3 if word_len > 5 else (2 if word_len == 5 else 1)


def get_max_gram(word_len: int) -> int:
    return 4 if word_len > 5 else (3 if word_len == 5 else 2)


def form_grams(text: str, ng: int) -> list[str]:
    return [text[i:i + ng] for i in range(len(text) - ng + 1)]


def spell_gram_table(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """The spell index as a table: (term, ng, gram, is_start, is_end) —
    addGram's field layout (gram{n}/start{n}/end{n}), built by one
    explode per n-gram size band (pure JVM expressions)."""
    w = terms.select(F.col(term_col).alias("term"),
                     F.length(term_col).alias("len"))
    parts = []
    for ng in (1, 2, 3, 4):
        band = w.filter((F.lit(ng) >= F.when(F.col("len") > 5, 3)
                         .when(F.col("len") == 5, 2).otherwise(1))
                        & (F.lit(ng) <= F.when(F.col("len") > 5, 4)
                           .when(F.col("len") == 5, 3).otherwise(2))
                        & (F.col("len") >= ng))
        grams = band.select(
            "term", F.lit(ng).alias("ng"),
            F.explode(F.expr(
                f"transform(sequence(1, len - {ng} + 1), "
                f"i -> struct(i, substring(term, i, {ng}) AS g))")).alias("x"),
            F.col("len"))
        # a gram can be BOTH start and end (len == ng): addGram puts it
        # in both fields, so keep two flags rather than one label
        parts.append(grams.select(
            "term", "ng", F.col("x.g").alias("gram"),
            (F.col("x.i") == 1).alias("is_start"),
            (F.col("x.i") == F.col("len") - ng + 1).alias("is_end")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def suggest_similar(spark: SparkSession, dictionary: DataFrame, word: str,
                    num_sug: int = 5, accuracy: float = 0.5,
                    suggest_mode: str = "when_not_in_index",
                    b_start: float = 2.0, b_end: float = 1.0,
                    gram_table: DataFrame | None = None) -> list[dict]:
    """suggestSimilar twin.  ``dictionary``: (term, df).  Returns
    [{word, score, freq}] best-first under SuggestWordScoreComparator
    (score desc, freq desc, term asc)."""
    ddf = dictionary.select(F.col("term"), F.col("df").cast("long"))
    row = ddf.filter(F.col("term") == word).collect()
    word_freq = int(row[0]["df"]) if row else 0
    if suggest_mode == "when_not_in_index" and word_freq > 0:
        return [{"word": word, "score": 1.0, "freq": word_freq}]
    goal_freq = word_freq if suggest_mode == "more_popular" else 0

    gt = gram_table if gram_table is not None else spell_gram_table(ddf)
    # query gram instances with boosts, as (ng, gram, pos, weight) rows
    qrows = []
    L = len(word)
    for ng in range(get_min_gram(L), get_max_gram(L) + 1):
        grams = form_grams(word, ng)
        if not grams:
            continue
        if b_start > 0:
            qrows.append((ng, grams[0], "start", float(b_start)))
        if b_end > 0:
            qrows.append((ng, grams[-1], "end", float(b_end)))
        for g in grams:
            qrows.append((ng, g, "any", 1.0))
    if not qrows:
        return []
    q = spark.createDataFrame(qrows, "ng int, gram string, pos string, "
                                     "w double")
    # start/end clauses only match the candidate's start/end field;
    # plain clauses match every gram occurrence
    joined = gt.join(
        F.broadcast(q),
        (gt.ng == q.ng) & (gt.gram == q.gram)
        & ((q.pos == "any")
           | ((q.pos == "start") & gt.is_start)
           | ((q.pos == "end") & gt.is_end)), "inner")
    scored = (joined.groupBy("term").agg(F.sum("w").alias("overlap"))
              .orderBy(F.desc("overlap"), F.asc("term"))
              .limit(10 * num_sug))
    cands = scored.join(ddf, "term").collect()

    out = []
    for r in cands:
        term = r["term"]
        if term == word:
            continue  # don't suggest a word for itself
        score = levenstein(word, term)
        if score < accuracy:
            continue
        freq = int(r["df"])
        if suggest_mode == "more_popular" and freq <= goal_freq:
            continue
        if freq < 1:
            continue
        out.append({"word": term, "score": score, "freq": freq})
    out.sort(key=lambda d: (-d["score"], -d["freq"], d["word"]))
    return out[:num_sug]


def suggest_similar_batch(spark: SparkSession, dictionary: DataFrame,
                          words: list[str], num_sug: int = 5,
                          accuracy: float = 0.5,
                          suggest_mode: str = "when_not_in_index",
                          b_start: float = 2.0, b_end: float = 1.0,
                          gram_table: DataFrame | None = None,
                          ) -> dict[str, list[dict]]:
    """Batch suggestSimilar: ONE gram-table build, ONE join + groupBy
    and ONE per-word-partitioned top-(10*numSug) window for the whole
    misspelled-word set — the Spark-native replacement for the
    reference's per-word query loop.  Per-word results identical to
    ``suggest_similar``."""
    from pyspark.sql import Window

    ddf = dictionary.select(F.col("term"), F.col("df").cast("long"))
    in_dict = {r["term"]: int(r["df"]) for r in
               ddf.filter(F.col("term").isin(list(words))).collect()}
    out: dict[str, list[dict]] = {}
    todo = []
    for w in dict.fromkeys(words):
        if suggest_mode == "when_not_in_index" and in_dict.get(w, 0) > 0:
            out[w] = [{"word": w, "score": 1.0, "freq": in_dict[w]}]
        else:
            todo.append(w)
    if not todo:
        return out

    gt = gram_table if gram_table is not None else spell_gram_table(ddf)
    qrows = []
    for w in todo:
        L = len(w)
        for ng in range(get_min_gram(L), get_max_gram(L) + 1):
            grams = form_grams(w, ng)
            if not grams:
                continue
            if b_start > 0:
                qrows.append((w, ng, grams[0], "start", float(b_start)))
            if b_end > 0:
                qrows.append((w, ng, grams[-1], "end", float(b_end)))
            for g in grams:
                qrows.append((w, ng, g, "any", 1.0))
    if not qrows:
        return {**out, **{w: [] for w in todo}}
    q = spark.createDataFrame(
        qrows, "word string, ng int, gram string, pos string, w double")
    joined = gt.join(
        F.broadcast(q),
        (gt.ng == q.ng) & (gt.gram == q.gram)
        & ((q.pos == "any")
           | ((q.pos == "start") & gt.is_start)
           | ((q.pos == "end") & gt.is_end)), "inner")
    scored = joined.groupBy("word", "term").agg(F.sum("w").alias("overlap"))
    win = Window.partitionBy("word").orderBy(F.desc("overlap"),
                                             F.asc("term"))
    cands = (scored.withColumn("_r", F.row_number().over(win))
             .filter(F.col("_r") <= 10 * num_sug)
             .join(ddf, "term")
             .select("word", "term", "df").collect())
    per_word: dict[str, list] = {w: [] for w in todo}
    for r in cands:
        per_word[r["word"]].append(r)
    for w in todo:
        goal = in_dict.get(w, 0) if suggest_mode == "more_popular" else 0
        res = []
        for r in per_word[w]:
            term = r["term"]
            if term == w:
                continue
            score = levenstein(w, term)
            if score < accuracy:
                continue
            freq = int(r["df"])
            if suggest_mode == "more_popular" and freq <= goal:
                continue
            if freq < 1:
                continue
            res.append({"word": term, "score": score, "freq": freq})
        res.sort(key=lambda d: (-d["score"], -d["freq"], d["word"]))
        out[w] = res[:num_sug]
    return out
