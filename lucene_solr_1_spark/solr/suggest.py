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


def build_suggester(spark, df: DataFrame, text_col: str, weight_col: str,
                    path: str, out_partitions: int = 8) -> None:
    """AnalyzingSuggester build analog (ref: lucene/suggest/.../analyzing/
    AnalyzingSuggester.java:91-118 javadoc: inputs are analyzed, the FST
    maps analyzed form -> (weight, surface form)): materialize
    (surface, analyzed, weight), range-partitioned and sorted by the
    analyzed key — parquet min/max plays the FST-prefix role, so a
    lookup scans only the row groups covering the prefix."""
    from ..analysis.standard import analyze_expr
    comp = df.select(
        F.col(text_col).alias("surface"),
        F.col(weight_col).cast("long").alias("weight"),
        F.concat_ws(" ", analyze_expr(text_col)).alias("analyzed"))
    (comp.filter(F.col("analyzed") != "")
     .repartitionByRange(out_partitions, "analyzed")
     .sortWithinPartitions("analyzed")
     .write.mode("overwrite").parquet(path))


def analyzing_suggest(spark, path: str, q: str, n: int = 10,
                      fuzzy_edits: int = 0) -> DataFrame:
    """AnalyzingSuggester.lookup analog: analyze the query, match
    completions whose analyzed form starts with it, rank by weight desc
    (then surface asc — the reference's tie-break on the surface bytes).
    fuzzy_edits > 0 gives the FuzzySuggester (analyzing/FuzzySuggester
    .java:46: Levenshtein automaton over the analyzed prefix)."""
    from ..analysis.standard import analyze_text
    key = " ".join(analyze_text(q))
    comp = spark.read.parquet(path)
    if fuzzy_edits <= 0:
        m = comp.filter(F.col("analyzed").startswith(key))
    else:
        prefix = F.substring(F.col("analyzed"), 1, len(key))
        m = comp.filter(F.levenshtein(prefix, F.lit(key)) <= fuzzy_edits)
    return (m.orderBy(F.desc("weight"), F.asc("surface"))
            .select("surface", "weight").limit(n))


def build_wfst_suggester(spark, df: DataFrame, text_col: str,
                         weight_col: str, path: str,
                         out_partitions: int = 8) -> None:
    """WFSTCompletionLookup.build analog (ref: lucene/suggest/src/java/
    .../fst/WFSTCompletionLookup.java:56,87-113: surface-keyed FST whose
    outputs encode the weight so shortest-path = highest weight): the
    completion table is (surface, weight) range-partitioned and sorted
    by surface — parquet row-group min/max plays the FST's shared-prefix
    role, so a lookup scans only the row groups covering the prefix.
    Unlike AnalyzingSuggester (build_suggester) the key is the raw
    surface form, NOT the analyzed text."""
    comp = df.select(F.col(text_col).alias("surface"),
                     F.col(weight_col).cast("long").alias("weight"))
    (comp.filter(F.col("surface") != "")
     .repartitionByRange(out_partitions, "surface")
     .sortWithinPartitions("surface")
     .write.mode("overwrite").parquet(path))


def wfst_lookup(spark, path: str, key: str, num: int = 10,
                exact_first: bool = True) -> list[tuple[str, int]]:
    """WFSTCompletionLookup.lookup analog (WFSTCompletionLookup.java:
    130-181): completions of `key` ranked weight desc with surface-byte
    ascending tie-break (Util.shortestPaths' weightComparator +
    TieBreakByInputComparator). exact_first=True (the reference's
    default ctor) surfaces an exact match first regardless of weight —
    the remaining slots hold the top completions excluding it."""
    if num <= 0:
        raise ValueError("num must be > 0")
    comp = (spark.read.parquet(path)
            .filter(F.col("surface").startswith(key)))
    res: list[tuple[str, int]] = []
    rest = comp
    if exact_first:
        ex = comp.filter(F.col("surface") == key).collect()
        if ex:
            res.append((key, int(ex[0]["weight"])))
            if num == 1:
                return res
            rest = comp.filter(F.col("surface") != key)
    rows = (rest.orderBy(F.desc("weight"), F.asc("surface"))
            .limit(num - len(res)).collect())
    return res + [(r["surface"], int(r["weight"])) for r in rows]


def tst_lookup(spark, path: str, key: str, num: int = 10,
               only_more_popular: bool = False) -> list[tuple[str, int]]:
    """TSTLookup.lookup analog (ref: lucene/suggest/.../tst/
    TSTLookup.java:43,lookup): prefix completions in TST traversal
    (alphabetical) order, or — with only_more_popular — the top-num by
    weight via the LookupPriorityQueue (weight desc). Shares the
    WFST completion table; the data structure differs in the reference
    (ternary tree vs FST), the lookup contract is table-expressible."""
    comp = (spark.read.parquet(path)
            .filter(F.col("surface").startswith(key)))
    if only_more_popular:
        rows = (comp.orderBy(F.desc("weight"), F.asc("surface"))
                .limit(num).collect())
    else:
        rows = comp.orderBy(F.asc("surface")).limit(num).collect()
    return [(r["surface"], int(r["weight"])) for r in rows]


def collate(searcher, query: str, max_edits: int = 2,
            max_collation_tries: int = 3, verify: bool = True) -> dict:
    """SpellCheckComponent collation analog (ref: solr/core/.../
    component/SpellCheckComponent.java:86 + spelling/SpellCheckCollator
    .java:50): analyze the query, leave dictionary words alone, replace
    each misspelled word with its candidate corrections (distance asc,
    df desc), and return the best collated query — when ``verify``
    (spellcheck.collateExtendedResults), a collation must produce hits
    as a conjunction, trying up to ``max_collation_tries`` correction
    combinations (per-slot candidate rank order, the collator's
    possibility iterator).

    Returns {"collation": str | None, "hits": int, "corrections":
    {misspelled: [candidates...]}}."""
    from ..analysis.standard import analyze_text
    terms = analyze_text(query)
    ts = searcher.spark.read.parquet(searcher.paths.termstats)
    known = {r["term"] for r in
             ts.filter(F.col("term").isin(terms)).select("term").collect()}
    corrections: dict[str, list[str]] = {}
    for t in dict.fromkeys(terms):
        if t in known:
            continue
        cands = [r["term"] for r in
                 spellcheck(searcher, t, max_edits=max_edits,
                            n=max_collation_tries).collect()]
        corrections[t] = cands
    if not corrections:
        return {"collation": query if not terms else " ".join(terms),
                "hits": -1, "corrections": {}}

    # best-first iteration over the per-slot candidate CROSS-PRODUCT
    # (the reference's PossibilityIterator, spelling/PossibilityIterator
    # .java: combinations ranked best-candidates-first), not a lock-step
    # advance of every slot at once (ADVICE r4). A heap ordered by
    # sum-of-candidate-ranks yields combos like (0,0), (0,1), (1,0), ...
    import heapq
    mis = [t for t in dict.fromkeys(terms) if t not in known]
    if any(not corrections[t] for t in mis):
        return {"collation": None, "hits": 0, "corrections": corrections}
    start = tuple([0] * len(mis))
    heap: list[tuple[int, tuple[int, ...]]] = [(0, start)]
    seen = {start}
    tried = 0
    while heap and tried < max_collation_tries:
        s, combo = heapq.heappop(heap)
        tried += 1
        pick = {t: corrections[t][i] for t, i in zip(mis, combo)}
        cand = [pick.get(t, t) for t in terms]
        if not verify:
            return {"collation": " ".join(cand), "hits": -1,
                    "corrections": corrections}
        # TRUE conjunction hit count (TotalHitCountCollector), not a
        # top-1-capped fetch (ADVICE r4: SpellCheckCollator reports the
        # collation's actual number of hits)
        n = searcher.count(cand, op="AND")
        if n > 0:
            return {"collation": " ".join(cand), "hits": int(n),
                    "corrections": corrections}
        for j in range(len(mis)):
            nxt = list(combo)
            nxt[j] += 1
            tn = tuple(nxt)
            if nxt[j] < len(corrections[mis[j]]) and tn not in seen:
                seen.add(tn)
                heapq.heappush(heap, (s + 1, tn))
    return {"collation": None, "hits": 0, "corrections": corrections}


def jaspell_lookup(spark, path: str, key: str, num: int = 10,
                   only_more_popular: bool = False) -> list[tuple[str, int]]:
    """JaspellLookup.lookup analog (ref: lucene/suggest/.../jaspell/
    JaspellLookup.java:104-133 + JaspellTernarySearchTrie.matchPrefix):
    the candidate pool is the first ``num*2 if onlyMorePopular else
    num`` prefix matches in ALPHABETICAL (trie in-order) order — a
    faithful quirk of the reference: onlyMorePopular re-ranks only that
    alphabetically-capped pool by weight desc (LookupPriorityQueue), so
    a popular completion outside the first 2*num alphabetical matches
    never surfaces. Ties in the weight queue break surface-ascending
    (the reference's heap order on equal weights is insertion-
    dependent; we pin the deterministic choice). Shares the WFST
    completion table (build_wfst_suggester)."""
    count = num * 2 if only_more_popular else num
    rows = (spark.read.parquet(path)
            .filter(F.col("surface").startswith(key))
            .orderBy(F.asc("surface")).limit(count).collect())
    if only_more_popular:
        rows = sorted(rows, key=lambda r: (-r["weight"], r["surface"]))[:num]
    return [(r["surface"], int(r["weight"])) for r in rows]


def jaspell_match_almost(spark, path: str, key: str, num: int = 10,
                         diff: int = 2) -> list[tuple[str, int]]:
    """JaspellTernarySearchTrie.matchAlmost analog (:561-640): keys of
    the SAME length as ``key`` within Hamming distance <= diff
    (matchAlmostDiff; JaspellLookup sets 2), alphabetical order, capped
    at num. The per-position compare folds into one JVM expression —
    no UDF, prunable by the length predicate."""
    mismatches = None
    for i, ch in enumerate(key):
        m = F.when(F.substring("surface", i + 1, 1) != F.lit(ch),
                   1).otherwise(0)
        mismatches = m if mismatches is None else mismatches + m
    rows = (spark.read.parquet(path)
            .filter(F.length("surface") == len(key))
            .filter(mismatches <= diff)
            .orderBy(F.asc("surface")).limit(num).collect())
    return [(r["surface"], int(r["weight"])) for r in rows]


def build_fst_completion(spark, df: DataFrame, text_col: str,
                         weight_col: str, path: str, buckets: int = 10,
                         out_partitions: int = 8,
                         weights_are_buckets: bool = False) -> None:
    """FSTCompletionLookup.build analog (ref: lucene/suggest/.../fst/
    FSTCompletionLookup.java:169-214): weights discretize into
    ``buckets`` equal-count ranges of the (weight asc, surface-byte
    asc) sort order, equal weights inheriting the bucket of their
    first entry — which reduces to the pure per-weight rule
    bucket(w) = floor(|{weight < w}| * buckets / n). Computed from the
    distinct-weight histogram (one groupBy + a cumulative sum over the
    tiny histogram, broadcast-joined back) — never a full-data window,
    so a 10^9-term vocabulary quantizes without a hot partition.
    weights_are_buckets=True indexes the given ints verbatim
    (FSTCompletionBuilder.add(term, bucket) — the reference test's
    entry point)."""
    from pyspark.sql import Window
    comp = df.select(F.col(text_col).alias("surface"),
                     F.col(weight_col).cast("long").alias("weight")) \
        .filter(F.col("surface") != "")
    if weights_are_buckets:
        out = comp.select("surface", F.col("weight").alias("bucket"))
    else:
        n = comp.count()          # info.lines: one count job at build
        hist = comp.groupBy("weight").agg(F.count("*").alias("cnt"))
        w = Window.orderBy("weight").rowsBetween(Window.unboundedPreceding, -1)
        hist = hist.withColumn(
            "bucket", (F.coalesce(F.sum("cnt").over(w), F.lit(0))
                       * buckets / F.lit(n)).cast("long"))
        out = (comp.join(F.broadcast(hist.select("weight", "bucket")),
                         "weight")
               .select("surface", "bucket"))
    (out.repartitionByRange(out_partitions, "surface")
     .sortWithinPartitions("surface")
     .write.mode("overwrite").parquet(path))


def fst_completion_lookup(spark, path: str, key: str, num: int = 10,
                          exact_first: bool = True,
                          higher_weights_first: bool = True
                          ) -> list[tuple[str, int]]:
    """FSTCompletion.lookup analog (ref: lucene/suggest/.../fst/
    FSTCompletion.java:209-307 + checkExistingAndReorder:310):
    completions collect in (bucket desc, surface-byte asc) order until
    ``num`` are gathered. exactFirst applies ONLY when the list filled
    to num (the reference promotes/ inserts the exact match only on
    the truncation break): an exact match already collected moves to
    the front; otherwise an existing exact match displaces the tail.
    higher_weights_first=False = lookupSortedAlphabetically: all
    completions sorted by surface, trimmed to num. Returned weight is
    the BUCKET, as the reference returns."""
    if not key:
        return []
    comp = (spark.read.parquet(path)
            .filter(F.col("surface").startswith(key)))
    if not higher_weights_first:
        rows = comp.orderBy(F.asc("surface")).limit(num).collect()
        return [(r["surface"], int(r["bucket"])) for r in rows]
    rows = (comp.orderBy(F.desc("bucket"), F.asc("surface"))
            .limit(num).collect())
    res = [(r["surface"], int(r["bucket"])) for r in rows]
    if exact_first and len(res) == num:
        hit = [p for p in res if p[0] == key]
        if hit:
            res.remove(hit[0])
            res.insert(0, hit[0])
        else:
            ex = comp.filter(F.col("surface") == key).collect()
            if ex:
                res = [(key, int(ex[0]["bucket"]))] + res[:num - 1]
    return res
