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


SEPARATOR_TERM = ""          # WordBreakSpellChecker.SEPARATOR_TERM


def _df_lookup(termstats: DataFrame, candidates: list[str]) -> dict[str, int]:
    """One pushed-down isin filter over the termstats parquet fetching
    document frequencies for a bounded candidate set (the docFreq()
    calls of the reference, batched into a single distributed scan —
    never one query per candidate)."""
    cands = sorted({c for c in candidates if c})
    if not cands:
        return {}
    rows = (termstats.filter(F.col("term").isin(cands))
            .select("term", "df").collect())
    return {r["term"]: int(r["df"]) for r in rows}


def word_breaks(termstats: DataFrame, term: str, max_suggestions: int = 5,
                suggest_mode: str = "SUGGEST_WHEN_NOT_IN_INDEX",
                sort_method: str = "NUM_CHANGES_THEN_MAX_FREQUENCY",
                min_break_length: int = 1, max_changes: int = 1,
                min_suggestion_frequency: int = 1,
                max_evaluations: int = 1000) -> list[list[dict]]:
    """WordBreakSpellChecker.suggestWordBreaks twin (ref: lucene/suggest/
    .../spell/WordBreakSpellChecker.java:93-132,258-307): break ``term``
    into dictionary-word sequences. Every piece must have df >=
    min_suggestion_frequency; score = number of breaks; results rank
    (fewest breaks, then max- or summed-frequency desc, then words
    asc — a deterministic pin of the reference's unspecified tie).
    ``termstats`` is a (term, df) DataFrame; all docFreq lookups for
    the O(len^2)-bounded candidate substrings batch into ONE pushed-down
    scan, so query cost is independent of vocabulary size.

    Returns a list of suggestions, each a list of
    {"string", "freq", "score"} dicts (SuggestWord[][])."""
    if max_suggestions < 1:
        return []
    t = term.lower()
    minlen = max(min_break_length, 1)
    # candidate pieces: the recursion splits the right remainder, so
    # every piece is a substring t[i:j]; O(len^2) bounded candidates
    subs = [t[i:j] for i in range(len(t)) for j in range(i + 1, len(t) + 1)]
    dfs = _df_lookup(termstats, subs + [t])
    orig_freq = dfs.get(t, 0)
    if orig_freq > 0 and suggest_mode == "SUGGEST_WHEN_NOT_IN_INDEX":
        return []
    use_min_freq = min_suggestion_frequency
    if suggest_mode == "SUGGEST_MORE_POPULAR":
        use_min_freq = orig_freq if orig_freq else 1

    suggestions: list[list[dict]] = []
    evaluations = [0]

    def gen(text: str, number_breaks: int, prefix: list[dict]):
        if len(text) < minlen * 2:
            return
        for i in range(minlen, len(text) - minlen + 1):
            left, right = text[:i], text[i:]
            lf = dfs.get(left, 0)
            if lf >= use_min_freq:
                rf = dfs.get(right, 0)
                if rf >= use_min_freq:
                    score = len(prefix) + 1
                    sugg = ([{**w, "score": score} for w in prefix]
                            + [{"string": left, "freq": lf, "score": score},
                               {"string": right, "freq": rf, "score": score}])
                    suggestions.append(sugg)
                if number_breaks + 1 <= max_changes:
                    gen(right, number_breaks + 1,
                        prefix + [{"string": left, "freq": lf, "score": 1}])
            evaluations[0] += 1
            if evaluations[0] >= max_evaluations:
                break

    gen(t, 1, [])
    if sort_method == "NUM_CHANGES_THEN_SUMMED_FREQUENCY":
        freq_key = lambda s: sum(w["freq"] for w in s)      # noqa: E731
    else:
        freq_key = lambda s: max(w["freq"] for w in s)      # noqa: E731
    suggestions.sort(key=lambda s: (len(s), -freq_key(s),
                                    [w["string"] for w in s]))
    return suggestions[:max_suggestions]


def word_combinations(termstats: DataFrame, terms: list[str],
                      max_suggestions: int = 5,
                      suggest_mode: str = "SUGGEST_WHEN_NOT_IN_INDEX",
                      max_combine_length: int = 20, max_changes: int = 1,
                      min_suggestion_frequency: int = 1,
                      max_evaluations: int = 1000) -> list[dict]:
    """WordBreakSpellChecker.suggestWordCombinations twin
    (WordBreakSpellChecker.java:162-256): combine up to max_changes+1
    ADJACENT terms into one dictionary word. SUGGEST_WHEN_NOT_IN_INDEX
    requires at least one combined term absent from the index
    (minFreq == 0); SUGGEST_MORE_POPULAR requires the combination's df
    >= every component's df. Score = number of combinations (= pieces
    - 1); rank (fewest combinations, freq desc, indexes asc). An empty
    string is the SEPARATOR_TERM barrier. All docFreq lookups batch
    into one scan.

    Returns [{"string", "freq", "score", "indexes": [...]}, ...]."""
    if max_suggestions < 1:
        return []
    terms = [x.lower() if x else x for x in terms]
    # bounded candidate set: adjacent runs of length 2..max_changes+1
    cands = []
    for i in range(len(terms) - 1):
        if terms[i] == SEPARATOR_TERM:
            continue
        comb = terms[i]
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            if terms[j] == SEPARATOR_TERM:
                break
            comb += terms[j]
            if len(comb) > max_combine_length:
                break
            cands.append(comb)
    dfs = _df_lookup(termstats, cands
                     + [x for x in terms if x != SEPARATOR_TERM])
    orig_freqs = ([dfs.get(x, 0) for x in terms]
                  if suggest_mode != "SUGGEST_ALWAYS" else None)

    out: list[dict] = []
    evaluations = 0
    for i in range(len(terms) - 1):
        if terms[i] == SEPARATOR_TERM:
            continue
        if len(terms[i]) > max_combine_length:
            continue
        max_freq = orig_freqs[i] if orig_freqs is not None else 0
        min_freq = orig_freqs[i] if orig_freqs is not None else (1 << 31)
        comb = terms[i]
        for j in range(i + 1, len(terms)):
            if j - i > max_changes:
                break
            if terms[j] == SEPARATOR_TERM:
                break
            comb += terms[j]
            if len(comb) > max_combine_length:
                break
            if orig_freqs is not None:
                max_freq = max(max_freq, orig_freqs[j])
                min_freq = min(min_freq, orig_freqs[j])
            cf = dfs.get(comb, 0)
            if (suggest_mode != "SUGGEST_MORE_POPULAR" or cf >= max_freq):
                if (suggest_mode != "SUGGEST_WHEN_NOT_IN_INDEX"
                        or min_freq == 0):
                    if cf >= min_suggestion_frequency:
                        out.append({"string": comb, "freq": cf,
                                    "score": j - i,
                                    "indexes": list(range(i, j + 1))})
            evaluations += 1
            if evaluations == max_evaluations:
                break
        if evaluations == max_evaluations:
            break
    out.sort(key=lambda s: (s["score"], -s["freq"], s["indexes"]))
    return out[:max_suggestions]


def build_infix_suggester(spark, df: DataFrame, text_col: str,
                          weight_col: str, path: str,
                          out_partitions: int = 8) -> None:
    """AnalyzingInfixSuggester.build analog (ref: lucene/suggest/.../
    analyzing/AnalyzingInfixSuggester.java:160-306: suggestions index
    into an ordinary Lucene index pre-SORTED BY WEIGHT DESC so lookup
    is a first-N collect): materialize (surface, weight, tokens[]) with
    the analyzed token array as the match key, range-partitioned by
    weight desc — parquet min/max prunes the low-weight row groups the
    same way the weight-sorted segments bound the reference's early
    termination."""
    from ..analysis.standard import analyze_expr
    comp = df.select(
        F.col(text_col).alias("surface"),
        F.col(weight_col).cast("long").alias("weight"),
        analyze_expr(text_col).alias("tokens"))
    (comp.filter(F.size("tokens") > 0)
     .withColumn("nweight", -F.col("weight"))
     .repartitionByRange(out_partitions, "nweight")
     .sortWithinPartitions("nweight")
     .drop("nweight")
     .write.mode("overwrite").parquet(path))


def infix_suggest(spark, path: str, key: str, num: int = 10,
                  all_terms_required: bool = True,
                  do_highlight: bool = False) -> list[tuple]:
    """AnalyzingInfixSuggester.lookup analog (AnalyzingInfixSuggester
    .java:339-446): analyze the key; every token but the last must
    match some indexed token EXACTLY; the last token matches as a
    PREFIX of any indexed token — unless the key ends with discarded
    chars (trailing whitespace), in which case it too must match
    exactly. allTermsRequired=False turns the conjunction into a
    disjunction (SHOULD). Rank: weight desc (the index's pre-sort),
    surface asc pinned for ties. do_highlight wraps matched tokens in
    <b></b>, bolding only the matched PREFIX of a prefix match
    (:458-500 addPrefixMatch)."""
    from ..analysis.standard import analyze_text, analyze_with_offsets
    toks, _, _, ends = analyze_with_offsets(key)
    if not toks:
        return []
    last_is_prefix = bool(ends) and ends[-1] == len(key)
    exact, last = toks[:-1], toks[-1]
    comp = spark.read.parquet(path)
    clauses = [F.array_contains("tokens", t) for t in exact]
    if last_is_prefix:
        clauses.append(F.exists("tokens",
                                lambda x: x.startswith(last)))
    else:
        exact = exact + [last]
        clauses.append(F.array_contains("tokens", last))
    cond = clauses[0]
    for c in clauses[1:]:
        cond = (cond & c) if all_terms_required else (cond | c)
    rows = (comp.filter(cond)
            .orderBy(F.desc("weight"), F.asc("surface"))
            .limit(num).collect())
    out = []
    matched = set(exact)
    for r in rows:
        text = r["surface"]
        if do_highlight:
            parts, upto = [], 0
            ts, _, starts, tends = analyze_with_offsets(text)
            for tok, s, e in zip(ts, starts, tends):
                if upto < s:
                    parts.append(text[upto:s])
                    upto = s
                elif upto > s:
                    continue
                if tok in matched:
                    parts.append("<b>" + text[s:e] + "</b>")
                    upto = e
                elif last_is_prefix and tok.startswith(last):
                    cut = s + len(last)
                    parts.append("<b>" + text[s:cut] + "</b>"
                                 + text[cut:e])
                    upto = e
            parts.append(text[upto:])
            text = "".join(parts)
        out.append((text, int(r["weight"])))
    return out


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
