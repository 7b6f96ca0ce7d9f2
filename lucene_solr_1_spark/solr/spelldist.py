"""String distances for spellcheck candidate ranking.

Twins of the reference's StringDistance implementations (ref:
lucene/suggest/src/java/org/apache/lucene/search/spell/
JaroWinklerDistance.java, NGramDistance.java,
LuceneLevenshteinDistance.java, LevensteinDistance.java) — implemented
from the published algorithms (Winkler 1990; Kondrak, SPIRE 2005;
Damerau/OSA) with the reference's exact parameterization quirks:

  * JaroWinkler: boost threshold 0.7, scaling min(0.1, 1/maxLen),
    prefix length computed over the SHORTER string with NO cap at 4
    (the reference deviates from Winkler's classic 4-char cap).
  * NGramDistance: Kondrak n-gram DP with null-prefix padding and
    prefix-match discounting; positional-match fallback for strings
    shorter than n.
  * LuceneLevenshtein: OSA (adjacent transposition = 1 edit) over
    codepoints, scaled 1 - d/min(len) — the FuzzyTermsEnum-consistent
    scaling (NOT max).
  * Levenstein (classic): plain Levenshtein scaled 1 - d/max(len).

All return Java-float (float32) rounded results so candidate ordering
matches the reference bit-for-bit. ``distance_expr`` folds the two
SQL-expressible metrics into JVM Catalyst expressions; the DP-based
ones ship as an Arrow-batched pandas_udf (one fixed query word vs a
bounded candidate column — never a row-at-a-time Python UDF plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T


def _f32(x: float) -> float:
    return float(np.float32(x))


def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> float:
    """JaroWinklerDistance.getDistance (JaroWinklerDistance.java:38-106).
    Higher = more similar (it is a similarity despite the class name)."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for mi in range(len(mn)):
        if s1[mi] == s2[mi]:
            prefix += 1
        else:
            break
    m = np.float32(matches)
    j = _f32((m / np.float32(len(s1)) + m / np.float32(len(s2))
              + (m - np.float32(transpositions)) / m) / np.float32(3))
    if j < threshold:
        return j
    # the reference's boost: min(0.1, 1/maxLen) * prefix (NO 4-char cap)
    return _f32(np.float32(j) + min(np.float32(0.1),
                                    np.float32(1) / np.float32(len(mx)))
                * np.float32(prefix) * (np.float32(1) - np.float32(j)))


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """NGramDistance.getDistance (NGramDistance.java:54-143): Kondrak
    SPIRE'05 n-gram DP, null-char prefix padding, prefix-match
    discount. Similarity in [0,1]."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(source[i] == target[i] for i in range(min(sl, tl)))
        return _f32(np.float32(cost) / np.float32(max(sl, tl)))
    sa = "\x00" * (n - 1) + source
    p = np.arange(sl + 1, dtype=np.float32)
    d = np.zeros(sl + 1, dtype=np.float32)
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\x00" * (n - j) + target[:j]
        else:
            t_j = target[j - n:j]
        d[0] = np.float32(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\x00":
                    tn -= 1            # discount null-prefix matches
            ec = np.float32(cost) / np.float32(tn)
            d[i] = min(min(d[i - 1] + np.float32(1), p[i] + np.float32(1)),
                       p[i - 1] + ec)
        p, d = d, p
    return _f32(np.float32(1) - p[sl] / np.float32(max(tl, sl)))


def lucene_levenshtein(target: str, other: str) -> float:
    """LuceneLevenshteinDistance.getDistance (:49-107): OSA
    (adjacent-transposition) edit distance over codepoints, scaled by
    the SHORTER length: 1 - d/min(m,n)."""
    a = [ord(c) for c in target]
    b = [ord(c) for c in other]
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = np.zeros((n + 1, m + 1), dtype=np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i, j] = min(d[i, j], d[i - 2, j - 2] + cost)
    return _f32(np.float32(1)
                - np.float32(int(d[n, m])) / np.float32(min(m, n)))


def levenstein(s1: str, s2: str) -> float:
    """LevensteinDistance.getDistance: classic Levenshtein scaled
    1 - d/max(len) (LevensteinDistance.java)."""
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    prev = list(range(n + 1))
    cur = [0] * (n + 1)
    for j in range(1, m + 1):
        cur[0] = j
        c2 = s2[j - 1]
        for i in range(1, n + 1):
            cost = 0 if s1[i - 1] == c2 else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev, cur = cur, prev
    return _f32(np.float32(1)
                - np.float32(prev[n]) / np.float32(max(n, m)))


DISTANCES = {
    "jarowinkler": jaro_winkler,
    "ngram": ngram_distance,
    "lucene_levenshtein": lucene_levenshtein,
    "levenstein": levenstein,
}


def distance_udf(word: str, metric: str = "jarowinkler") -> Column:
    """Arrow-batched pandas_udf computing metric(candidate, word) for a
    candidate term column (spellcheck re-rank: one fixed query word,
    bounded candidate set — the DirectSpellChecker comparator path,
    SuggestWordScoreComparator). Values are float32-exact vs the
    reference, emitted as double for SQL comparability."""
    fn = DISTANCES[metric]

    @F.pandas_udf(T.DoubleType())
    def _dist(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: float(fn(t, word)))

    return _dist


def pair_distance_udf(metric: str, n: int = 2) -> "Column":
    """Arrow-batched pandas_udf computing metric(s1, s2) over two
    string columns — the StringDistanceFunction ValueSource shape
    (solr strdist(a, b, jw|ngram))."""
    if metric == "jarowinkler":
        fn = jaro_winkler
    elif metric == "ngram":
        fn = lambda a, b: ngram_distance(a, b, n)       # noqa: E731
    elif metric == "lucene_levenshtein":
        fn = lucene_levenshtein
    else:
        fn = levenstein

    @F.pandas_udf(T.DoubleType())
    def _dist(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series([float(fn(a or "", b or ""))
                          for a, b in zip(s1, s2)])

    return _dist


def rerank_suggestions(searcher, word: str, metric: str = "jarowinkler",
                       max_edits: int = 2, n: int = 5, min_df: int = 1):
    """SpellChecker.suggestSimilar with a pluggable StringDistance
    (ref: spell/SpellChecker.java: setStringDistance + suggestSimilar
    ranks by sd.getDistance desc): candidates pre-filter by levenshtein
    <= max_edits (parquet-prunable JVM expr), then re-rank by the
    chosen metric (distance desc, df desc, term asc)."""
    w = word.lower()
    ts = searcher.spark.read.parquet(searcher.paths.termstats)
    lev = F.levenshtein(F.col("term"), F.lit(w))
    cand = ts.filter((lev <= max_edits) & (F.col("df") >= min_df))
    scored = cand.withColumn(
        "distance", F.round(distance_udf(w, metric)(F.col("term")), 6))
    return (scored.orderBy(F.desc("distance"), F.desc("df"), F.asc("term"))
            .select("term", "distance", "df").limit(n))
