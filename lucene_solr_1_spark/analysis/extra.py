"""Optional analysis stages beyond the StandardAnalyzer chain — the
engine's TokenFilter extension surface (SURVEY §2.I: swappable stages).

Analogs from lucene/analysis/common:
  ascii_fold   — ASCIIFoldingFilter (accented Latin -> ASCII)
  shingles     — ShingleFilter (word n-grams, used by MinHash dedup)
  ngrams       — NGramTokenFilter (char n-grams)
  edge_ngrams  — EdgeNGramTokenFilter (prefix grams, autocomplete)

Each has a JVM Column form (for indexing pipelines) and a plain-Python
form (for oracles/tests).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, functions as F


# ------------------------------------------------------------- python side

def ascii_fold_py(token: str) -> str:
    return (unicodedata.normalize("NFKD", token)
            .encode("ascii", "ignore").decode("ascii"))


def shingles_py(tokens: list[str], n: int = 2, sep: str = " ") -> list[str]:
    return [sep.join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def ngrams_py(token: str, n: int = 3) -> list[str]:
    return [token[i:i + n] for i in range(len(token) - n + 1)]


def edge_ngrams_py(token: str, min_n: int = 1, max_n: int = 5) -> list[str]:
    return [token[:k] for k in range(min_n, min(max_n, len(token)) + 1)]


# ---------------------------------------------------------------- JVM side

_FOLD_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ"
_FOLD_TO = "aaaaaaceeeeiiiinooooouuuuyy" + "oa"  # œ->o(e dropped), æ->a


def ascii_fold_expr(col: Column | str) -> Column:
    """translate()-based folding for the common Latin-1 range (the JVM
    fast path; the Python form handles full NFKD)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _FOLD_FROM, _FOLD_TO)


def shingles_expr(tokens: Column, n: int = 2, sep: str = " ") -> Column:
    """ShingleFilter as a higher-order expression over an array column."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(F.sequence(F.lit(0), F.size(tokens) - n),
                    lambda i: F.concat_ws(sep, F.slice(tokens, i + 1, n)))
    ).otherwise(F.array())


def edge_ngrams_expr(token: Column, min_n: int = 1, max_n: int = 5) -> Column:
    return F.filter(
        F.transform(F.sequence(F.lit(min_n), F.lit(max_n)),
                    lambda k: F.substring(token, 1, k)),
        lambda g: F.length(g) >= min_n)
