"""Highlighter — query-term snippet extraction over stored fields.

Analog of lucene/highlighter's Highlighter/PostingsHighlighter (ref:
lucene/highlighter/src/java/org/apache/lucene/search/highlight/
Highlighter.java; SURVEY.md §2 module map): pick the best window of the
stored text by summed query-term hits, wrap matches in tags. Runs as a
vectorized pandas pass over the (small) fetched top-k — highlighting is
a presentation step on k rows, never a distributed scan.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..analysis.standard import TOKEN_RE, analyze_text


def best_fragment(text: str, terms: set[str], frag_size: int = 150,
                  pre: str = "<em>", post: str = "</em>") -> str:
    """Best-scoring fragment: the window around the densest run of term
    matches (greedy, like SimpleFragmenter + QueryScorer)."""
    if not text:
        return ""
    matches = [(m.start(), m.end()) for m in TOKEN_RE.finditer(text)
               if m.group(0).lower() in terms]
    if not matches:
        return text[:frag_size]
    starts = np.array([m[0] for m in matches])
    # densest window: max #matches within frag_size chars
    best_i, best_n = 0, 1
    for i in range(len(starts)):
        n = int(np.searchsorted(starts, starts[i] + frag_size) - i)
        if n > best_n:
            best_i, best_n = i, n
    lo = max(0, int(starts[best_i]) - 20)
    hi = min(len(text), lo + frag_size)
    frag = text[lo:hi]
    out = []
    last = 0
    for s, e in matches:
        s, e = s - lo, e - lo
        if s < 0 or e > len(frag):
            continue
        out.append(frag[last:s]); out.append(pre); out.append(frag[s:e]); out.append(post)
        last = e
    out.append(frag[last:])
    return ("…" if lo > 0 else "") + "".join(out) + ("…" if hi < len(text) else "")


def highlight(topk_with_text: DataFrame, query: str | list[str],
              text_col: str = "text", frag_size: int = 150) -> DataFrame:
    """Adds a `snippet` column to a fetched top-k DataFrame."""
    terms = set(analyze_text(query) if isinstance(query, str) else query)

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: best_fragment(t or "", terms, frag_size))

    return topk_with_text.withColumn("snippet", snip(text_col))
