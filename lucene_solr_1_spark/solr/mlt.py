"""MoreLikeThis — find documents similar to a seed document.

Reference: lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java:137 — extract the seed doc's top terms by tf·idf
(subject to minTermFreq/minDocFreq/maxQueryTerms), build a boolean
SHOULD query from them, search.
"""

from __future__ import annotations

import numpy as np

from ..analysis.standard import analyze_text
from ..search.engine import BooleanQuery, IndexSearcher


def more_like_this(searcher: IndexSearcher, docid: int | None = None,
                   like_text: str | None = None, max_query_terms: int = 25,
                   min_term_freq: int = 2, min_doc_freq: int = 2,
                   k: int = 10):
    """Returns (query, topk DataFrame). Seed = a stored doc or raw text."""
    from pyspark.sql import functions as F
    if like_text is None:
        if docid is None:
            raise ValueError("need docid or like_text")
        row = (searcher.spark.read.parquet(searcher.paths.docs)
               .filter(F.col("docid") == docid).select("text").collect())
        if not row:
            raise KeyError(f"docid {docid} not found")
        like_text = row[0]["text"]
    toks = analyze_text(like_text)
    if not toks:
        return BooleanQuery(k=k), searcher.search([], "OR", k)
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    keep = tfs >= min_term_freq
    terms, tfs = terms[keep], tfs[keep]
    if len(terms) == 0:
        return BooleanQuery(k=k), searcher.search([], "OR", k)
    st = searcher.term_stats([str(t) for t in terms]).set_index("term")
    scored = []
    for t, tf in zip(terms, tfs):
        if t not in st.index or int(st.loc[t, "df"]) < min_doc_freq:
            continue
        idf = np.log(searcher.max_doc / (int(st.loc[t, "df"]) + 1)) + 1.0  # MLT's idf
        scored.append((float(tf * idf), str(t)))
    scored.sort(key=lambda x: (-x[0], x[1]))
    qterms = [t for _, t in scored[:max_query_terms]]
    q = BooleanQuery(should=qterms, min_should_match=1, k=k)
    topk = searcher.search(q)
    if docid is not None:
        topk = topk.filter(F.col("docid") != docid)
    return q, topk
