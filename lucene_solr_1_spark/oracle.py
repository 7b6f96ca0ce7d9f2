"""Pure-NumPy reference implementation ("the oracle").

Plays the role of the Java reference inside the sandbox (SURVEY.md §7 P0):
a brute-force, single-process inverted index + BM25 searcher built
strictly from the formulas cited in SURVEY.md §2.G — the analog of
Lucene's in-order BooleanScorer2 twin that TestBoolean2 uses to check
the out-of-order BooleanScorer (ref: lucene/core/src/test/org/apache/
lucene/search/TestBoolean2.java:45,141-175). The distributed engine and
the WAND path must match it rank- and score-identically (float32).

DocID assignment: dense rank of ``url`` in lexicographic order — the
same deterministic rule the distributed build uses, so docids agree
without coordination.

Scoring: scatter-add per query term, in query-term order, in float32 —
the association order the Spark engine reproduces (see
search/engine.py). Top-k tie-break: (score desc, docid asc), matching
HitQueue.lessThan (ref: lucene/core/src/java/org/apache/lucene/search/
HitQueue.java:22).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .analysis.standard import analyze_series
from .index.smallfloat import encode_norm
from .search.bm25 import avg_field_length, make_weight, score_postings


@dataclass
class OracleIndex:
    urls: np.ndarray                      # sorted by url; index = docid
    norms: np.ndarray                     # uint8 per docid
    lengths: np.ndarray                   # int64 per docid
    tokens: list[list[str]]               # analyzed tokens per docid
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]  # term -> (docids, tfs, norms)
    max_doc: int
    sum_ttf: int
    term_stats: pd.DataFrame = field(default=None)  # term, df, ttf, max_tf

    @property
    def avgdl(self):
        return avg_field_length(self.sum_ttf, self.max_doc)


def build_oracle_index(urls, texts) -> OracleIndex:
    urls = np.asarray(urls, dtype=object)
    texts = pd.Series(np.asarray(texts, dtype=object))
    order = np.argsort(urls, kind="stable")  # urls are unique
    urls_sorted = urls[order]
    toks = analyze_series(texts.iloc[order].reset_index(drop=True)).tolist()
    lengths = np.array([len(t) for t in toks], dtype=np.int64)
    norms = encode_norm(lengths)

    # invert: flat (term, docid) -> tf
    n = len(toks)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks]) if lengths.sum() else np.empty(0, object)
    flat_docids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    stats_rows = []
    if len(flat_terms):
        df_flat = pd.DataFrame({"term": flat_terms, "docid": flat_docids})
        grouped = df_flat.groupby(["term", "docid"], sort=True).size().reset_index(name="tf")
        for term, g in grouped.groupby("term", sort=True):
            d = g["docid"].to_numpy(np.int64)
            t = g["tf"].to_numpy(np.int32)
            postings[term] = (d, t, norms[d])
            stats_rows.append((term, len(d), int(t.sum(dtype=np.int64)), int(t.max())))
    term_stats = pd.DataFrame(stats_rows, columns=["term", "df", "ttf", "max_tf"])
    return OracleIndex(
        urls=urls_sorted, norms=norms, lengths=lengths, tokens=toks,
        postings=postings, max_doc=n, sum_ttf=int(lengths.sum()),
        term_stats=term_stats,
    )


def oracle_search(idx: OracleIndex, terms: list[str], op: str = "OR",
                  k: int = 10, dtype=np.float32) -> pd.DataFrame:
    """Exact top-k: scatter-add in term order, (score desc, docid asc).

    op: 'OR' | 'AND' | 'MSM<m>' (minimum-should-match).
    Returns DataFrame(docid, url, score, rank).
    """
    msm = 1
    if op == "AND":
        msm = len(terms)
    elif op.startswith("MSM"):
        msm = int(op[3:])
    acc = np.zeros(idx.max_doc, dtype=dtype)
    nmatch = np.zeros(idx.max_doc, dtype=np.int32)
    avgdl = avg_field_length(idx.sum_ttf, idx.max_doc, dtype=dtype)
    for t in terms:
        if t not in idx.postings:
            continue
        d, tf, nb = idx.postings[t]
        tw = make_weight(t, len(d), idx.max_doc, avgdl, dtype=dtype)
        acc[d] += score_postings(tw, tf, nb, dtype=dtype)
        nmatch[d] += 1
    hit = np.flatnonzero(nmatch >= msm)
    if len(hit) == 0:
        return pd.DataFrame({"docid": pd.Series(dtype=np.int64),
                             "url": pd.Series(dtype=object),
                             "score": pd.Series(dtype=dtype),
                             "rank": pd.Series(dtype=np.int64)})
    scores = acc[hit]
    # top-k by (score desc, docid asc): lexsort on (-rank keys)
    order = np.lexsort((hit, -scores))[:k]
    sel, ssel = hit[order], scores[order]
    return pd.DataFrame({
        "docid": sel.astype(np.int64),
        "url": idx.urls[sel],
        "score": ssel,
        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
    })
