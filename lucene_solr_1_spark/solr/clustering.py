"""Search-result clustering: ClusteringComponent twin with STC.

The reference's clustering contrib (solr/contrib/clustering/.../
CarrotClusteringEngine.java) hands the top-k docs' title+snippet text
to a Carrot2 algorithm and emits clusters as {labels, score, docs}
(clusterToNamedList:560-590).  Carrot2 itself is an external library;
this twin implements the published STC algorithm it ships
(org.carrot2.clustering.stc.STCClusteringAlgorithm — Zamir & Etzioni,
"Web Document Clustering: A Feasibility Demonstration", SIGIR'98)
from the paper, with Carrot2's documented defaults:

  1. base clusters = maximal phrases (1..max_phrase_len tokens)
     shared by >= 2 documents, subsumed phrases dropped (a longer
     phrase with the SAME document set wins);
  2. base score = |B| * f(P) where f counts only "effective" words
     (not stopwords, document frequency >= 3 docs or >2 total when
     the result set is small, and <= 40% of the collection), f
     penalizes single-word phrases (x0.5) and caps at 6;
  3. the top max_base_clusters base clusters with score >=
     min_base_cluster_score merge when both overlap ratios
     |B1 n B2|/|Bi| exceed merge_threshold (0.6) — connected
     components become clusters;
  4. clusters emit Carrot2-style dicts: phrases of the best base
     clusters as labels, score = sum of member base scores, docs =
     union; unclustered docs go to the trailing "Other Topics"
     cluster (Carrot2's synthetic group).

Result sets are top-k sized (<= a few hundred docs), so clustering
one result list is driver-light by design — the same position the
reference is in (Carrot2 runs in the Solr JVM per request).  The
Spark surface clusters MANY queries' result sets in parallel with
applyInPandas, one group per query id.
"""

from __future__ import annotations

import re

from ..analysis.standard import ENGLISH_STOP_WORDS as _STOP

_TOKEN_RE = re.compile(r"[^\W_]+")

MAX_PHRASE_LEN = 6


def _tokenize(text: str) -> list[str]:
    return [m.group().lower() for m in _TOKEN_RE.finditer(text or "")]


def cluster_results(docs, title_field: str = "title",
                    snippet_field: str = "snippet",
                    doc_id_field: str = "doc_id",
                    max_clusters: int = 15,
                    max_base_clusters: int = 300,
                    min_base_cluster_score: float = 2.0,
                    merge_threshold: float = 0.6,
                    max_labels: int = 3,
                    include_other: bool = True) -> list[dict]:
    """STC over one result list (list of dicts) ->
    [{"labels", "score", "docs"}] sorted by score desc, plus the
    "Other Topics" group."""
    toks = []
    ids = []
    for d in docs:
        ids.append(d[doc_id_field])
        # None sentinel between fields: phrases never span the
        # title/snippet boundary (Carrot2 keeps fields separate too)
        toks.append(_tokenize(str(d.get(title_field) or "")) + [None] +
                    _tokenize(str(d.get(snippet_field) or "")))
    n_docs = len(docs)
    if n_docs == 0:
        return []

    # word document frequencies for the "effective word" test
    word_df: dict[str, int] = {}
    for tk in toks:
        for w in set(tk):
            if w is not None:
                word_df[w] = word_df.get(w, 0) + 1
    min_df = 3 if n_docs >= 6 else 2
    max_df = max(1, int(0.4 * n_docs)) if n_docs >= 6 else n_docs

    def effective(word: str) -> bool:
        df = word_df.get(word, 0)
        return word not in _STOP and min_df <= df <= max_df

    # phrase -> set of doc indexes
    phrase_docs: dict[tuple, set] = {}
    for di, tk in enumerate(toks):
        seen: set[tuple] = set()
        for i in range(len(tk)):
            if tk[i] is None:
                continue
            for ln in range(1, MAX_PHRASE_LEN + 1):
                if i + ln > len(tk):
                    break
                if tk[i + ln - 1] is None:  # field-boundary sentinel
                    break
                p = tuple(tk[i:i + ln])
                if p not in seen:
                    seen.add(p)
                    phrase_docs.setdefault(p, set()).add(di)
    shared = {p: ds for p, ds in phrase_docs.items() if len(ds) >= 2}

    # subsumption: drop p if an extension covers the same docs
    subsumed: set[tuple] = set()
    for p, ds in shared.items():
        if len(p) >= 2:
            for sub in (p[1:], p[:-1]):
                if sub in shared and shared[sub] == ds:
                    subsumed.add(sub)

    def f_effective(p: tuple) -> float:
        k = sum(1 for w in p if effective(w))
        if k == 0:
            return 0.0
        if k == 1:
            return 0.5
        return float(min(k, MAX_PHRASE_LEN))

    base = []
    for p, ds in shared.items():
        if p in subsumed:
            continue
        score = len(ds) * f_effective(p)
        if score >= min_base_cluster_score:
            base.append((score, p, ds))
    base.sort(key=lambda b: (-b[0], b[1]))
    base = base[:max_base_clusters]
    if not base:
        out = []
        if include_other and n_docs:
            out.append({"labels": ["Other Topics"], "score": 0.0,
                        "docs": [ids[i] for i in range(n_docs)],
                        "other": True})
        return out

    # merge graph: both-way overlap > threshold
    m = len(base)
    parent = list(range(m))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(m):
        for j in range(i + 1, m):
            inter = len(base[i][2] & base[j][2])
            if inter and inter / len(base[i][2]) > merge_threshold \
                    and inter / len(base[j][2]) > merge_threshold:
                parent[find(i)] = find(j)

    groups: dict[int, list[int]] = {}
    for i in range(m):
        groups.setdefault(find(i), []).append(i)

    clusters = []
    covered: set[int] = set()
    for members in groups.values():
        members.sort(key=lambda i: (-base[i][0], base[i][1]))
        label_phrases: list[str] = []
        label_seen: set[tuple] = set()
        for i in members:
            p = base[i][1]
            if p not in label_seen:
                label_seen.add(p)
                label_phrases.append(" ".join(p))
            if len(label_phrases) >= max_labels:
                break
        doc_set: set[int] = set()
        for i in members:
            doc_set |= base[i][2]
        covered |= doc_set
        clusters.append({
            "labels": label_phrases,
            "score": round(sum(base[i][0] for i in members), 4),
            "docs": [ids[i] for i in sorted(doc_set)],
        })
    clusters.sort(key=lambda c: (-c["score"], c["labels"]))
    clusters = clusters[:max_clusters]
    if include_other:
        rest = [ids[i] for i in range(n_docs) if i not in covered]
        if rest:
            clusters.append({"labels": ["Other Topics"], "score": 0.0,
                             "docs": rest, "other": True})
    return clusters


def cluster_results_df(df, query_col: str = "query_id",
                       title_col: str = "title",
                       snippet_col: str = "snippet",
                       doc_id_col: str = "doc_id", **kw):
    """Spark surface: cluster each query's result set independently —
    applyInPandas, one group per query id (the component runs per
    request in the reference; here thousands of requests cluster in
    parallel). -> DataFrame(query_id, labels, score, docs)."""
    from pyspark.sql.types import (ArrayType, DoubleType, StringType,
                                   StructField, StructType)

    # doc ids keep the input column's type (string ids and the like
    # work — cluster_results treats ids as opaque)
    id_type = df.schema[doc_id_col].dataType
    schema = StructType([
        StructField(query_col, df.schema[query_col].dataType),
        StructField("labels", ArrayType(StringType())),
        StructField("score", DoubleType()),
        StructField("docs", ArrayType(id_type)),
    ])

    def one_group(pdf):
        import pandas as pd
        qid = pdf[query_col].iloc[0]
        docs = [{"doc_id": r[doc_id_col], "title": r[title_col],
                 "snippet": r[snippet_col]}
                for _, r in pdf.iterrows()]
        rows = [(qid, c["labels"], float(c["score"]), list(c["docs"]))
                for c in cluster_results(docs, **kw)]
        return pd.DataFrame(rows, columns=[query_col, "labels", "score",
                                           "docs"])

    return df.groupBy(query_col).applyInPandas(one_group, schema)
