"""Term vectors — the per-document forward index with positions and
char offsets (ref: lucene/core/src/java/org/apache/lucene/codecs/
compressing/CompressingTermVectorsWriter.java; read API
IndexReader.getTermVector(doc, field) -> Terms). Lucene stores vectors
as a SEPARATE per-doc file family (.tvx/.tvd/.tvf) beside the inverted
postings; the analog here is a parquet side table keyed by docid:

    (docid, terms array<string>, tfs array<int>,
     positions array<array<int>>, starts array<array<int>>,
     ends array<array<int>>)

range-partitioned and sorted by docid, so per-doc fetch prunes to one
file + row group via min/max stats (the .tvx seek analog). Built in
one shuffle-free pass over the docs table (tokenize once per doc —
the same moment Lucene writes vectors, IndexingChain termsHashPerField
with storeTermVectors=true).

Consumers:
* ``fast_vector_highlight`` — FastVectorHighlighter analog (ref:
  lucene/highlighter/.../vectorhighlight/FieldTermStack.java:60-100
  reads offsets FROM the vectors): passage selection + <em> markup use
  the stored char offsets; the document text is never re-analyzed.
* ``mlt_terms_from_vector`` — MoreLikeThis.retrieveTerms over a term
  vector (MoreLikeThis.java:756-800) instead of re-analyzing the doc.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis.standard import analyze_with_offsets

TV_SCHEMA = ("docid long, terms array<string>, tfs array<int>, "
             "positions array<array<int>>, starts array<array<int>>, "
             "ends array<array<int>>")


def _vectorize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in pdfs:
        rows = []
        for docid, text in zip(pdf["docid"], pdf["text"]):
            toks, poss, starts, ends = analyze_with_offsets(text)
            agg: dict[str, list[list[int]]] = {}
            for t, p, s, e in zip(toks, poss, starts, ends):
                a = agg.setdefault(t, [[], [], []])
                a[0].append(p)
                a[1].append(s)
                a[2].append(e)
            terms = sorted(agg)          # term-sorted, like the codec
            rows.append((docid, terms,
                         [len(agg[t][0]) for t in terms],
                         [agg[t][0] for t in terms],
                         [agg[t][1] for t in terms],
                         [agg[t][2] for t in terms]))
        yield pd.DataFrame(rows, columns=["docid", "terms", "tfs",
                                          "positions", "starts", "ends"])


def build_term_vectors(spark: SparkSession, docs: DataFrame, out_path: str,
                       text_col: str = "text", id_col: str = "docid",
                       out_partitions: int = 32) -> None:
    """One tokenize pass over the docs table -> docid-sorted parquet.
    Shuffle count: one (the range partition for docid locality)."""
    (docs.select(F.col(id_col).cast("long").alias("docid"),
                 F.col(text_col).alias("text"))
         .repartitionByRange(out_partitions, "docid")
         .mapInPandas(_vectorize, schema=TV_SCHEMA)
         .sortWithinPartitions("docid")
         .write.mode("overwrite").parquet(out_path))


def get_term_vector(spark: SparkSession, tv_path: str, docid: int
                    ) -> pd.DataFrame:
    """IndexReader.getTermVector analog: (term, tf, positions, starts,
    ends) rows for one doc — the docid predicate prunes to one file."""
    row = (spark.read.parquet(tv_path)
           .filter(F.col("docid") == int(docid)).collect())
    if not row:
        return pd.DataFrame(columns=["term", "tf", "positions",
                                     "starts", "ends"])
    r = row[0]
    return pd.DataFrame({"term": list(r["terms"]), "tf": list(r["tfs"]),
                         "positions": [list(p) for p in r["positions"]],
                         "starts": [list(s) for s in r["starts"]],
                         "ends": [list(e) for e in r["ends"]]})


def mlt_terms_from_vector(searcher, tv_path: str, docid: int,
                          max_query_terms: int = 25, min_tf: int = 2,
                          min_df: int = 5) -> list[str]:
    """MoreLikeThis term selection FROM the stored vector
    (MoreLikeThis.java:756-800 retrieveTerms(int docNum) — no
    re-analysis): rank the doc's terms by tf·idf, apply the tf/df
    floors, keep the top maxQueryTerms."""
    tv = get_term_vector(searcher.spark, tv_path, docid)
    if not len(tv):
        return []
    tv = tv[tv["tf"] >= min_tf]
    if not len(tv):
        return []
    st = searcher.term_stats(tv["term"].tolist()).set_index("term")
    out = []
    for t, tf in zip(tv["term"], tv["tf"]):
        if t not in st.index or int(st.loc[t, "df"]) < min_df:
            continue
        idf = np.log(searcher.max_doc / (float(st.loc[t, "df"]) + 1.0)) + 1.0
        out.append((t, float(tf) * idf))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in out[:max_query_terms]]


def _best_window(starts: np.ndarray, ends: np.ndarray,
                 term_ids: np.ndarray, frag_size: int
                 ) -> tuple[int, int, int]:
    """Max distinct query terms within a frag_size char window
    (two-pointer over the merged sorted occurrence list); ties ->
    earliest. Returns (win_start_idx, win_end_idx, n_distinct)."""
    best = (0, 0, 0)
    counts: dict[int, int] = {}
    lo = 0
    for hi in range(len(starts)):
        counts[term_ids[hi]] = counts.get(term_ids[hi], 0) + 1
        while ends[hi] - starts[lo] > frag_size:
            counts[term_ids[lo]] -= 1
            if not counts[term_ids[lo]]:
                del counts[term_ids[lo]]
            lo += 1
        if len(counts) > best[2]:
            best = (lo, hi, len(counts))
    return best


def fast_vector_highlight(spark: SparkSession, tv_path: str,
                          topk_with_text: DataFrame, query_terms: list[str],
                          frag_size: int = 150, pre: str = "<em>",
                          post: str = "</em>") -> DataFrame:
    """FastVectorHighlighter analog: the passage window and the <em>
    marks come from the STORED offsets (FieldTermStack over the term
    vector), not from re-analyzing text. Adds a `snippet` column."""
    qset = sorted(set(query_terms))
    qidx = {t: i for i, t in enumerate(qset)}
    ids = [int(r["docid"]) for r in topk_with_text.select("docid").collect()]
    tv = (spark.read.parquet(tv_path)
          .filter(F.col("docid").isin(ids))
          .filter(F.arrays_overlap("terms", F.array(*[F.lit(t)
                                                      for t in qset]))))

    def mark(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                occ = []
                for t, ss, ee in zip(r.terms, r.starts, r.ends):
                    if t in qidx:
                        occ.extend((s, e, qidx[t]) for s, e in zip(ss, ee))
                if not occ:
                    continue
                occ.sort()
                st = np.array([o[0] for o in occ])
                en = np.array([o[1] for o in occ])
                ti = np.array([o[2] for o in occ])
                lo, hi, _ = _best_window(st, en, ti, frag_size)
                w0 = int(st[lo])
                w1 = int(min(en[hi], w0 + frag_size))
                rows.append((r.docid, w0, w1,
                             [[int(a), int(b)] for a, b, _ in occ
                              if a >= w0 and b <= w1]))
            yield pd.DataFrame(rows, columns=["docid", "w0", "w1", "marks"])

    windows = tv.mapInPandas(
        mark, schema="docid long, w0 int, w1 int, marks array<array<int>>")

    joined = topk_with_text.join(windows, "docid", "left")

    def snip(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            snippets = []
            for r in pdf.itertuples(index=False):
                text = r.text or ""
                if r.marks is None or (isinstance(r.w0, float)
                                       and np.isnan(r.w0)):
                    snippets.append("")
                    continue
                w0, w1 = int(r.w0), int(r.w1)
                out, cur = [], w0
                for a, b in r.marks:
                    out.append(text[cur:a])
                    out.append(pre + text[a:b] + post)
                    cur = b
                out.append(text[cur:w1])
                snippets.append("".join(out))
            pdf = pdf.drop(columns=["w0", "w1", "marks"])
            pdf["snippet"] = snippets
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.schema.fields
        if f.name not in ("w0", "w1", "marks")) + ", snippet string"
    return joined.mapInPandas(snip, schema=out_schema)


def term_vectors_for_docs(spark: SparkSession, tv_path: str,
                          docids: list[int], positions: bool = False,
                          offsets: bool = False,
                          termstats_path: str | None = None,
                          df_counts: bool = False, tf_idf: bool = False
                          ) -> DataFrame:
    """TermVectorComponent analog (ref: solr/core/src/java/org/apache/
    solr/handler/component/TermVectorComponent.java:158-400): per-doc
    term info rows for a set of (top-k) docs — (docid, term, tf) plus,
    by flag, positions/starts/ends (tv.positions/tv.offsets), df
    (tv.df) and the reference's "tf-idf" which is LITERALLY tf/df
    (TermVectorComponent.java:396-400, its own TODO admits the name).

    Scale: the docid isin() predicate prunes the docid-sorted vector
    parquet to the hit files (top-k docs, not a corpus scan); df comes
    from the term-dictionary side joined AFTER the explode, when the
    left side is only (k docs x their distinct terms) rows."""
    tv = (spark.read.parquet(tv_path)
          .filter(F.col("docid").isin([int(d) for d in docids])))
    z = F.arrays_zip(F.col("terms").alias("term"), F.col("tfs").alias("tf"),
                     F.col("positions").alias("poss"),
                     F.col("starts").alias("starts"),
                     F.col("ends").alias("ends"))
    out = (tv.select("docid", F.explode(z).alias("e"))
           .select("docid", F.col("e.term").alias("term"),
                   F.col("e.tf").alias("tf"),
                   F.col("e.poss").alias("positions"),
                   F.col("e.starts").alias("starts"),
                   F.col("e.ends").alias("ends")))
    keep = ["docid", "term", "tf"]
    if positions:
        keep.append("positions")
    if offsets:
        keep += ["starts", "ends"]
    out = out.select(*keep)
    if (df_counts or tf_idf) and termstats_path:
        stats = (spark.read.parquet(termstats_path)
                 .select("term", F.col("df").alias("df")))
        # dictionary scan narrowed to the hit docs' terms (broadcast the
        # tiny term set into the big dict), then the small result
        # broadcasts back onto the exploded rows
        small = stats.join(F.broadcast(out.select("term").distinct()),
                           "term")
        out = (out.join(F.broadcast(small), ["term"], "left")
               .select(*keep, F.coalesce("df", F.lit(0)).alias("df")))
        if tf_idf:
            out = out.withColumn(
                "tf_idf", F.col("tf").cast("double") / F.col("df"))
        if not df_counts:
            out = out.drop("df")
    return out.orderBy("docid", "term")
