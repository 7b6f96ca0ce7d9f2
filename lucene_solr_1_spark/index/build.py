"""Distributed inverted-index build — the Spark re-expression of
Lucene's write path (SURVEY.md §3.2).

Stage 0  docid assignment (= IndexWriter's dense per-segment docIDs,
         ref: lucene/core .../index/AtomicReader.java docID model):
         range-partition by url + within-partition sort + partition-count
         offsets ⇒ docid == global lexicographic rank of url. The oracle
         uses the same rule, so ids agree with zero coordination.

Stage 1  per-segment inversion + pack (= DocumentsWriterPerThread flush,
         ref: index/DocumentsWriterPerThread.java:58-80, FreqProxTerms-
         WriterPerField.java:166-216): one task per segment tokenizes,
         counts (term, docid) tfs, computes norms, FOR/varint-packs each
         term's postings. Emits a per-segment checkpoint manifest with
         lineage + docs/sec metrics (north_rule); a segment whose
         manifest already exists is skipped on re-run (resumability).

Stage 2  global merge (= SegmentMerger, ref: index/SegmentMerger.java:
         71-119): repartition by (term, bucket) where head terms fan out
         to multiple contiguous-segment buckets sized by total df — the
         explicit skew salting the north_rule demands. Head terms stay
         split across rows (bounded work per task at any scale); tail
         terms collapse to one row. Output is a postings table
         range-partitioned and sorted by term (parquet min/max stats
         play the role of the .tip FST term index,
         ref: codecs/BlockTreeTermsWriter.java:182-187).

All heavy compute is vectorized NumPy inside mapInPandas/applyInPandas;
every relational step (range partition, group, agg, sort) is stock
Catalyst.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..analysis.htmlstrip import extract_text_series
from ..analysis.standard import analyze_flat
from ..index.codec import pack_postings_batch, unpack_postings
from ..index.smallfloat import encode_norm

# target postings per merged row: bounds per-task merge work for head terms
TARGET_ROW_POSTINGS = 1 << 20

POSTINGS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("seg", T.IntegerType()),
    T.StructField("df", T.LongType()),
    T.StructField("ttf", T.LongType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("blob", T.BinaryType()),
    T.StructField("block_offset", T.ArrayType(T.IntegerType())),
    T.StructField("block_first_docid", T.ArrayType(T.LongType())),
    T.StructField("block_n", T.ArrayType(T.IntegerType())),
    T.StructField("block_max_tf", T.ArrayType(T.IntegerType())),
    T.StructField("block_min_len", T.ArrayType(T.FloatType())),
])

MERGED_SCHEMA = T.StructType(
    [T.StructField("term", T.StringType()), T.StructField("bucket", T.IntegerType())]
    + [f for f in POSTINGS_SCHEMA.fields if f.name not in ("term", "seg")]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self):      return os.path.join(self.root, "docs")
    @property
    def segments(self):  return os.path.join(self.root, "segments")
    @property
    def postings(self):  return os.path.join(self.root, "postings")
    @property
    def termstats(self): return os.path.join(self.root, "termstats")
    @property
    def stats(self):     return os.path.join(self.root, "stats.json")
    @property
    def checkpoints(self): return os.path.join(self.root, "_checkpoints")


def _success(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


# ------------------------------------------------------------- stage 0

def assign_docids(spark: SparkSession, docs: DataFrame, out: IndexPaths,
                  num_segments: int) -> None:
    """Write docs table (seg, docid, url, text): docid = global url rank.

    Deterministic regardless of range-sampler boundaries: any range
    partitioning + within-partition sort + prefix-sum of partition sizes
    yields the global sort rank.

    The partitioned input is persisted between the count job and the
    write job: repartitionByRange derives its sampling seed from the
    RDD id, so two executions of the same plan can pick different
    boundaries — the cache pins one materialization for both actions.
    (At cluster scale use StorageLevel.DISK_ONLY, or stage the sorted
    rows to a table first; the persist IS the write-once pass.)
    """
    if _success(out.docs):
        return
    if "text" not in docs.columns:
        to_text = F.pandas_udf(extract_text_series, T.StringType())
        docs = docs.withColumn("text", to_text("html"))
    from pyspark import StorageLevel
    part = docs.select("url", "text").repartitionByRange(num_segments, "url") \
               .sortWithinPartitions("url") \
               .persist(StorageLevel.MEMORY_AND_DISK)
    sizes = (part.select(F.spark_partition_id().alias("pid"))
                 .groupBy("pid").count().collect())
    counts: dict[int, int] = {r["pid"]: r["count"] for r in sizes}
    bases = {}
    acc = 0
    for pid in range(num_segments):
        bases[pid] = acc
        acc += counts.get(pid, 0)

    def add_ids(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        base = bases[pid]
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["docid"] = np.arange(base + seen, base + seen + n, dtype=np.int64)
            pdf["seg"] = np.int32(pid)
            seen += n
            yield pdf[["seg", "docid", "url", "text"]]

    schema = T.StructType([
        T.StructField("seg", T.IntegerType()),
        T.StructField("docid", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    part.mapInPandas(add_ids, schema=schema) \
        .write.mode("overwrite").partitionBy("seg").parquet(out.docs)
    part.unpersist()


# ------------------------------------------------------------- stage 1

def _invert_segment(pdf: pd.DataFrame) -> pd.DataFrame:
    """One segment -> packed postings rows + one metrics sentinel row."""
    t0 = time.time()
    pdf = pdf.sort_values("docid").reset_index(drop=True)
    seg = int(pdf["seg"].iloc[0])
    docids = pdf["docid"].to_numpy(np.int64)
    row_ids, flat_toks = analyze_flat(pdf["text"])
    lens = np.bincount(row_ids, minlength=len(pdf)).astype(np.int64)
    norms = encode_norm(lens)

    rows = []
    total_postings = 0
    if lens.sum() > 0:
        # flat (term_code, docid) -> tf via lexsort + run-length reduce,
        # all NumPy (the DWPT TermsHash analog, no per-token Python)
        flat_docs = docids[row_ids]
        codes, uniq_terms = pd.factorize(flat_toks, sort=True)
        order = np.lexsort((flat_docs, codes))
        c_s, d_s = codes[order], flat_docs[order]
        new = np.concatenate(([True], (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])))
        starts = np.flatnonzero(new)
        tf_all = np.diff(np.append(starts, len(c_s))).astype(np.int64)
        c_post, d_post = c_s[starts], d_s[starts]
        norm_by_doc = np.zeros(int(docids.max()) + 1, dtype=np.uint8)
        norm_by_doc[docids] = norms
        n_post = norm_by_doc[d_post]
        term_bounds = np.concatenate(
            (np.flatnonzero(np.concatenate(([True], c_post[1:] != c_post[:-1]))),
             [len(c_post)]))
        packed = pack_postings_batch(term_bounds, d_post, tf_all, n_post)
        ttfs = np.add.reduceat(tf_all, term_bounds[:-1])
        maxtfs = np.maximum.reduceat(tf_all, term_bounds[:-1])
        for i, tp in enumerate(packed):
            total_postings += tp.n
            rows.append((
                str(uniq_terms[c_post[term_bounds[i]]]), seg, tp.n, int(ttfs[i]),
                int(maxtfs[i]), tp.blob,
                tp.block_offset.tolist(), tp.block_first_docid.tolist(),
                tp.block_n.tolist(), tp.block_max_tf.tolist(),
                tp.block_min_len.tolist(),
            ))
    dur = time.time() - t0
    metrics = {
        "seg": seg, "n_docs": int(len(pdf)), "n_terms": len(rows),
        "n_postings": int(total_postings), "sum_len": int(lens.sum()),
        "min_docid": int(docids.min()) if len(docids) else -1,
        "max_docid": int(docids.max()) if len(docids) else -1,
        "duration_sec": round(dur, 4),
        "docs_per_sec": round(len(pdf) / dur, 2) if dur > 0 else None,
        "bytes": int(sum(len(r[5]) for r in rows)),
    }
    rows.append(("\x00metrics", seg, 0, metrics["sum_len"], 0,
                 json.dumps(metrics).encode(), [], [], [], [], []))
    return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])


def build_segments(spark: SparkSession, out: IndexPaths, num_segments: int) -> None:
    """Stage 1 over segments missing a checkpoint manifest (resumable)."""
    os.makedirs(out.checkpoints, exist_ok=True)
    done = {int(f[4:-5]) for f in os.listdir(out.checkpoints)
            if f.startswith("seg_") and f.endswith(".json")}
    missing = [s for s in range(num_segments) if s not in done]
    if not missing:
        return
    docs = spark.read.parquet(out.docs).filter(F.col("seg").isin(missing))
    packed = docs.groupBy("seg").applyInPandas(_invert_segment, schema=POSTINGS_SCHEMA)
    mode = "overwrite" if not done else "append"
    packed.write.mode(mode).partitionBy("seg").parquet(out.segments)
    # manifests: extract sentinel metric rows from what was just written
    seg_df = spark.read.parquet(out.segments).filter(
        (F.col("term") == "\x00metrics") & F.col("seg").isin(missing))
    for r in seg_df.select("seg", "blob").collect():
        m = json.loads(bytes(r["blob"]).decode())
        m["lineage"] = {"input": out.docs, "partition": f"seg={r['seg']}"}
        tmp = os.path.join(out.checkpoints, f".seg_{r['seg']}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, os.path.join(out.checkpoints, f"seg_{r['seg']}.json"))


# ------------------------------------------------------------- stage 2

def _merge_group_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merge MANY (term, bucket) groups in one vectorized pass.

    Input rows are sorted by (term, bucket, seg) with whole groups
    present. Single-row groups (rare terms in one segment) pass their
    blob through unchanged — decode is skipped entirely; multi-row
    groups are decoded, concatenated (docid ranges are contiguous in
    seg order) and batch re-packed."""
    keys = (pdf["term"].astype(str) + "\x1f" + pdf["bucket"].astype(str)).to_numpy()
    new = np.concatenate(([True], keys[1:] != keys[:-1]))
    gstarts = np.flatnonzero(new)
    gsizes = np.diff(np.append(gstarts, len(keys)))

    out_rows = []
    multi_d, multi_t, multi_n, multi_meta = [], [], [], []
    blobs = pdf["blob"].to_numpy(object)
    cols = {c: pdf[c].to_numpy(object) for c in
            ("term", "bucket", "df", "ttf", "max_tf", "block_offset",
             "block_first_docid", "block_n", "block_max_tf", "block_min_len")}
    for gi, lo in enumerate(gstarts):
        sz = int(gsizes[gi])
        if sz == 1:
            out_rows.append((cols["term"][lo], int(cols["bucket"][lo]),
                             int(cols["df"][lo]), int(cols["ttf"][lo]),
                             int(cols["max_tf"][lo]), blobs[lo],
                             list(cols["block_offset"][lo]),
                             list(cols["block_first_docid"][lo]),
                             list(cols["block_n"][lo]),
                             list(cols["block_max_tf"][lo]),
                             list(cols["block_min_len"][lo])))
            continue
        for r in range(lo, lo + sz):
            d, t, nb = unpack_postings(
                np.frombuffer(blobs[r], np.uint8),
                np.asarray(cols["block_offset"][r], np.int64),
                np.asarray(cols["block_first_docid"][r], np.int64),
                np.asarray(cols["block_n"][r], np.int64))
            multi_d.append(d); multi_t.append(t); multi_n.append(nb)
        multi_meta.append((cols["term"][lo], int(cols["bucket"][lo])))
    if multi_meta:
        d = np.concatenate(multi_d); t = np.concatenate(multi_t)
        nb = np.concatenate(multi_n)
        # recompute group bounds from per-group posting counts
        per_row_counts = np.array([len(x) for x in multi_d], dtype=np.int64)
        # rows per group = gsizes of multi groups, in order
        msizes = gsizes[gsizes > 1]
        row_bounds = np.concatenate(([0], np.cumsum(msizes)))
        gbounds = np.concatenate(([0], np.cumsum(
            np.add.reduceat(per_row_counts, row_bounds[:-1]))))
        packed = pack_postings_batch(gbounds, d, t, nb)
        for i, tp in enumerate(packed):
            lo, hi = gbounds[i], gbounds[i + 1]
            out_rows.append((multi_meta[i][0], multi_meta[i][1], tp.n,
                             int(t[lo:hi].sum(dtype=np.int64)), int(t[lo:hi].max()),
                             tp.blob, tp.block_offset.tolist(),
                             tp.block_first_docid.tolist(), tp.block_n.tolist(),
                             tp.block_max_tf.tolist(), tp.block_min_len.tolist()))
    return pd.DataFrame(out_rows, columns=[f.name for f in MERGED_SCHEMA.fields])


def _merge_stream(batches):
    """Streaming group merge over sorted Arrow batches: a (term, bucket)
    group may span batch boundaries; carry the trailing group forward."""
    buf: pd.DataFrame | None = None
    for pdf in batches:
        if buf is not None and len(buf):
            pdf = pd.concat([buf, pdf], ignore_index=True)
        if not len(pdf):
            continue
        keys = (pdf["term"].astype(str) + "\x1f" + pdf["bucket"].astype(str)).to_numpy()
        not_last = keys != keys[-1]
        suffix_start = int(np.flatnonzero(not_last).max()) + 1 if not_last.any() else 0
        buf = pdf.iloc[suffix_start:]
        if suffix_start:
            yield _merge_group_block(pdf.iloc[:suffix_start])
    if buf is not None and len(buf):
        yield _merge_group_block(buf)


def merge_segments(spark: SparkSession, out: IndexPaths, num_segments: int,
                   out_partitions: int | None = None) -> None:
    if _success(out.postings) and _success(out.termstats):
        return
    segs = spark.read.parquet(out.segments).filter(F.col("term") != "\x00metrics")
    totals = segs.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
        F.max("max_tf").alias("max_tf"))
    totals.repartitionByRange(max(4, (out_partitions or 32) // 4), "term") \
          .sortWithinPartitions("term") \
          .write.mode("overwrite").parquet(out.termstats)

    # head-term fan-out: nsalts = ceil(df_total / TARGET); contiguous seg runs
    nsalts = F.greatest(F.lit(1), F.ceil(F.col("df_total") / F.lit(TARGET_ROW_POSTINGS)))
    with_tot = segs.join(totals.select(F.col("term"), F.col("df").alias("df_total")), "term")
    bucketed = with_tot.withColumn(
        "bucket",
        ((F.col("seg").cast("long") * nsalts) / F.lit(num_segments)).cast("int"))
    merged = (bucketed.drop("df_total")
              .repartitionByRange(out_partitions or 32, "term", "bucket")
              .sortWithinPartitions("term", "bucket", "seg")
              .mapInPandas(_merge_stream, schema=MERGED_SCHEMA))
    merged.write.mode("overwrite").parquet(out.postings)


def write_stats(spark: SparkSession, out: IndexPaths) -> dict:
    docs = spark.read.parquet(out.docs)
    max_doc = docs.count()
    agg = spark.read.parquet(out.termstats).agg(
        F.sum("ttf").alias("sum_ttf"), F.count("*").alias("n_terms")).collect()[0]
    stats = {
        "max_doc": int(max_doc),
        "sum_total_term_freq": int(agg["sum_ttf"] or 0),
        "n_terms": int(agg["n_terms"]),
    }
    with open(out.stats, "w") as f:
        json.dump(stats, f, indent=1)
    return stats


def build_index(spark: SparkSession, docs: DataFrame, root: str,
                num_segments: int = 16, out_partitions: int | None = None) -> IndexPaths:
    """Full build: resumable; re-running with complete checkpoints is a no-op."""
    out = IndexPaths(root)
    os.makedirs(root, exist_ok=True)
    assign_docids(spark, docs, out, num_segments)
    build_segments(spark, out, num_segments)
    merge_segments(spark, out, num_segments, out_partitions)
    write_stats(spark, out)
    return out
