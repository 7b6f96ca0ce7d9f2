"""Near-real-time ingest — the Structured Streaming analog of Lucene's
NRT reopen + Solr's update log (SURVEY.md §2.H):

  * each micro-batch (foreachBatch) becomes a new generation of
    mini-segments appended to an `nrt/` postings dir — exactly a DWPT
    flush that readers can see before any merge
    (ref: lucene/core/.../search/ControlledRealTimeReopenThread.java:43)
  * docids: (generation bucket) << 44 | rank — generations start above
    the base index's bucket space, so NRT docids never collide
  * updateDocument = delete-by-term + add (ref: index/IndexWriter.java:
    1187-1188): urls re-ingested are tombstoned; searchers anti-join the
    tombstone table (the .del bitset analog)
  * the streaming checkpointLocation plays the tlog role
    (solr/.../update/UpdateLog.java:72-135); Iceberg-style atomicity
    comes from parquet job commits per micro-batch

NrtSearcher unions base + NRT postings at query time (Lucene's
multi-segment reader view) and re-derives global stats.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import fsio
from ..index.build import (BUCKET_SHIFT, POSTINGS_SCHEMA, IndexPaths,
                           _invert_rows)


class StreamingIndexWriter:
    """foreachBatch sink: appends packed mini-segments per micro-batch."""

    GENS_PER_STREAM = 4096

    def __init__(self, root: str, base_buckets: int = 1 << 18, stream_id: int = 0):
        # NRT generation buckets start at 2^18: above any realistic base
        # bucket count, and (2^18 + gen) << 44 still fits in int64.
        # gen = stream_id * GENS_PER_STREAM + batch_id keeps docids unique
        # across concurrent writers AND idempotent under micro-batch
        # replay (same (stream, batch) -> same docids, the exactly-once
        # contract of foreachBatch + checkpointLocation).
        self.paths = IndexPaths(root)
        self.base_buckets = base_buckets
        self.stream_id = stream_id
        fsio.makedirs(self.nrt_dir)

    @property
    def nrt_dir(self):
        return os.path.join(self.paths.root, "nrt")

    @property
    def tombstones_dir(self):
        return os.path.join(self.paths.root, "tombstones")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One micro-batch -> one NRT generation (postings + docs rows).
        Input schema: (url, text); re-ingested urls tombstone old docs."""
        gen = self.stream_id * self.GENS_PER_STREAM + int(batch_id)
        gen_bucket = self.base_buckets + gen
        spark = batch_df.sparkSession

        def invert(batches):
            rank = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                pdf = pdf.sort_values("url").reset_index(drop=True)
                docids = ((np.int64(gen_bucket) << BUCKET_SHIFT)
                          | np.arange(rank, rank + len(pdf), dtype=np.int64))
                rank += len(pdf)
                rows, _ = _invert_rows(gen_bucket, docids,
                                       pdf["text"].reset_index(drop=True))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

        # NOTE single-partition ranks: coalesce(1) keeps ranks dense per
        # generation; at scale use one generation per (batch, partition)
        packed = (batch_df.select("url", "text").coalesce(1)
                  .mapInPandas(invert, schema=POSTINGS_SCHEMA))
        packed.write.mode("append").parquet(os.path.join(self.nrt_dir, "postings"))

        docs = (batch_df.select("url", "text").coalesce(1)
                .mapInPandas(self._docid_batch(gen_bucket), schema=T.StructType([
                    T.StructField("docid", T.LongType()),
                    T.StructField("url", T.StringType()),
                    T.StructField("text", T.StringType()),
                ])))
        docs.write.mode("append").parquet(os.path.join(self.nrt_dir, "docs"))
        # tombstone any earlier copy of these urls (updateDocument)
        batch_df.select("url").distinct().withColumn("gen", F.lit(gen)) \
            .write.mode("append").parquet(self.tombstones_dir)
        man = {"generation": gen, "stream_id": self.stream_id,
               "batch_id": int(batch_id), "bucket": gen_bucket}
        fsio.write_json_atomic(os.path.join(self.nrt_dir, f"gen_{gen}.json"), man)

    @staticmethod
    def _docid_batch(gen_bucket: int):
        def fn(batches):
            rank = 0
            for pdf in batches:
                pdf = pdf.sort_values("url").reset_index(drop=True)
                out = pd.DataFrame({
                    "docid": ((np.int64(gen_bucket) << BUCKET_SHIFT)
                              | np.arange(rank, rank + len(pdf), dtype=np.int64)),
                    "url": pdf["url"], "text": pdf["text"]})
                rank += len(pdf)
                yield out
        return fn

    def attach(self, stream_df: DataFrame, checkpoint: str, trigger: dict):
        """writeStream.foreachBatch wiring; trigger e.g. {'availableNow': True}."""
        return (stream_df.writeStream.foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint)
                .trigger(**trigger))


def _make_purge(deleted_sorted: np.ndarray):
    """Row-level delete application: rows whose docid range intersects the
    (broadcast, sorted) deleted set are decoded, filtered and re-packed;
    untouched rows pass through."""
    from ..index.codec import (decode_block, decode_positions,
                               pack_positions_batch, pack_postings_batch,
                               unpack_postings)

    def purge(batches):
        for pdf in batches:
            keep_rows = []
            for i, r in enumerate(pdf.itertuples(index=False)):
                buf = np.frombuffer(r.blob, np.uint8)
                # true last docid: decode just the final block (skip-list
                # style random access)
                lastd = int(decode_block(buf, int(r.block_offset[-1]),
                                         int(r.block_first_docid[-1]),
                                         int(r.block_n[-1]))[0][-1])
                j0 = np.searchsorted(deleted_sorted, r.first_docid)
                j1 = np.searchsorted(deleted_sorted, lastd, side="right")
                if j0 >= j1:   # no deleted id falls in this row's range
                    keep_rows.append(r._asdict())
                    continue
                d, tf, nb = unpack_postings(
                    np.frombuffer(r.blob, np.uint8),
                    np.asarray(r.block_offset, np.int64),
                    np.asarray(r.block_first_docid, np.int64),
                    np.asarray(r.block_n, np.int64))
                mask = ~np.isin(d, deleted_sorted)
                if mask.all():
                    keep_rows.append(r._asdict())
                    continue
                if not mask.any():
                    continue
                pos_blob = None
                if r.pos_blob is not None:
                    flat, bounds = decode_positions(bytes(r.pos_blob), tf)
                    gather = np.concatenate(
                        [np.arange(bounds[j], bounds[j + 1])
                         for j in np.flatnonzero(mask)])
                    pos_blob = pack_positions_batch(
                        np.array([0, int(mask.sum())]), tf[mask], flat[gather])[0]
                tp = pack_postings_batch(np.array([0, int(mask.sum())]),
                                         d[mask], tf[mask], nb[mask])[0]
                row = r._asdict()
                row.update(first_docid=int(d[mask][0]), df=tp.n,
                           ttf=int(tf[mask].sum()), max_tf=int(tf[mask].max()),
                           blob=tp.blob,
                           block_offset=tp.block_offset.tolist(),
                           block_first_docid=tp.block_first_docid.tolist(),
                           block_n=tp.block_n.tolist(),
                           block_max_tf=tp.block_max_tf.tolist(),
                           block_min_len=tp.block_min_len.tolist(),
                           pos_blob=pos_blob)
                keep_rows.append(row)
            if keep_rows:
                yield pd.DataFrame(keep_rows)

    return purge


def compact(spark: SparkSession, root: str, out_partitions: int = 32) -> None:
    """TieredMergePolicy analog (ref: index/TieredMergePolicy.java:75-86 —
    background merges fold small segments into bigger ones): fold all NRT
    generations into the base postings/docs/termstats tables, drop
    tombstoned docs, refresh stats, publish a new commit point. After
    compaction the nrt/ and tombstones/ dirs are removed."""
    import shutil
    from ..index.build import (IndexPaths, list_doc_files, merge_segments,
                               write_commit_point, write_stats)
    from ..search.engine import IndexSearcher

    paths = IndexPaths(root)
    nrt_post = os.path.join(root, "nrt", "postings")
    if not fsio.exists(nrt_post):
        return
    searcher = IndexSearcher(spark, root, include_nrt=True)
    excl = searcher._excluded_docids()

    # docs: base + nrt, minus tombstoned
    docs = spark.read.parquet(paths.docs)
    nrt_docs = os.path.join(root, "nrt", "docs")
    if fsio.exists(nrt_docs):
        docs = docs.unionByName(spark.read.parquet(nrt_docs))
    if excl is not None:
        docs = docs.join(excl, "docid", "left_anti")
    tmp_docs = paths.docs + ".compact"
    docs.write.mode("overwrite").parquet(tmp_docs)

    # postings: treat base rows + nrt rows as segment rows, re-merge.
    # Deleted docids are dropped inside the merge by rewriting blobs? No:
    # we keep it simple and exact — rebuild segments is NOT needed because
    # docids never change; we re-run the merge with the union as input.
    base = spark.read.parquet(paths.postings)
    nrt = (spark.read.parquet(nrt_post)
           .filter(F.col("term") != "\x00metrics"))
    seg_like = base.withColumn("seg", F.lit(0)).select(
        "term", "seg", "first_docid", "df", "ttf", "max_tf", "blob",
        "block_offset", "block_first_docid", "block_n", "block_max_tf",
        "block_min_len", "pos_blob")
    nrt_like = nrt.select(
        "term", F.lit(1).cast("int").alias("seg"), "first_docid", "df", "ttf",
        "max_tf", "blob", "block_offset", "block_first_docid", "block_n",
        "block_max_tf", "block_min_len", "pos_blob")
    union = seg_like.unionByName(nrt_like)
    # purge deleted docids from the posting rows (the merge that applies
    # the .del bitset, SegmentMerger's liveDocs handling)
    deleted = (np.sort(np.array([r["docid"] for r in excl.collect()], dtype=np.int64))
               if excl is not None else np.empty(0, np.int64))
    if len(deleted):
        union = union.mapInPandas(_make_purge(deleted), schema=union.schema)
    tmp = IndexPaths(root + ".compact")
    fsio.makedirs(tmp.root)
    union.write.mode("overwrite").parquet(tmp.segments)
    fsio.makedirs(tmp.docs)
    merge_segments(spark, tmp, num_segments=2, out_partitions=out_partitions)

    # publish: swap tables, refresh stats, new commit point
    fsio.rmtree(paths.postings)
    fsio.rename(tmp.postings, paths.postings)
    fsio.rmtree(paths.termstats)
    fsio.rename(tmp.termstats, paths.termstats)
    fsio.rmtree(paths.docs)
    fsio.rename(tmp_docs, paths.docs)
    fsio.rmtree(os.path.join(root, "nrt"))
    tomb = os.path.join(root, "tombstones")
    if fsio.exists(tomb):
        fsio.rmtree(tomb)
    fsio.rmtree(tmp.root, ignore_errors=True)
    # the swapped dirs keep their paths: invalidate Spark's cached file
    # listings so readers see the new generation (REFRESH TABLE analog)
    for p in (paths.postings, paths.termstats, paths.docs):
        spark.catalog.refreshByPath(p)
    stats = write_stats(spark, paths)
    # lineage: compaction is a new checkpoint era — record the net doc/len
    # delta of the folded NRT generations (+ purged tombstones) so the
    # manifests keep summing to the live corpus (CheckIndex invariant)
    man_files = [f for f in fsio.listdir(paths.checkpoints) if f.endswith(".json")]
    prev_docs = prev_len = 0
    for fn in man_files:
        m = fsio.read_json(os.path.join(paths.checkpoints, fn))
        prev_docs += m["n_docs"]
        prev_len += m["sum_len"]
    delta = {
        "n_docs": stats["max_doc"] - prev_docs,
        "n_terms": 0, "n_postings": 0,
        "sum_len": stats["sum_total_term_freq"] - prev_len,
        "min_docid": -1, "max_docid": -1, "duration_sec": 0.0,
        "docs_per_sec": None, "bytes": 0,
        "lineage": {"input": "nrt compaction", "folded_generations": True},
    }
    gen_name = f"seg_compact_{len(man_files)}.json"
    fsio.write_json_atomic(os.path.join(paths.checkpoints, gen_name), delta)
    write_commit_point(paths, stats)


def nrt_postings(spark: SparkSession, root: str) -> DataFrame:
    """Base + NRT postings union (multi-segment reader view). NRT rows get
    bucket = -1 (they are never salted/merged until a compaction pass)."""
    paths = IndexPaths(root)
    base = spark.read.parquet(paths.postings)
    nrt_path = os.path.join(root, "nrt", "postings")
    if fsio.exists(nrt_path):
        nrt = (spark.read.parquet(nrt_path)
               .filter(F.col("term") != "\x00metrics")
               .withColumn("bucket", F.lit(-1).cast("int"))
               .drop("seg")
               .select(*[f.name for f in base.schema.fields]))
        return base.unionByName(nrt)
    return base


def realtime_get(spark: SparkSession, root: str, urls: list[str]) -> DataFrame:
    """Solr realtime-get analog (ref: solr/.../update/UpdateLog.java:72-135
    + handler/component/RealTimeGetComponent): fetch the LATEST live
    version of each url without waiting for a commit/compaction — the
    newest NRT generation wins over base; a url whose newest tombstone is
    newer than every surviving copy returns no row (deleted).

    Returns DataFrame(url, docid, text, gen) for the urls that are live.
    Docid pushdown prunes the base scan; NRT generations are small.
    """
    paths = IndexPaths(root)
    want = spark.createDataFrame([(u,) for u in urls], "url string")
    base = (spark.read.parquet(paths.docs)
            .join(F.broadcast(want), "url")
            .withColumn("gen", F.lit(-1).cast("long")))
    nrt_docs = os.path.join(root, "nrt", "docs")
    writer = StreamingIndexWriter(root)
    cands = base
    if fsio.exists(nrt_docs):
        gen_of = (F.shiftrightunsigned(F.col("docid"), BUCKET_SHIFT)
                  - F.lit(writer.base_buckets)).cast("long")
        nrt = (spark.read.parquet(nrt_docs)
               .join(F.broadcast(want), "url")
               .withColumn("gen", gen_of))
        cands = base.unionByName(nrt.select(*base.columns))
    tomb_dir = os.path.join(root, "tombstones")
    if fsio.exists(tomb_dir):
        tombs = (spark.read.parquet(tomb_dir)
                 .groupBy("url").agg(F.max("gen").alias("tomb_gen")))
        cands = (cands.join(F.broadcast(tombs), "url", "left")
                 .filter(F.col("tomb_gen").isNull()
                         | (F.col("gen") >= F.col("tomb_gen")))
                 .drop("tomb_gen"))
    from pyspark.sql.window import Window
    w = Window.partitionBy("url").orderBy(F.desc("gen"), F.desc("docid"))
    return (cands.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
            .select("url", "docid", "text", "gen"))
