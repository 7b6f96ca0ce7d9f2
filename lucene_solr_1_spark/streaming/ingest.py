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

from ..index.build import (BUCKET_SHIFT, POSTINGS_SCHEMA, IndexPaths,
                           _invert_rows)


class StreamingIndexWriter:
    """foreachBatch sink: appends packed mini-segments per micro-batch."""

    def __init__(self, root: str, base_buckets: int = 1 << 18):
        # NRT generation buckets start at 2^18: above any realistic base
        # bucket count, and (2^18 + gen) << 44 still fits in int64
        self.paths = IndexPaths(root)
        self.base_buckets = base_buckets
        os.makedirs(self.nrt_dir, exist_ok=True)

    @property
    def nrt_dir(self):
        return os.path.join(self.paths.root, "nrt")

    @property
    def tombstones_dir(self):
        return os.path.join(self.paths.root, "tombstones")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One micro-batch -> one NRT generation (postings + docs rows).
        Input schema: (url, text); re-ingested urls tombstone old docs."""
        gen_bucket = self.base_buckets + int(batch_id)
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
        batch_df.select("url").distinct().withColumn("gen", F.lit(int(batch_id))) \
            .write.mode("append").parquet(self.tombstones_dir)
        man = {"generation": int(batch_id), "bucket": gen_bucket}
        with open(os.path.join(self.nrt_dir, f"gen_{batch_id}.json"), "w") as f:
            json.dump(man, f)

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


def nrt_postings(spark: SparkSession, root: str) -> DataFrame:
    """Base + NRT postings union (multi-segment reader view). NRT rows get
    bucket = -1 (they are never salted/merged until a compaction pass)."""
    paths = IndexPaths(root)
    base = spark.read.parquet(paths.postings)
    nrt_path = os.path.join(root, "nrt", "postings")
    if os.path.exists(nrt_path):
        nrt = (spark.read.parquet(nrt_path)
               .filter(F.col("term") != "\x00metrics")
               .withColumn("bucket", F.lit(-1).cast("int"))
               .drop("seg")
               .select(*[f.name for f in base.schema.fields]))
        return base.unionByName(nrt)
    return base
