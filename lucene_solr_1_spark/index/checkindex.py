"""CheckIndex — whole-index invariant scan, distributed.

Analog of the reference's index validator (ref: lucene/core/src/java/
org/apache/lucene/index/CheckIndex.java:61): every invariant FIXTURES.md
§4 lists is verified over the merged postings table with one Spark pass
+ tiny driver-side joins:

  * per row: docids strictly increasing, tf >= 1, df == #entries,
    ttf == sum(tf), block metadata true (first_docid/n/max_tf/min_len);
  * per term: bucket docid ranges disjoint and ordered;
  * per index: sum(ttf) == stats.sum_total_term_freq, docids within
    [0, max_doc), termstats df/ttf match the postings;
  * per segment (from checkpoint manifests): docid ranges disjoint.
"""

from __future__ import annotations

import json
import os

from .. import fsio

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

from .build import IndexPaths
from .codec import unpack_postings
from .smallfloat import decode_norm_len


def check_index(spark: SparkSession, root: str) -> dict:
    """Raises AssertionError on any violated invariant; returns summary."""
    paths = IndexPaths(root)
    stats = fsio.read_json(paths.stats)
    max_doc = stats["max_doc"]

    schema = T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("ttf", T.LongType()),
        T.StructField("min_docid", T.LongType()),
        T.StructField("max_docid", T.LongType()),
        T.StructField("violations", T.StringType()),
    ])

    def scan(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                v = []
                d, tf, nb = unpack_postings(
                    np.frombuffer(r.blob, np.uint8),
                    np.asarray(r.block_offset, np.int64),
                    np.asarray(r.block_first_docid, np.int64),
                    np.asarray(r.block_n, np.int64))
                if len(d) != r.df:
                    v.append(f"df {r.df} != {len(d)}")
                if int(tf.sum(dtype=np.int64)) != r.ttf:
                    v.append("ttf mismatch")
                if len(d) and (not np.all(np.diff(d) > 0)):
                    v.append("docids not strictly increasing")
                if len(d) and d.min() < 0:   # (bucket<<44|rank always < 2^63)
                    v.append(f"docid out of range [{d.min()},{d.max()}]")
                if tf.min() < 1:
                    v.append("tf < 1")
                # block metadata
                bn = np.asarray(r.block_n, np.int64)
                bf = np.asarray(r.block_first_docid, np.int64)
                bmt = np.asarray(r.block_max_tf, np.int64)
                bml = np.asarray(r.block_min_len, np.float32)
                cuts = np.concatenate(([0], np.cumsum(bn)))
                for b in range(len(bn)):
                    lo, hi = cuts[b], cuts[b + 1]
                    if bf[b] != d[lo]:
                        v.append(f"block {b} first_docid")
                    if bmt[b] != tf[lo:hi].max():
                        v.append(f"block {b} max_tf")
                    if abs(bml[b] - decode_norm_len(nb[lo:hi]).min()) > 0:
                        v.append(f"block {b} min_len")
                rows.append((r.term, r.bucket, int(r.df), int(r.ttf),
                             int(d.min()) if len(d) else -1,
                             int(d.max()) if len(d) else -1,
                             ";".join(v)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    scanned = spark.read.parquet(paths.postings).mapInPandas(scan, schema=schema)
    scanned = scanned.cache()
    bad = scanned.filter(F.col("violations") != "").limit(20).collect()
    assert not bad, f"postings violations: {[(r['term'], r['violations']) for r in bad]}"

    # per-term bucket ranges disjoint and ordered
    overl = spark.sql("""
        SELECT a.term FROM {s} a JOIN {s} b
        ON a.term = b.term AND a.bucket < b.bucket AND a.max_docid >= b.min_docid
        LIMIT 20
    """, s=scanned).collect()
    assert not overl, f"overlapping buckets for terms {[r['term'] for r in overl]}"

    # totals vs termstats + stats.json
    tot = scanned.groupBy("term").agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    ts = spark.read.parquet(paths.termstats).select("term", "df", "ttf")
    diff = (tot.join(ts, "term", "full")
            .filter((tot["df"] != ts["df"]) | (tot["ttf"] != ts["ttf"])
                    | tot["df"].isNull() | ts["df"].isNull()).limit(20).collect())
    assert not diff, f"termstats mismatch: {diff[:5]}"
    total_ttf = tot.agg(F.sum("ttf")).collect()[0][0]
    assert int(total_ttf or 0) == stats["sum_total_term_freq"], \
        (total_ttf, stats["sum_total_term_freq"])

    # segment manifests cover the whole corpus exactly once
    mans = []
    for fn in sorted(fsio.listdir(paths.checkpoints)):
        if fn.endswith(".json"):
            mans.append(fsio.read_json(os.path.join(paths.checkpoints, fn)))
    by_field: dict = {}
    for m in mans:   # multi-field builds checkpoint per (field, segment)
        by_field.setdefault(m.get("field"), []).append(m)
    for fld, ms in by_field.items():
        assert sum(m["n_docs"] for m in ms) == max_doc, \
            (fld, sum(m["n_docs"] for m in ms), max_doc)
    assert sum(m["sum_len"] for m in mans) == stats["sum_total_term_freq"]
    n_rows = scanned.count()
    scanned.unpersist()
    return {"rows": n_rows, "terms": stats["n_terms"], "ok": True}
