"""Similarity search over embedding columns (array<float>).

  * brute_force_topk — exact cosine top-k: JVM-side F.aggregate/zip_with
    dot products (whole-stage codegen, no Python), TakeOrderedAndProject
    for the top-k merge. The baseline every ANN variant is tested against.
  * ivf_topk         — IVF-style scale path: coarse centroids (here the
    label column or k-means-lite buckets), probe the nearest `nprobe`
    cells, exact rerank inside; scan cost drops to nprobe/ncells.
  * lsh_bucket_topk  — random-hyperplane LSH: deterministic pseudo-random
    planes from md5 of (dim, plane) pairs, sign-bit bucket key, exact
    rerank within the probed bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(vec_col: str, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    a = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return _dot(a, q) / (_norm(a) * _norm(q))


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding", key: str = "vec_id") -> DataFrame:
    return (df.select(key, cosine_col(vec_col, query).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(key)).limit(k))


def ivf_topk(df: DataFrame, query: list[float], k: int = 10, nprobe: int = 2,
             vec_col: str = "embedding", key: str = "vec_id",
             cell_col: str = "label") -> DataFrame:
    """Probe the `nprobe` cells whose centroid is nearest the query,
    exact cosine inside. Centroids = per-cell mean (one agg pass; at
    scale they'd be precomputed once and broadcast)."""
    dim_df = df.select(F.posexplode(F.col(vec_col)).alias("j", "v"), F.col(cell_col))
    cent = (dim_df.groupBy(cell_col, "j").agg(F.avg("v").alias("v"))
            .groupBy(cell_col)
            .agg(F.array_sort(F.collect_list(F.struct("j", "v"))).alias("jv")))
    cent = cent.select(cell_col, F.transform("jv", lambda s: s["v"]).alias("centroid"))
    probed = (cent.select(cell_col, cosine_col("centroid", query).alias("c"))
              .orderBy(F.desc("c"), F.asc(cell_col)).limit(nprobe))
    cand = df.join(F.broadcast(probed.select(cell_col)), cell_col)
    return brute_force_topk(cand, query, k, vec_col, key)


def _planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: md5(plane, dim) -> [-1, 1]."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            out[p, d] = (h / 0xFFFFFFFF) * 2.0 - 1.0
    return out


def lsh_bucket_key(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket id from dot products with the planes (JVM exprs)."""
    key = F.lit(0).cast("long")
    for p in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = (_dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), plane)
               > 0).cast("long")
        key = key + F.shiftleft(bit, p)
    return key


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    n_planes: int = 8, vec_col: str = "embedding",
                    key: str = "vec_id") -> DataFrame:
    """Exact rerank within the query's LSH bucket (recall < 1 by design;
    multi-probe = union of neighbor buckets, left to the caller)."""
    dim = len(query)
    planes = _planes(dim, n_planes)
    qkey = 0
    for p in range(n_planes):
        if float(np.dot(planes[p], np.asarray(query, dtype=np.float64))) > 0:
            qkey |= 1 << p
    bucketed = df.withColumn("_bk", lsh_bucket_key(vec_col, planes))
    return brute_force_topk(bucketed.filter(F.col("_bk") == qkey),
                            query, k, vec_col, key)
