"""Spatial prefix-tree (search/spatial.py): token parity, cover
completeness, bbox/radius search vs brute force."""

import math
import random

import pandas as pd
from pyspark.sql import functions as F

from lucene_solr_1_spark.search.spatial import (bbox_cover,
                                                build_spatial_index,
                                                geo_bbox_search,
                                                geo_distance_search,
                                                quad_token_expr,
                                                quad_token_py)


def _rand_points(n, seed):
    rnd = random.Random(seed)
    return [(rnd.uniform(-90, 90), rnd.uniform(-180, 180))
            for _ in range(n)]


def test_quad_token_expr_matches_python(spark):
    pts = _rand_points(300, 3) + [(-90.0, -180.0), (90.0, 180.0),
                                  (0.0, 0.0), (89.999, 179.999)]
    pdf = pd.DataFrame(pts, columns=["lat", "lon"])
    df = spark.createDataFrame(pdf)
    for level in (1, 5, 11):
        got = df.select("lat", "lon",
                        quad_token_expr("lat", "lon", level).alias("t")
                        ).collect()
        for r in got:
            assert r["t"] == quad_token_py(r["lat"], r["lon"], level), \
                (level, r["lat"], r["lon"])


def test_bbox_cover_complete_and_bounded():
    """Every in-bbox point's leaf cell appears under some cover entry;
    the cover stays small (no full-grid blowup)."""
    rnd = random.Random(9)
    level = 8
    for _ in range(20):
        la0, la1 = sorted((rnd.uniform(-90, 90), rnd.uniform(-90, 90)))
        lo0, lo1 = sorted((rnd.uniform(-180, 180), rnd.uniform(-180, 180)))
        cover = bbox_cover(la0, la1, lo0, lo1, level)
        assert len(cover) <= 6000
        prefixes = [t for t, _ in cover]
        for _ in range(150):
            la = rnd.uniform(la0, la1)
            lo = rnd.uniform(lo0, lo1)
            tok = quad_token_py(la, lo, level)
            assert any(tok.startswith(p) for p in prefixes), \
                (la, lo, la0, la1, lo0, lo1)


import pytest


@pytest.fixture(scope="module")
def spatial_built(spark, tmp_root):
    pts = _rand_points(4000, 17)
    pdf = pd.DataFrame([(i, la, lo) for i, (la, lo) in enumerate(pts)],
                       columns=["docid", "lat", "lon"])
    path = tmp_root + "/spatial_idx"
    build_spatial_index(spark, spark.createDataFrame(pdf), "lat", "lon",
                        path, level=9, out_partitions=4)
    return pts, path


def test_geo_bbox_search_equals_bruteforce(spark, spatial_built):
    pts, path = spatial_built
    rnd = random.Random(23)
    for _ in range(5):
        la0, la1 = sorted((rnd.uniform(-90, 90), rnd.uniform(-90, 90)))
        lo0, lo1 = sorted((rnd.uniform(-180, 180), rnd.uniform(-180, 180)))
        got = sorted(r["docid"] for r in
                     geo_bbox_search(spark, path, la0, la1, lo0, lo1,
                                     level=9).collect())
        exp = sorted(i for i, (la, lo) in enumerate(pts)
                     if la0 <= la <= la1 and lo0 <= lo <= lo1)
        assert got == exp, (la0, la1, lo0, lo1)
    # bbox containing an exact data point on its boundary stays exact
    la, lo = pts[7]
    got = {r["docid"] for r in
           geo_bbox_search(spark, path, la, la, lo, lo, level=9).collect()}
    assert 7 in got


def test_geo_distance_search_equals_bruteforce(spark, spatial_built):
    pts, path = spatial_built

    def hav(la1, lo1, la2, lo2):
        r = 6371.0088
        dla = math.radians(la2 - la1) / 2
        dlo = math.radians(lo2 - lo1) / 2
        a = (math.sin(dla) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlo) ** 2)
        return 2 * r * math.asin(math.sqrt(a))

    for (qla, qlo, rad) in [(48.85, 2.35, 1500.0), (-33.9, 151.2, 800.0),
                            (85.0, 10.0, 2000.0)]:   # near-pole case
        got = sorted(r["docid"] for r in
                     geo_distance_search(spark, path, qla, qlo, rad,
                                         level=9).collect())
        exp = sorted(i for i, (la, lo) in enumerate(pts)
                     if hav(qla, qlo, la, lo) <= rad)
        assert got == exp, (qla, qlo, rad)


def test_bbox_scan_prunes(spark, spatial_built):
    """The cover predicate reaches the parquet scan as a pushed filter
    on token (the BlockTree-seek analog) — assert it appears in the
    scan node, not above it."""
    _, path = spatial_built
    df = geo_bbox_search(spark, path, 10.0, 20.0, 30.0, 50.0, level=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    scan_line = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("token" in ln for ln in scan_line)
