"""spark-submit entry point for the index build + query job (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Cluster:
    cd /root/repo && zip -qr /tmp/lucene_solr_1_spark.zip lucene_solr_1_spark
    spark-submit --py-files /tmp/lucene_solr_1_spark.zip \
        tools/submit_build.py --input <docs.parquet> --root <index_root> \
        [--segments 256] [--out-partitions 64] [--positions] \
        [--query "term1 term2" --k 10]

Takes master/executor config from the cluster (no hard-coded master);
`getOrCreate()` inherits whatever spark-submit provides. The build is
resumable: re-submitting with the same --root skips completed segments
via the checkpoint manifests and is a no-op when everything is done.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="corpus: Iceberg table name/path (when the "
                         "runtime is on the classpath) or parquet of "
                         "docs with (url, text) or (url, html)")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="Iceberg time-travel snapshot id")
    ap.add_argument("--root", required=True, help="index output directory")
    ap.add_argument("--segments", type=int, default=256)
    ap.add_argument("--out-partitions", type=int, default=None)
    ap.add_argument("--positions", action="store_true",
                    help="also store positional postings (.pos analog)")
    ap.add_argument("--query", default=None,
                    help="optional smoke query (whitespace-separated terms)")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("lucene_solr_1_spark.build")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.sources.corpus import read_corpus
    docs = read_corpus(spark, args.input, snapshot_id=args.snapshot_id,
                       require=("url",))
    if "text" not in docs.columns and "html" not in docs.columns:
        raise SystemExit(
            f"corpus at {args.input!r} has neither a text nor an html "
            "column; the build needs one of them")
    t0 = time.time()
    paths = build_index(spark, docs, args.root, num_segments=args.segments,
                        out_partitions=args.out_partitions,
                        positions=args.positions)
    build_sec = time.time() - t0
    with open(paths.stats) as f:
        stats = json.load(f)
    report = {"root": paths.root, "build_sec": round(build_sec, 2),
              "docs_per_sec": (round(stats["max_doc"] / build_sec, 1)
                               if build_sec > 0 else None), **stats}

    if args.query:
        from lucene_solr_1_spark.search.engine import IndexSearcher
        s = IndexSearcher(spark, paths.root)
        top = s.search(args.query.split(), "OR", k=args.k).collect()
        report["query"] = args.query
        report["topk"] = [(int(r["docid"]), float(r["score"])) for r in top]

    print("SUBMIT_RESULT " + json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
