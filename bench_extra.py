"""Extra measurement harness for optimization round 6 (guide §1).

NOT the driver bench — bench.py is frozen.  This file isolates where the
time goes:

  * ``phases``  — index_build split into its stages (docid assignment,
    segment inversion incl. the manifest scan, termstats agg, merge,
    stats) with wall seconds per stage.
  * ``queries`` — every bench-timed contract query twice: once with
    .collect() (the frozen bench's methodology) and once against the
    noop sink (guide §1.4), plus .explain("formatted") dumped to
    plans/r06/<name>_<tag>.txt.
  * ``engine``  — the engine query lines with per-job labels.

Usage: python bench_extra.py [phases|queries|engine|all] [--tag before]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_DOCS (default 500000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")

BENCH_SQL_NAMES = [
    "term_stats", "bool_or_topk", "facet_field", "grouping_top1",
    "minhash_lsh", "ann_cosine_topk", "event_window_agg",
    "numeric_trie_range", "geo_bbox_grid", "winnow_fingerprint",
    "payload_term", "frange_filter", "schema_copyfield_topk",
    "cjk_segmentation", "icu_segmentation", "gopher_quality",
    "c4_span_dedup", "memory_percolate", "signature_dedup",
]


def _spark(cpus: int):
    from lucene_solr_1_spark.session import get_spark
    return get_spark(cores=cpus, shuffle_partitions=cpus, app="bench_extra")


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def run_phases(spark, n_docs: int, cpus: int) -> dict:
    """index_build stage-by-stage (same inputs as bench.py)."""
    from lucene_solr_1_spark.fixtures.webtext import gen_docs_spark
    from lucene_solr_1_spark.index import build as B

    corpus = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen_docs_spark(spark, n_docs, parallelism=cpus * 2) \
            .write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    docs.count()
    root = os.path.join(tempfile.mkdtemp(prefix="bx_idx_"), "idx")
    out = B.IndexPaths(root)
    B.fsio.makedirs(root)
    sc = spark.sparkContext
    res = {}

    sc.setJobDescription("phase: assign_docids")
    t0 = time.time()
    B.assign_docids(spark, docs, out, num_segments=cpus * 2)
    res["assign_docids"] = round(time.time() - t0, 3)

    sc.setJobDescription("phase: build_segments")
    t0 = time.time()
    B.build_segments(spark, out, cpus * 2)
    res["build_segments"] = round(time.time() - t0, 3)

    sc.setJobDescription("phase: merge_segments")
    t0 = time.time()
    B.merge_segments(spark, out, cpus * 2, cpus)
    res["merge_segments"] = round(time.time() - t0, 3)

    sc.setJobDescription("phase: write_stats")
    t0 = time.time()
    B.write_stats(spark, out)
    res["write_stats"] = round(time.time() - t0, 3)
    sc.setJobDescription(None)
    res["total"] = round(sum(res.values()), 3)
    res["root"] = root
    return res


def run_queries(spark, sf_dir: str, tag: str, names=None,
                plans: bool = True) -> dict:
    from lucene_solr_1_spark.contract import make_queries
    contract = make_queries()
    os.makedirs(PLANS_DIR, exist_ok=True)
    sc = spark.sparkContext
    res = {}
    for name in (names or BENCH_SQL_NAMES):
        sc.setJobDescription(f"sql_{name}")
        df = contract[name](spark, sf_dir)
        if plans:
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import io
                from contextlib import redirect_stdout
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        t0 = time.time()
        contract[name](spark, sf_dir).collect()
        collect_s = round(time.time() - t0, 3)
        noop_s = noop(contract[name](spark, sf_dir))
        res[name] = {"collect": collect_s, "noop": noop_s}
        print(f"  {name}: collect={collect_s} noop={noop_s}", file=sys.stderr)
    sc.setJobDescription(None)
    return res


def run_engine(spark, root: str) -> dict:
    from lucene_solr_1_spark.fixtures.webtext import VOCAB
    from lucene_solr_1_spark.search.engine import IndexSearcher
    searcher = IndexSearcher(spark, root)
    engine_qs = {
        "engine_term_head": ([str(VOCAB[0])], "OR"),
        "engine_term_mid": ([str(VOCAB[500])], "OR"),
        "engine_or3": ([str(VOCAB[1]), str(VOCAB[200]), str(VOCAB[3000])], "OR"),
        "engine_and2": ([str(VOCAB[50]), str(VOCAB[120])], "AND"),
        "engine_msm2": ([str(VOCAB[10]), str(VOCAB[300]), str(VOCAB[900])], "MSM2"),
    }
    sc = spark.sparkContext
    res = {}
    for name, (terms, op) in engine_qs.items():
        sc.setJobDescription(name)
        t0 = time.time()
        searcher.search(terms, op, k=10).collect()
        res[name] = round(time.time() - t0, 3)
    sc.setJobDescription("engine_wand_or3")
    t0 = time.time()
    searcher.search_wand([str(VOCAB[1]), str(VOCAB[200]), str(VOCAB[3000])],
                         k=10).collect()
    res["engine_wand_or3"] = round(time.time() - t0, 3)
    sc.setJobDescription(None)
    return res


def run_tiered(spark, cpus: int, n_base: int = 50000, n_gens: int = 10,
               gen_docs_each: int = 100) -> dict:
    """Tiered-fold cost on REALISTIC (full-vocabulary) NRT generations
    (VERDICT-r5 next #5; bench.py is frozen, so the line lives here):
    build a base index, stream n_gens webtext generations, then measure
      * cascade: consolidate-only maintenance (r6 gen-to-gen fold) —
        base files rewritten must be ZERO;
      * promote: the pre-r6 behavior (unconditional tiered_compact) on
        an identical copy — rewrites the term-touched base files, which
        for a full vocabulary is essentially all of them.
    Both legs run in the same window; the ratio is the evidence."""
    import shutil as _sh

    from lucene_solr_1_spark.analysis.htmlstrip import extract_text_series
    from lucene_solr_1_spark.fixtures.webtext import gen_docs, gen_docs_spark
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.streaming.ingest import (StreamingIndexWriter,
                                                      tiered_compact,
                                                      tiered_maintenance)

    root_a = os.path.join(tempfile.mkdtemp(prefix="bx_tier_"), "idx")
    base = gen_docs_spark(spark, n_base, parallelism=cpus)
    build_index(spark, base, root_a, num_segments=cpus, out_partitions=cpus)
    writer = StreamingIndexWriter(root_a)
    for bid in range(n_gens):
        pdf = gen_docs(gen_docs_each,
                       start=n_base + 1000 + gen_docs_each * bid)
        import pandas as _pd
        batch = _pd.DataFrame({
            "url": pdf["url"],
            "text": extract_text_series(
                pdf["html"].map(lambda b: b.decode("utf-8", "replace")))})
        writer.process_batch(spark.createDataFrame(batch), bid)
    root_b = root_a + "_promote"
    _sh.copytree(os.path.dirname(root_a) + "/idx", root_b)

    n_base_files = len([f for f in os.listdir(
        os.path.join(root_a, "postings")) if f.endswith(".parquet")])
    t0 = time.time()
    res_a = tiered_maintenance(spark, root_a, segs_per_tier=n_gens,
                               max_merge_at_once=n_gens, promote_ratio=0.1)
    cascade_s = round(time.time() - t0, 3)
    t0 = time.time()
    res_b = tiered_compact(spark, root_b)     # pre-r6 unconditional fold
    promote_s = round(time.time() - t0, 3)
    out = {
        "n_base_docs": n_base, "n_gens": n_gens,
        "gen_docs_each": gen_docs_each, "base_postings_files": n_base_files,
        "cascade_sec": cascade_s,
        "cascade_base_files_rewritten": len(res_a.get("rewritten_files",
                                                      [])),
        "cascade_consolidated": res_a.get("consolidated", []),
        "promote_sec": promote_s,
        "promote_base_files_rewritten": len(res_b.get("rewritten_files",
                                                      [])),
        "speedup": round(promote_s / cascade_s, 2) if cascade_s else None,
    }
    _sh.rmtree(os.path.dirname(root_a), ignore_errors=True)
    _sh.rmtree(root_b, ignore_errors=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    names = None
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "500000"))
    spark = _spark(cpus)
    out = {"tag": tag, "sf": sf_dir, "cpus": cpus}
    if mode in ("phases", "all"):
        out["phases"] = run_phases(spark, n_docs, cpus)
    if mode in ("engine", "all"):
        root = out.get("phases", {}).get("root")
        if not root:
            ph = run_phases(spark, n_docs, cpus)
            root = ph["root"]
            out["phases"] = ph
        out["engine"] = run_engine(spark, root)
    if mode in ("queries", "all"):
        out["queries"] = run_queries(spark, sf_dir, tag, names=names)
    if mode == "tiered":
        out["tiered"] = run_tiered(spark, cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
