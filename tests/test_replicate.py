"""ReplicationHandler / SnapPuller analog: full pull, incremental
no-op, post-commit delta pull, searcher equivalence on the replica,
and snapshot backup."""

import os

import pytest

from lucene_solr_1_spark.fixtures.webtext import VOCAB, gen_docs
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.index.replicate import (
    latest_commit, replicate, snapshot)
from lucene_solr_1_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def master(spark, tmp_root):
    docs = spark.createDataFrame(gen_docs(600))
    root = os.path.join(tmp_root, "repl_master")
    build_index(spark, docs, root, num_segments=4, out_partitions=4)
    return root


def test_full_pull_then_noop(spark, master, tmp_root):
    replica = os.path.join(tmp_root, "repl_replica")
    r1 = replicate(master, replica)
    assert r1["fetched"] and not r1["skipped"] and r1["bytes"] > 0
    gen, man = latest_commit(replica)
    assert gen == r1["generation"]
    # idempotent second pull: everything skips
    r2 = replicate(master, replica)
    assert not r2["fetched"] and r2["skipped"] and r2["bytes"] == 0
    assert set(r2["skipped"]) == {f"{s}/{n}" for s, es in man["files"].items()
                                  for n, _ in es}


def test_replica_search_equals_master(spark, master, tmp_root):
    replica = os.path.join(tmp_root, "repl_replica2")
    replicate(master, replica)
    q = [VOCAB[0], VOCAB[4]]
    a = IndexSearcher(spark, master).search(q, op="OR", k=10).collect()
    b = IndexSearcher(spark, replica).search(q, op="OR", k=10).collect()
    assert [(r["docid"], r["score"]) for r in a] == \
           [(r["docid"], r["score"]) for r in b]


def test_delta_pull_after_master_change(spark, master, tmp_root):
    """Master's file set changes (the SnapPuller full-sync case: same
    generation number, different files): replica fetches the new files,
    deletes the unreferenced old ones, and still searches cleanly.
    (Re-running build_index on the SAME root is a resumable no-op by
    design, so the change is modeled with a second master corpus.)"""
    replica = os.path.join(tmp_root, "repl_replica3")
    replicate(master, replica)
    master2 = os.path.join(tmp_root, "repl_master2")
    build_index(spark, spark.createDataFrame(gen_docs(700)), master2,
                num_segments=4, out_partitions=4)
    r = replicate(master2, replica)
    assert r["fetched"], "changed file set must fetch"
    assert r["deleted"], "old generation files must be cleaned up"
    gen, man = latest_commit(replica)
    assert gen == r["generation"]
    assert man == latest_commit(master2)[1]
    hits = IndexSearcher(spark, replica).search([VOCAB[0]], k=5).collect()
    assert hits


def test_master_generation_regression(spark, master, tmp_root):
    """A master rebuilt from scratch restarts at generation 1 while the
    replica sits at a higher generation: after the pull the replica's
    latest commit must be the master's gen-1 manifest (stale higher-gen
    manifests retired), and the replica still searches — the SnapPuller
    fullCopy case (ADVICE r4)."""
    from lucene_solr_1_spark import fsio
    from lucene_solr_1_spark.index.build import (IndexPaths,
                                                 write_commit_point)
    replica = os.path.join(tmp_root, "repl_replica_regress")
    # advance the master to gen 2 (same files, a second commit point)
    paths = IndexPaths(master)
    stats = fsio.read_json(paths.stats)
    write_commit_point(paths, stats)
    r = replicate(master, replica)
    assert r["generation"] == 2
    # a from-scratch master: fresh corpus, generation restarts at 1
    master3 = os.path.join(tmp_root, "repl_master3")
    build_index(spark, spark.createDataFrame(gen_docs(500)), master3,
                num_segments=4, out_partitions=4)
    assert latest_commit(master3)[0] == 1
    r2 = replicate(master3, replica)
    assert r2["generation"] == 1
    gen, man = latest_commit(replica)
    assert gen == 1, "stale higher-gen manifest must not win"
    assert not os.path.exists(os.path.join(replica, "segments_2.json"))
    assert man == latest_commit(master3)[1]
    # every pinned file exists; the searcher works on the new view
    for rel in [f"{s}/{n}" for s, es in man["files"].items() for n, _ in es]:
        assert os.path.exists(os.path.join(replica, rel))
    assert IndexSearcher(spark, replica).search([VOCAB[0]], k=3).collect()


def test_snapshot(spark, master, tmp_root):
    dest = os.path.join(tmp_root, "repl_snap")
    rep = snapshot(master, dest)
    assert rep["files"] > 0
    assert IndexSearcher(spark, dest).search([VOCAB[0]], k=3).collect()


def test_split_index(spark, master, tmp_root):
    from lucene_solr_1_spark.index.replicate import split_index
    a = os.path.join(tmp_root, "split_a")
    b = os.path.join(tmp_root, "split_b")
    pa, pb = split_index(spark, master, (a, b), "docid % 2 = 0",
                         num_segments=2, out_partitions=2)
    sa, sb = IndexSearcher(spark, a), IndexSearcher(spark, b)
    src_docs = spark.read.parquet(os.path.join(master, "docs")).count()
    assert sa.max_doc + sb.max_doc == src_docs
    assert sa.max_doc > 0 and sb.max_doc > 0
    # the halves partition the URL set exactly
    ua = {r["url"] for r in spark.read.parquet(pa.docs).select("url").collect()}
    ub = {r["url"] for r in spark.read.parquet(pb.docs).select("url").collect()}
    assert not (ua & ub) and len(ua | ub) == src_docs
    # both halves search
    assert sa.search([VOCAB[0]], k=3).collect()
    assert sb.search([VOCAB[0]], k=3).collect()


def test_multipass_split_round_robin(spark, master, tmp_root):
    from lucene_solr_1_spark.index.replicate import multipass_split_index
    roots = [os.path.join(tmp_root, f"mp_{i}") for i in range(3)]
    parts = multipass_split_index(spark, master, roots, seq=False,
                                  num_segments=2, out_partitions=2)
    src = spark.read.parquet(os.path.join(master, "docs"))
    n = src.count()
    sizes = [spark.read.parquet(p.docs).count() for p in parts]
    # round-robin deal: sizes differ by at most 1 and sum to the source
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    # parts partition the URL set exactly
    urls = [set(r["url"] for r in
                spark.read.parquet(p.docs).select("url").collect())
            for p in parts]
    assert not (urls[0] & urls[1]) and not (urls[0] & urls[2]) \
        and not (urls[1] & urls[2])
    assert len(urls[0] | urls[1] | urls[2]) == n
    # every part is a standalone searchable index
    for root in roots:
        assert IndexSearcher(spark, root).search([VOCAB[0]], k=3).collect()


def test_multipass_split_seq_ranges(spark, master, tmp_root):
    from lucene_solr_1_spark.index.replicate import multipass_split_index
    roots = [os.path.join(tmp_root, f"sq_{i}") for i in range(3)]
    parts = multipass_split_index(spark, master, roots, seq=True,
                                  num_segments=2, out_partitions=2)
    src = spark.read.parquet(os.path.join(master, "docs"))
    n = src.count()
    part_len = n // 3
    sizes = [spark.read.parquet(p.docs).count() for p in parts]
    # equal ranges, last part absorbs the remainder
    assert sizes[0] == sizes[1] == part_len
    assert sizes[2] == n - 2 * part_len
    # seq mode preserves docid-ordinal contiguity: every url in part 0
    # precedes (by source docid) every url in part 2
    ords = {r["url"]: r["docid"]
            for r in src.select("url", "docid").collect()}
    max0 = max(ords[r["url"]] for r in
               spark.read.parquet(parts[0].docs).select("url").collect())
    min2 = min(ords[r["url"]] for r in
               spark.read.parquet(parts[2].docs).select("url").collect())
    assert max0 < min2


def test_multipass_split_validations(spark, master, tmp_root):
    from lucene_solr_1_spark.index.replicate import multipass_split_index
    with pytest.raises(ValueError, match="Invalid number"):
        multipass_split_index(spark, master,
                              [os.path.join(tmp_root, "one")])


def test_multipass_seq_fewer_docs_than_parts(spark, tmp_root):
    # reference behavior at partLen==0: parts 0..n-2 empty, the last
    # part (no above-range deletion) holds every doc
    from lucene_solr_1_spark.index.replicate import multipass_split_index
    docs = spark.createDataFrame(gen_docs(3))
    m = os.path.join(tmp_root, "tiny_master")
    build_index(spark, docs, m, num_segments=1, out_partitions=1)
    roots = [os.path.join(tmp_root, f"tiny_{i}") for i in range(4)]
    parts = multipass_split_index(spark, m, roots, seq=True,
                                  num_segments=1, out_partitions=1)
    sizes = [spark.read.parquet(p.docs).count() for p in parts]
    assert sizes == [0, 0, 0, 3]
