"""Index replication — the ReplicationHandler / SnapPuller flow (ref:
solr/core/src/java/org/apache/solr/handler/ReplicationHandler.java:88,
SnapPuller.java:216 fetchLatestIndex): a replica pulls a master's
latest commit point by (1) asking for the newest generation
(indexversion), (2) diffing the master's file list against what it
already has (filelist — name+size match skips the fetch), (3) copying
only missing/changed data files, (4) publishing the commit manifest
ATOMICALLY LAST so a reader never pins a partial index, and (5) only
then deleting files no commit references (the old-generation cleanup).

The Parquet index makes this trivially safe: data files are immutable
once written (job-commit semantics), so name+size equality is a valid
freshness check — the same immutable-segment-file property Lucene's
SnapPuller relies on (SnapPuller.java:810 compareFile).

`snapshot` is the backup command (ReplicationHandler.java:414
doSnapShoot): copy the pinned commit's exact file set to a target
directory with its manifest.

Driver-side file copy is deliberate: manifests are small (one JSON) and
data files stream through read/write without Spark jobs — replication
is an I/O plane, not a compute plane. At cluster scale the same
manifest diff drives a distcp-style parallel copy; the logic here IS
the control plane for it.
"""

from __future__ import annotations

import os

from .. import fsio
from .build import IndexPaths

_SUBS = ("docs", "postings", "termstats")


def latest_commit(root: str) -> tuple[int, dict] | None:
    """(generation, manifest) of the newest segments_N.json — the
    'indexversion' command. None when the index has no commit."""
    gens = sorted(int(f.split("_")[1].split(".")[0])
                  for f in fsio.listdir(root)
                  if f.startswith("segments_") and f.endswith(".json"))
    if not gens:
        return None
    g = gens[-1]
    return g, fsio.read_json(os.path.join(root, f"segments_{g}.json"))


def _manifest_files(manifest: dict) -> dict[str, int]:
    """{relative path: size} for every data file the commit pins."""
    out = {}
    for sub, entries in manifest.get("files", {}).items():
        for name, size in entries:
            out[f"{sub}/{name}"] = int(size)
    return out


def replicate(master_root: str, replica_root: str) -> dict:
    """Pull the master's latest commit into replica_root incrementally.
    Returns {"generation", "fetched", "skipped", "deleted", "bytes"}.
    Idempotent: a second call with no master changes fetches nothing."""
    latest = latest_commit(master_root)
    if latest is None:
        raise ValueError(f"{master_root} has no commit point")
    gen, manifest = latest
    want = _manifest_files(manifest)
    have: dict[str, int] = {}
    prev = latest_commit(replica_root) if fsio.isdir(replica_root) else None
    if prev is not None:
        have = _manifest_files(prev[1])
    fetched, skipped, nbytes = [], [], 0
    for rel, size in want.items():
        dst = os.path.join(replica_root, rel)
        if have.get(rel) == size and fsio.exists(dst):
            skipped.append(rel)
            continue
        data = fsio.read_bytes(os.path.join(master_root, rel))
        fsio.makedirs(os.path.dirname(dst))
        fsio.write_bytes_atomic(dst, data)
        fetched.append(rel)
        nbytes += len(data)
    # side metadata the searcher needs (stats.json) travels with the
    # commit; copied before the manifest publish like any data file
    for extra in ("stats.json",):
        src = os.path.join(master_root, extra)
        if fsio.exists(src):
            fsio.write_bytes_atomic(os.path.join(replica_root, extra),
                                    fsio.read_bytes(src))
    # publish the commit point LAST (atomic rename inside write_json)
    fsio.makedirs(replica_root)
    fsio.write_json_atomic(
        os.path.join(replica_root, f"segments_{gen}.json"), manifest)
    # retire every OTHER replica manifest — including HIGHER generations:
    # a master rebuilt from scratch restarts at gen 1, and a stale
    # higher-gen manifest would stay latest_commit's winner while the
    # cleanup below deletes the files it pins (ADVICE r4; the reference
    # SnapPuller handles master-gen regression via its fullCopy path,
    # SnapPuller.java:216)
    for f in fsio.listdir(replica_root):
        if (f.startswith("segments_") and f.endswith(".json")
                and f != f"segments_{gen}.json"):
            fsio.remove(os.path.join(replica_root, f))
    # old-generation cleanup: data files no longer referenced
    deleted = []
    for sub in _SUBS:
        d = os.path.join(replica_root, sub)
        if not fsio.isdir(d):
            continue
        for f in fsio.listdir(d):
            rel = f"{sub}/{f}"
            if f.endswith(".parquet") and rel not in want:
                fsio.remove(os.path.join(d, f))
                deleted.append(rel)
    return {"generation": gen, "fetched": sorted(fetched),
            "skipped": sorted(skipped), "deleted": sorted(deleted),
            "bytes": nbytes}


def snapshot(root: str, dest: str) -> dict:
    """Backup the latest commit's exact file set (doSnapShoot)."""
    latest = latest_commit(root)
    if latest is None:
        raise ValueError(f"{root} has no commit point")
    gen, manifest = latest
    for rel in _manifest_files(manifest):
        dst = os.path.join(dest, rel)
        fsio.makedirs(os.path.dirname(dst))
        fsio.write_bytes_atomic(dst, fsio.read_bytes(os.path.join(root, rel)))
    for extra in ("stats.json",):
        src = os.path.join(root, extra)
        if fsio.exists(src):
            fsio.write_bytes_atomic(os.path.join(dest, extra),
                                    fsio.read_bytes(src))
    fsio.write_json_atomic(os.path.join(dest, f"segments_{gen}.json"),
                           manifest)
    return {"generation": gen, "files": len(_manifest_files(manifest))}


def split_index(spark, src_root: str, dst_roots: tuple[str, str],
                predicate: str, num_segments: int = 8,
                out_partitions: int | None = None) -> tuple:
    """PKIndexSplitter analog (ref: lucene/misc/src/java/org/apache/
    lucene/index/PKIndexSplitter.java:38: partition one index into two
    by a filter — docs passing it land in the first, the rest in the
    second). The reference rewrites segments codec-level; here each
    half re-inverts from the stored docs table via the ordinary
    distributed build — different HOW, same WHAT: two standalone,
    self-consistent indexes whose doc sets partition the source.

    `predicate` is a SQL expression over the source docs table columns
    (e.g. "docid % 2 = 0" or "url like 'https%'")."""
    from pyspark.sql import functions as F

    from .build import build_index
    src = IndexPaths(src_root)
    docs = spark.read.parquet(src.docs)
    field_cols = [c for c in docs.columns if c not in ("docid", "sort_key")]
    out = []
    for root, flt in zip(dst_roots,
                         (F.expr(predicate), ~F.expr(predicate))):
        part = docs.filter(flt).select(*field_cols)
        out.append(build_index(spark, part, root,
                               num_segments=num_segments,
                               out_partitions=out_partitions))
    return tuple(out)


def multipass_split_index(spark, src_root: str, dst_roots: list[str],
                          seq: bool = False, num_segments: int = 8,
                          out_partitions: int | None = None) -> tuple:
    """MultiPassIndexSplitter analog (ref: lucene/misc/src/java/org/
    apache/lucene/index/MultiPassIndexSplitter.java:60-104): split one
    index into N parts by document ORDINAL — ``seq=True`` gives
    contiguous equal ranges (the last part absorbing the integer-
    rounding remainder), ``seq=False`` deals ordinals round-robin
    (ordinal j -> part j % N, the reference's
    ``(j + numParts - i) % numParts != 0`` deletion mask inverted).

    The reference fakes deletions and rewrites via addIndexes; here
    each part re-inverts from the stored docs, like ``split_index``.
    The global ordinal is computed WITHOUT a single-partition window:
    the docs table's files are disjoint docid ranges, so per-file
    counts (one tiny agg) prefix-sum driver-side into file offsets and
    the ordinal is offset + rank-within-file — every window runs
    partitioned per file, scale-safe at any corpus size.
    """
    import os

    from pyspark.sql import Window, functions as F

    from .build import build_index

    n = len(dst_roots)
    if n < 2:
        raise ValueError("Invalid number of outputs.")
    src = IndexPaths(src_root)
    docs = spark.read.parquet(src.docs).withColumn(
        "_file", F.input_file_name())
    stats = docs.groupBy("_file").agg(
        F.count("*").alias("cnt"), F.min("docid").alias("lo")).collect()
    max_doc = sum(r["cnt"] for r in stats)
    if max_doc < 2:
        raise ValueError("Not enough documents for splitting")
    # files hold disjoint docid ranges: ordering them by min docid and
    # prefix-summing counts yields each file's global ordinal offset
    offsets, acc = {}, 0
    for r in sorted(stats, key=lambda r: r["lo"]):
        offsets[r["_file"]] = acc
        acc += r["cnt"]
    off_map = F.create_map(*[x for f, o in offsets.items()
                             for x in (F.lit(f), F.lit(o))])
    w = Window.partitionBy("_file").orderBy("docid")
    orded = docs.withColumn(
        "_ord", off_map[F.col("_file")] + F.row_number().over(w) - 1)
    if seq:
        part_len = max_doc // n
        if part_len == 0:
            # fewer docs than parts: the reference's range loop leaves
            # parts 0..n-2 empty and the LAST part (which skips the
            # above-range deletion) holding every doc
            part_col = F.lit(n - 1)
        else:
            part_col = F.least(F.floor(F.col("_ord") / part_len),
                               F.lit(n - 1)).cast("int")
    else:
        part_col = (F.col("_ord") % n).cast("int")
    orded = orded.withColumn("_part", part_col)
    field_cols = [c for c in docs.columns
                  if c not in ("docid", "sort_key", "_file")]
    out = []
    for i, root in enumerate(dst_roots):
        part = orded.filter(F.col("_part") == i).select(*field_cols)
        out.append(build_index(spark, part, root,
                               num_segments=num_segments,
                               out_partitions=out_partitions))
    return tuple(out)
