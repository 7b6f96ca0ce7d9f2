"""Corpus input adapter — the north-rule Iceberg table, sandbox-safe.

The engine's input contract (BASELINE.json ``input_hint``) is an
Iceberg table of Common-Crawl-style web pages::

    (url: string, warc_ts: timestamp, html: binary,
     text: string, lang: string)

``read_corpus`` reads that table through the Iceberg Spark source when
the runtime is on the classpath (``--packages org.apache.iceberg:
iceberg-spark-runtime-...`` on a real cluster), including snapshot-id
time travel — the point-in-time ``IndexReader`` role (SURVEY.md §3's
storage mapping: segments ↔ data files, segments_N ↔ snapshots,
deletes ↔ delete files).  In this sandbox the runtime jar is absent,
so the same call transparently falls back to the parquet directory
layout the test fixtures use; the physical scan is identical (Iceberg
data files ARE parquet — only snapshot/manifest resolution differs).

Column conformance is checked once here so every downstream operator
can rely on the hint schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_corpus(spark: SparkSession, source: str,
                snapshot_id: int | None = None,
                require: tuple[str, ...] = ("url", "text")) -> DataFrame:
    """Read the web-page corpus from an Iceberg table name/path, or —
    when the Iceberg runtime is absent — from a parquet path.

    ``snapshot_id`` requests Iceberg time travel; because the parquet
    fallback has no snapshot axis, an explicit snapshot request ERRORS
    rather than silently reading current data when the runtime is
    absent.  The fallback engages ONLY when the iceberg data source
    itself is unavailable — any other Iceberg failure (unknown table,
    expired snapshot, catalog misconfiguration, permissions) is
    re-raised so it is never masked by a misleading parquet error.
    ``require`` names the columns the caller actually needs; missing
    ones raise immediately with the input-contract schema in the
    message.
    """
    try:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(source)
    except Exception as e:
        msg = str(e)
        runtime_absent = ("DATA_SOURCE_NOT_FOUND" in msg
                          or "Failed to find data source" in msg
                          or "ClassNotFoundException" in msg)
        if not runtime_absent:
            raise
        if snapshot_id is not None:
            raise ValueError(
                f"snapshot-id {snapshot_id} requested but the Iceberg "
                "runtime is not on the classpath — the parquet fallback "
                "cannot time-travel; add --packages org.apache.iceberg:"
                "iceberg-spark-runtime-... or drop the snapshot request"
            ) from e
        # same data files, parquet reader
        df = spark.read.parquet(source)
    missing = [c for c in require if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus at {source!r} is missing required columns {missing}; "
            f"expected the input-contract schema {CORPUS_COLUMNS}")
    return df
