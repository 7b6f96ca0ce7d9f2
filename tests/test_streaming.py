"""NRT streaming ingest: micro-batches become visible segments; deletes
via tombstones (updateDocument semantics); checkpointed restart."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.fixtures.webtext import gen_docs
from lucene_solr_1_spark.index.build import build_index
from lucene_solr_1_spark.search.engine import IndexSearcher
from lucene_solr_1_spark.streaming.ingest import StreamingIndexWriter, nrt_postings


@pytest.fixture(scope="module")
def base(spark, tmp_root):
    docs_pdf = gen_docs(400)
    root = os.path.join(tmp_root, "idx_nrt")
    paths = build_index(spark, spark.createDataFrame(docs_pdf), root, num_segments=3)
    return docs_pdf, paths


def test_foreachbatch_ingest_appends_segments(spark, base, tmp_root):
    docs_pdf, paths = base
    writer = StreamingIndexWriter(paths.root)
    before = nrt_postings(spark, paths.root).count()

    # simulate two micro-batches (foreachBatch contract)
    b1 = spark.createDataFrame(pd.DataFrame({
        "url": ["https://nrt.example/1", "https://nrt.example/2"],
        "text": ["zzznrtterm fresh content arrives", "zzznrtterm more arrives"],
    }))
    writer.process_batch(b1, 0)
    b2 = spark.createDataFrame(pd.DataFrame({
        "url": ["https://nrt.example/3"],
        "text": ["zzznrtterm third arrival"],
    }))
    writer.process_batch(b2, 1)

    after = nrt_postings(spark, paths.root)
    assert after.count() > before
    hits = after.filter(F.col("term") == "zzznrtterm").toPandas()
    assert hits["df"].sum() == 3          # visible without any merge
    assert os.path.exists(os.path.join(writer.nrt_dir, "gen_0.json"))
    assert os.path.exists(os.path.join(writer.nrt_dir, "gen_1.json"))
    # docids from distinct generations never collide with base buckets
    assert (hits["first_docid"] >= (writer.base_buckets << 44)).all()


def test_tombstones_record_updates(spark, base):
    _, paths = base
    writer = StreamingIndexWriter(paths.root)
    ts = spark.read.parquet(writer.tombstones_dir)
    assert ts.count() >= 3
    assert set(ts.columns) == {"url", "gen"}


def test_streaming_source_end_to_end(spark, base, tmp_root):
    """Real writeStream path: file source + availableNow trigger."""
    _, paths = base
    src_dir = os.path.join(tmp_root, "stream_src")
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame({"url": [f"https://s.example/{i}" for i in range(5)],
                        "text": ["qqqstreamterm doc body here"] * 5})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema("url string, text string").parquet(src_dir))
    writer = StreamingIndexWriter(paths.root)
    q = writer.attach(stream, os.path.join(tmp_root, "ckpt"),
                      {"availableNow": True}).start()
    q.awaitTermination(120)
    hits = (nrt_postings(spark, paths.root)
            .filter(F.col("term") == "qqqstreamterm").toPandas())
    assert hits["df"].sum() == 5
