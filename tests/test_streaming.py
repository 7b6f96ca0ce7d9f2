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
    writer = StreamingIndexWriter(paths.root, stream_id=1)
    q = writer.attach(stream, os.path.join(tmp_root, "ckpt"),
                      {"availableNow": True}).start()
    q.awaitTermination(120)
    hits = (nrt_postings(spark, paths.root)
            .filter(F.col("term") == "qqqstreamterm").toPandas())
    assert hits["df"].sum() == 5


def test_nrt_search_and_update_semantics(spark, base, tmp_root):
    """End-to-end NRT view: new docs searchable, re-ingested urls
    (updateDocument) exclude their older copies."""
    _, paths = base
    searcher = IndexSearcher(spark, paths.root, include_nrt=True)
    hits = searcher.search(["zzznrtterm"], "OR", k=10).toPandas()
    assert len(hits) == 3
    got = searcher.fetch_fields(searcher.search(["zzznrtterm"], "OR", 10)).toPandas()
    assert got["url"].str.startswith("https://nrt.example/").all()

    # update: re-ingest url /1 with different text at a later generation
    writer = StreamingIndexWriter(paths.root)
    upd = spark.createDataFrame(pd.DataFrame({
        "url": ["https://nrt.example/1"],
        "text": ["yyyupdated replacement body"],
    }))
    writer.process_batch(upd, 5)
    s2 = IndexSearcher(spark, paths.root, include_nrt=True)
    old = s2.search(["zzznrtterm"], "OR", k=10).toPandas()
    assert len(old) == 2            # the gen-0 copy of /1 is tombstoned
    new = s2.search(["yyyupdated"], "OR", k=10).toPandas()
    assert len(new) == 1


def test_compaction_folds_nrt_into_base(spark, base, tmp_root):
    from lucene_solr_1_spark.streaming.ingest import compact
    _, paths = base
    if not os.path.exists(os.path.join(paths.root, "nrt")):
        pytest.skip("depends on NRT state built by the earlier module tests")
    pre = IndexSearcher(spark, paths.root, include_nrt=True)
    pre_zzz = pre.search(["zzznrtterm"], "OR", k=10).toPandas()
    pre_base_term = pre.term_stats(["zzznrtterm"])
    compact(spark, paths.root, out_partitions=4)
    assert not os.path.exists(os.path.join(paths.root, "nrt"))
    post = IndexSearcher(spark, paths.root)        # plain base searcher
    post_zzz = post.search(["zzznrtterm"], "OR", k=10).toPandas()
    assert post_zzz["docid"].tolist() == pre_zzz["docid"].tolist()
    # tombstoned old copy is physically gone
    assert post.count(["yyyupdated"], "OR") == 1
    docs = spark.read.parquet(paths.docs)
    from pyspark.sql import functions as F
    assert docs.filter(F.col("url") == "https://nrt.example/1").count() == 1
    from lucene_solr_1_spark.index.checkindex import check_index
    assert check_index(spark, paths.root)["ok"]


def test_realtime_get_latest_version(spark, base, tmp_root):
    """realtime_get returns the newest live copy per url: base doc,
    updated doc (newest generation wins), absent url (no row)."""
    import pandas as pd
    from lucene_solr_1_spark.streaming.ingest import (StreamingIndexWriter,
                                                      realtime_get)
    _, paths = base
    root = paths.root
    w = StreamingIndexWriter(root, stream_id=7)
    # update an existing base url twice in two generations
    upd = spark.read.parquet(f"{root}/docs").limit(1).collect()[0]
    url = upd["url"]
    w.process_batch(spark.createDataFrame(
        pd.DataFrame({"url": [url], "text": ["first update text"]})), 0)
    w.process_batch(spark.createDataFrame(
        pd.DataFrame({"url": [url], "text": ["second update text"]})), 1)
    got = realtime_get(spark, root, [url, "no-such-url"]).toPandas()
    assert len(got) == 1
    assert got["url"].iloc[0] == url
    assert got["text"].iloc[0] == "second update text"
    assert got["gen"].iloc[0] == 7 * StreamingIndexWriter.GENS_PER_STREAM + 1
    # an untouched base url returns its base row (gen = -1)
    other = spark.read.parquet(f"{root}/docs").orderBy("docid") \
        .limit(5).collect()[-1]
    if other["url"] != url:
        got2 = realtime_get(spark, root, [other["url"]]).toPandas()
        assert len(got2) == 1 and got2["gen"].iloc[0] == -1
