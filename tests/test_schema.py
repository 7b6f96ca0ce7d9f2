"""IndexSchema analog: dynamic-field globs, copyField with maxChars,
keyword (string) fields, and a schema-driven multi-field index build.

ref: solr/core/src/java/org/apache/solr/schema/IndexSchema.java:77,
     CopyField.java:25.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_1_spark.solr.schema import (
    CopyField, IndexSchema, SchemaField, _glob_match)


@pytest.fixture(scope="module")
def schema():
    return IndexSchema(
        fields=[SchemaField("title"), SchemaField("body"),
                SchemaField("catchall"),
                SchemaField("sku", type="string")],
        dynamic=[("*_txt", SchemaField("_", type="text")),
                 ("*_s", SchemaField("_", type="string")),
                 ("attr_*", SchemaField("_", type="text"))],
        copy_fields=[CopyField("title", "catchall"),
                     CopyField("body", "catchall", max_chars=20),
                     CopyField("*_txt", "catchall")])


def test_glob_match():
    assert _glob_match("*_txt", "note_txt")
    assert _glob_match("attr_*", "attr_color")
    assert not _glob_match("*_txt", "txt_note")
    assert _glob_match("title", "title")


def test_resolution_order(schema):
    # exact beats dynamic; longest glob wins; unknown -> None
    assert schema.resolve("title").type == "text"
    assert schema.resolve("color_s").type == "string"
    assert schema.resolve("note_txt").type == "text"
    assert schema.resolve("nope") is None


def test_apply_copyfield_and_keyword(spark, schema):
    df = spark.createDataFrame(
        [("u1", "Big Table", "hash join beats loop join every time",
          "extra words here", "ABC 123")],
        "url string, title string, body string, note_txt string, sku string")
    out, names = schema.apply(df)
    assert set(names) == {"title", "body", "note_txt", "sku", "catchall"}
    row = out.collect()[0]
    assert row["url"] == "u1"                       # id column carried
    # copyField: title + first 20 chars of body + note_txt, space-joined
    assert row["catchall"] == "Big Table hash join beats loop extra words here"
    # keyword field: lowercased single token
    assert row["sku"] == "abc_123"


def test_copy_sources_order(schema):
    names = ["url", "title", "body", "note_txt"]
    assert schema.copy_sources("catchall", names) == \
        ["title", "body", "note_txt"]


def test_unknown_copy_dest_raises(spark):
    s = IndexSchema(fields=[SchemaField("a")],
                    copy_fields=[CopyField("a", "nope")])
    with pytest.raises(ValueError, match="copyField dest"):
        s.apply(spark.createDataFrame([("x",)], "a string"))


def test_schema_driven_build_and_search(spark, tmp_path):
    """End-to-end: schema projection -> build_index(fields=...) ->
    per-field search hits the copyField destination."""
    from lucene_solr_1_spark.index.build import build_index
    from lucene_solr_1_spark.search.engine import IndexSearcher

    schema = IndexSchema(
        fields=[SchemaField("title"), SchemaField("body"),
                SchemaField("catchall")],
        copy_fields=[CopyField("title", "catchall"),
                     CopyField("body", "catchall")])
    rows = [(f"u{i}",
             "zebra headline" if i % 3 == 0 else "plain headline",
             f"body words number{i} " + ("quagga " * (i % 5)))
            for i in range(30)]
    df = spark.createDataFrame(rows, "url string, title string, body string")
    out, names = schema.apply(df)
    paths = build_index(spark, out, str(tmp_path / "idx"),
                        num_segments=4, out_partitions=4, fields=names)
    s = IndexSearcher(spark, paths.root)
    # term only in titles is findable via the catchall copy
    hits = s.search([s.term_key("catchall", "zebra")], k=30).collect()
    assert len(hits) == 10          # i % 3 == 0
    # and via its own field
    hits_t = s.search([s.term_key("title", "zebra")], k=30).collect()
    assert {h["docid"] for h in hits} == {h["docid"] for h in hits_t}
    # term only in bodies reaches catchall too
    assert len(s.search([s.term_key("catchall", "quagga")],
                        k=30).collect()) > 0
