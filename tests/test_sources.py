"""Corpus readers (sources/readers.py): LineDoc/TREC/enwiki/JSON/CSV."""

import os

from lucene_solr_1_spark.sources.readers import (read_csv_docs,
                                                 read_enwiki,
                                                 read_json_docs,
                                                 read_line_docs, read_trec)


def test_line_docs(spark, tmp_root):
    p = os.path.join(tmp_root, "line.txt")
    with open(p, "w") as f:
        f.write("Doc One\t2024-01-01\tbody text one\n")
        f.write("malformed line without tabs\n")
        f.write("Doc Two\t2024-01-02\tbody\ttext with tab\n")
    got = read_line_docs(spark, p).orderBy("title").collect()
    assert [(r["title"], r["date"], r["text"]) for r in got] == [
        ("Doc One", "2024-01-01", "body text one"),
        ("Doc Two", "2024-01-02", "body\ttext with tab")]


def test_trec(spark, tmp_root):
    p = os.path.join(tmp_root, "trec.txt")
    with open(p, "w") as f:
        f.write("<DOC>\n<DOCNO> TREC-001 </DOCNO>\n<DOCHDR>\nhttp://x\n"
                "</DOCHDR>\nsome body text\n</DOC>\n"
                "<DOC>\n<DOCNO>TREC-002</DOCNO>\nsecond body\n</DOC>\n")
    got = {r["url"]: r["text"] for r in read_trec(spark, p).collect()}
    assert got == {"TREC-001": "some body text", "TREC-002": "second body"}


def test_enwiki(spark, tmp_root):
    p = os.path.join(tmp_root, "wiki.xml")
    with open(p, "w") as f:
        f.write("<mediawiki><page><title>Alpha</title>"
                "<revision><timestamp>2024-01-01T00:00:00Z</timestamp>"
                "<text xml:space=\"preserve\">alpha body</text></revision>"
                "</page><page><title>Beta</title><revision>"
                "<timestamp>2024-01-02T00:00:00Z</timestamp>"
                "<text>beta body</text></revision></page></mediawiki>")
    got = {r["title"]: (r["date"], r["text"])
           for r in read_enwiki(spark, p).collect()}
    assert got == {"Alpha": ("2024-01-01T00:00:00Z", "alpha body"),
                   "Beta": ("2024-01-02T00:00:00Z", "beta body")}


def test_json_csv(spark, tmp_root):
    pj = os.path.join(tmp_root, "docs.jsonl")
    with open(pj, "w") as f:
        f.write('{"url": "a", "text": "hello"}\n{"url": "b", "text": "hi"}\n')
    assert read_json_docs(spark, pj).count() == 2
    pc = os.path.join(tmp_root, "docs.csv")
    with open(pc, "w") as f:
        f.write("url,text\na,hello\nb,hi\n")
    got = read_csv_docs(spark, pc).orderBy("url").collect()
    assert [r["url"] for r in got] == ["a", "b"]


def test_solr_xml_update(spark, tmp_root):
    from lucene_solr_1_spark.sources.readers import (project_solr_docs,
                                                     read_solr_xml)
    p = os.path.join(tmp_root, "update.xml")
    with open(p, "w") as f:
        f.write('<update><add>'
                '<doc><field name="id">d1</field>'
                '<field name="title">Alpha</field>'
                '<field name="cat">x</field><field name="cat">y</field>'
                '<field name="text">alpha body</field></doc>'
                '<doc><field name="id">d2</field>'
                '<field name="title">Beta</field>'
                '<field name="text">beta body</field></doc>'
                '</add><delete><id>d0</id><query>cat:z</query></delete>'
                '</update>')
    df = read_solr_xml(spark, p)
    rows = {(r["op"], r["id"]) for r in df.collect()}
    assert rows == {("add", "d1"), ("add", "d2"), ("delete", "d0"),
                    ("delete_query", "")}
    adds = df.filter(df.op == "add").orderBy("id").collect()
    assert list(adds[0]["fields"]["cat"]) == ["x", "y"]   # multiValued
    proj = {r["id"]: (r["title"], r["text"])
            for r in project_solr_docs(df).collect()}
    assert proj == {"d1": ("Alpha", "alpha body"),
                    "d2": ("Beta", "beta body")}
    # bare <add> root (no <update> wrapper) parses too
    p2 = os.path.join(tmp_root, "add_only.xml")
    with open(p2, "w") as f:
        f.write('<add><doc><field name="id">d3</field>'
                '<field name="text">t</field></doc></add>')
    assert read_solr_xml(spark, p2).collect()[0]["op"] == "add"


def test_read_corpus_parquet_fallback_and_schema_check(spark):
    from lucene_solr_1_spark.sources.corpus import read_corpus
    df = read_corpus(spark, "/root/testdata/sf0.001/documents.parquet",
                     require=("text",))
    assert "text" in df.columns and df.count() > 0
    import pytest
    # an explicit time-travel request must NOT silently read current
    # data when the runtime is absent
    with pytest.raises(ValueError, match="cannot time-travel"):
        read_corpus(spark, "/root/testdata/sf0.001/documents.parquet",
                    snapshot_id=123, require=("text",))
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(spark, "/root/testdata/sf0.001/documents.parquet",
                    require=("url", "warc_ts"))
