"""Corpus readers — the §2.A sources surface.

Analogs of the reference's benchmark content sources and Solr's /update
loaders, re-expressed as DataFrame readers:

  read_line_docs — LineDocSource (lucene/benchmark/.../feeds/
                   LineDocSource.java:38-39: one doc per line,
                   ``title<TAB>date<TAB>body``)
  read_trec      — TrecContentSource (feeds/TrecContentSource.java:62-64:
                   concatenated <DOC>…<DOCNO>…</DOCNO>…</DOC> blocks)
  read_enwiki    — EnwikiContentSource (feeds/EnwikiContentSource.java:51:
                   wikipedia XML dump <page><title>…<text>…)
  read_json_docs/read_csv_docs — Solr /update JSON/CSV loaders
                   (solr/core/.../update/DirectUpdateHandler2.java ingest
                   path; loaders in solr/.../handler/loader/)

Line docs split JVM-side (one text scan, whole-stage codegen). TREC and
enwiki are block formats: files are read whole and split with a
vectorized pandas stage — at scale, parallelism = number of files, the
same unit the reference streams per-thread.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("text", T.StringType()),
])


def read_line_docs(spark: SparkSession, path: str) -> DataFrame:
    """title<TAB>date<TAB>body, one doc per line; url = title (the
    reference keys benchmark docs by title)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 3)
    return (lines.filter(F.size(parts) >= 3)
            .select(parts.getItem(0).alias("url"),
                    parts.getItem(0).alias("title"),
                    parts.getItem(1).alias("date"),
                    parts.getItem(2).alias("text")))


_TREC_DOC = re.compile(r"<DOC>(.*?)</DOC>", re.S)
_TREC_NO = re.compile(r"<DOCNO>(.*?)</DOCNO>", re.S)
_TREC_HDR = re.compile(r"<DOCHDR>.*?</DOCHDR>", re.S)


def _trec_split(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in pdfs:
        rows = []
        for blob in pdf["value"]:
            for m in _TREC_DOC.finditer(blob):
                body = m.group(1)
                no = _TREC_NO.search(body)
                docno = no.group(1).strip() if no else ""
                text = _TREC_NO.sub("", body)
                text = _TREC_HDR.sub("", text).strip()
                rows.append((docno, docno, "", text))
        yield pd.DataFrame(rows, columns=["url", "title", "date", "text"])


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    whole = spark.read.text(path, wholetext=True)
    return whole.mapInPandas(_trec_split, schema=DOC_SCHEMA)


_WIKI_PAGE = re.compile(r"<page>(.*?)</page>", re.S)
_WIKI_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_WIKI_TS = re.compile(r"<timestamp>(.*?)</timestamp>", re.S)
_WIKI_TEXT = re.compile(r"<text[^>]*>(.*?)</text>", re.S)


def _wiki_split(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in pdfs:
        rows = []
        for blob in pdf["value"]:
            for m in _WIKI_PAGE.finditer(blob):
                page = m.group(1)
                t = _WIKI_TITLE.search(page)
                ts = _WIKI_TS.search(page)
                tx = _WIKI_TEXT.search(page)
                rows.append((t.group(1) if t else "",
                             t.group(1) if t else "",
                             ts.group(1) if ts else "",
                             tx.group(1) if tx else ""))
        yield pd.DataFrame(rows, columns=["url", "title", "date", "text"])


def read_enwiki(spark: SparkSession, path: str) -> DataFrame:
    whole = spark.read.text(path, wholetext=True)
    return whole.mapInPandas(_wiki_split, schema=DOC_SCHEMA)


_XML_SCHEMA = ("op string, id string, "
               "fields map<string, array<string>>")


def _solr_xml_split(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import xml.etree.ElementTree as ET
    for pdf in pdfs:
        rows = []
        for blob in pdf["value"]:
            root = ET.fromstring(blob)
            elems = [root] if root.tag in ("add", "delete") else list(root)
            for el in elems:
                if el.tag == "add":
                    for doc in el.findall("doc"):
                        fields: dict[str, list[str]] = {}
                        for f in doc.findall("field"):
                            fields.setdefault(f.get("name", ""), []).append(
                                f.text or "")
                        rows.append(("add", fields.get("id", [""])[0], fields))
                elif el.tag == "delete":
                    for d in el:
                        if d.tag == "id":
                            rows.append(("delete", d.text or "",
                                         {"id": [d.text or ""]}))
                        elif d.tag == "query":
                            rows.append(("delete_query", "",
                                         {"query": [d.text or ""]}))
        yield pd.DataFrame(rows, columns=["op", "id", "fields"])


def read_solr_xml(spark: SparkSession, path: str) -> DataFrame:
    """Solr /update XML loader (ref: solr/core/.../handler/loader/
    XMLLoader.java:63-120: <add><doc><field name=..>..</field> docs,
    <delete><id>/<query>): one row per add-doc or delete command —
    ``(op, id, fields: map<string, array<string>>)``; repeated field
    names collect into the array (multiValued). Files parse whole, in
    parallel across files, like the other block-format sources."""
    whole = spark.read.text(path, wholetext=True)
    return whole.mapInPandas(_solr_xml_split, schema=_XML_SCHEMA)


def project_solr_docs(df: DataFrame,
                      fields: tuple[str, ...] = ("id", "title", "text")
                      ) -> DataFrame:
    """Flatten read_solr_xml add-docs into typed single-valued columns
    (first value per field, the non-multiValued convention)."""
    cols = [F.element_at(F.col("fields"), f).getItem(0).alias(f)
            for f in fields]
    return df.filter(F.col("op") == "add").select(*cols)


def read_json_docs(spark: SparkSession, path: str) -> DataFrame:
    """Solr /update JSON: one doc object per line (JSONL)."""
    return spark.read.json(path)


def read_csv_docs(spark: SparkSession, path: str) -> DataFrame:
    """Solr /update CSV with a header row."""
    return spark.read.option("header", True).csv(path)
