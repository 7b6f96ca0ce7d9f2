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


def read_json_docs(spark: SparkSession, path: str) -> DataFrame:
    """Solr /update JSON: one doc object per line (JSONL)."""
    return spark.read.json(path)


def read_csv_docs(spark: SparkSession, path: str) -> DataFrame:
    """Solr /update CSV with a header row."""
    return spark.read.option("header", True).csv(path)
