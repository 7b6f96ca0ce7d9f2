"""ExtractingRequestHandler twin (solr/extraction.py)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_1_spark.solr.extraction import (
    SolrContentHandler, detect_content_type, extract_content, extract_df)


def _bmp(w=4, h=3):
    from lucene_solr_1_spark.datapipe.mediacodec import encode_bmp
    return encode_bmp(np.zeros((h, w, 3), dtype=np.uint8))


def _wav(rate=8000, n=32):
    from lucene_solr_1_spark.datapipe.mediacodec import encode_wav
    return encode_wav(np.zeros(n, dtype=np.int16), rate)


def test_detect_content_type():
    from lucene_solr_1_spark.datapipe.mediacodec import encode_png
    from lucene_solr_1_spark.datapipe.jpegcodec import encode_jpeg
    from lucene_solr_1_spark.datapipe.flaccodec import encode_flac
    assert detect_content_type(_bmp()) == "image/bmp"
    assert detect_content_type(_wav()) == "audio/x-wav"
    assert detect_content_type(
        encode_png(np.zeros((2, 2), dtype=np.uint8))) == "image/png"
    assert detect_content_type(
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8))) == "image/jpeg"
    assert detect_content_type(
        encode_flac(np.zeros(64, dtype=np.int16))) == "audio/flac"
    assert detect_content_type(b"<html><body>x</body></html>") == "text/html"
    assert detect_content_type(b"plain words") == "text/plain"
    assert detect_content_type(b"\x00\x01\xfe\xff") == \
        "application/octet-stream"


def test_extract_dimensions_and_audio_facts():
    ct, _, md = extract_content(_bmp(7, 5))
    assert (ct, md["width"], md["height"]) == ("image/bmp", "7", "5")
    ct, _, md = extract_content(_wav(11025, 64))
    assert (ct, md["samplerate"], md["channels"]) == \
        ("audio/x-wav", "11025", "1")
    from lucene_solr_1_spark.datapipe.jpegcodec import encode_jpeg
    ct, _, md = extract_content(encode_jpeg(np.zeros((16, 24), np.uint8)))
    assert (md["width"], md["height"]) == ("24", "16")
    from lucene_solr_1_spark.datapipe.flaccodec import encode_flac
    ct, _, md = extract_content(encode_flac(np.zeros(128, np.int16),
                                            rate=22050))
    assert md["samplerate"] == "22050"
    from lucene_solr_1_spark.datapipe.avicodec import encode_avi_dib
    frames = [np.zeros((4, 4, 3), np.uint8)] * 3
    ct, _, md = extract_content(encode_avi_dib(frames, fps=10))
    assert ct == "video/x-msvideo" and md["frames"] == "3"
    assert md["fps"] == "10.0"


def test_extract_html_title_and_text():
    html = b"<html><head><title>My  Page</title></head>" \
           b"<body>hello <b>bold</b> world</body></html>"
    ct, text, md = extract_content(html)
    assert ct == "text/html"
    assert md["title"] == "My Page"
    assert "hello" in text and "bold" in text and "<b>" not in text
    assert md["stream_size"] == str(len(html))


def test_content_handler_naming_rules():
    # SolrContentHandler.java:188-209 — lowernames, then fmap, then
    # uprefix for unknown fields
    h = SolrContentHandler(
        params={"lowernames": True, "fmap.content_type": "media_type",
                "uprefix": "attr_", "literal.source": "crawl1"},
        known_fields={"media_type", "content", "title", "source"})
    doc = h.new_document("the text", {"Content-Type": "image/bmp",
                                      "Weird-Name": "v", "title": "t"})
    assert doc["media_type"] == "image/bmp"    # lowernames + fmap
    assert doc["attr_weird_name"] == "v"       # uprefix for unknown
    assert doc["title"] == "t"
    assert doc["content"] == "the text"
    assert doc["source"] == "crawl1"           # literal


def test_content_handler_default_field_and_literals_override():
    h = SolrContentHandler(params={"defaultField": "catchall",
                                   "literal.title": "forced"},
                           known_fields={"content", "title", "catchall"})
    doc = h.new_document("txt", {"title": "extracted", "other": "x"})
    # literalsOverride (default true): extracted title suppressed
    assert doc["title"] == "forced"
    assert doc["catchall"] == "x"              # unknown -> defaultField
    # without uprefix/defaultField unknown fields are dropped
    h2 = SolrContentHandler(params={}, known_fields={"content"})
    doc2 = h2.new_document("txt", {"other": "x"})
    assert "other" not in doc2 and doc2["content"] == "txt"


def test_extract_df_distributed(spark):
    rows = [(0, bytearray(_bmp(6, 4))), (1, bytearray(_wav(16000))),
            (2, bytearray(b"<html><title>T</title><body>b</body></html>")),
            (3, bytearray(b"just text"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in extract_df(df).collect()}
    assert got[0]["content_type"] == "image/bmp"
    assert got[0]["metadata"]["width"] == "6"
    assert got[1]["metadata"]["samplerate"] == "16000"
    assert got[2]["metadata"]["title"] == "T"
    assert got[3]["content"] == "just text"
    plan = extract_df(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_truncated_blobs_degrade_not_crash():
    # magic-only prefixes: type detected, typed facts absent, no raise
    for blob, ctype in [(b"\x89PNG\r\n\x1a\n", "image/png"),
                        (b"GIF89a", "image/gif"),
                        (b"BM", "image/bmp"),
                        (b"RIFF\x00\x00\x00\x00WAVE", "audio/x-wav"),
                        (b"fLaC", "audio/flac"),
                        (b"RIFF\x00\x00\x00\x00AVI ", "video/x-msvideo")]:
        ct, text, md = extract_content(blob)
        assert ct == ctype
        assert md["stream_size"] == str(len(blob))
        assert "width" not in md or md["width"] is not None  # no crash


def test_truncated_blobs_in_spark(spark):
    rows = [(0, bytearray(b"\x89PNG\r\n\x1a\n")), (1, bytearray(_bmp(3, 3)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in extract_df(df).collect()}
    assert got[0]["content_type"] == "image/png"
    assert got[1]["metadata"]["width"] == "3"
