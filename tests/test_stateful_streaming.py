"""applyInPandasWithState sessionizer (streaming/stateful.py): closed
sessions from the stream match the batch sessionize semantics."""

import os

import pandas as pd
import pytest

from lucene_solr_1_spark.streaming.stateful import (GAP_MS,
                                                    sessionize_stream,
                                                    windowed_counts)


def _events_pdf():
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    eid = 0
    # user 1: two sessions (gap 45min > 30min), 3+2 events
    for off in [0, 5, 10, 55, 60]:
        rows.append((eid, base + pd.Timedelta(minutes=off), 1, "click", 1.0))
        eid += 1
    # user 2: one session, 2 events 29min apart (< gap)
    for off in [0, 29]:
        rows.append((eid, base + pd.Timedelta(minutes=off), 2, "view", 2.0))
        eid += 1
    # sentinel user far in the future: advances the watermark past
    # every earlier session's timeout so their timers fire
    rows.append((eid, base + pd.Timedelta(hours=50), 99, "x", 0.0))
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                       "event_type", "value"])


def test_sessionize_stream_matches_batch(spark, tmp_root):
    src = os.path.join(tmp_root, "events_src")
    ckpt = os.path.join(tmp_root, "events_ckpt")
    pdf = _events_pdf()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src))
    sessions = sessionize_stream(stream, watermark="1 hour")
    q = (sessions.writeStream.format("memory").queryName("sess")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM sess").toPandas()
           .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    # batch expectation (same 30-min gap rule)
    exp = []
    for uid, g in pdf[pdf.user_id != 99].groupby("user_id"):
        ts = g["ts"].sort_values().tolist()
        start, last, n = ts[0], ts[0], 0
        for t in ts:
            if (t - last).total_seconds() * 1000 > GAP_MS and n:
                exp.append((uid, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        exp.append((uid, start, last, n))
    exp_df = (pd.DataFrame(exp, columns=["user_id", "session_start",
                                         "session_end", "n_events"])
              .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    got_closed = got[got.user_id != 99].reset_index(drop=True)
    assert got_closed["user_id"].tolist() == exp_df["user_id"].tolist()
    assert got_closed["session_start"].tolist() == exp_df["session_start"].tolist()
    assert got_closed["session_end"].tolist() == exp_df["session_end"].tolist()
    assert got_closed["n_events"].tolist() == exp_df["n_events"].tolist()


def test_windowed_counts_stream(spark, tmp_root):
    src = os.path.join(tmp_root, "events_src2")
    ckpt = os.path.join(tmp_root, "events_ckpt2")
    pdf = _events_pdf()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src))
    q = (windowed_counts(stream, window="30 minutes", watermark="1 hour")
         .writeStream.format("memory").queryName("wc")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM wc").toPandas()
    # closed windows only (watermark = 50h - 1h leaves every early window closed)
    clicks = got[got.event_type == "click"]["cnt"].sum()
    views = got[got.event_type == "view"]["cnt"].sum()
    assert clicks == 5 and views == 2
