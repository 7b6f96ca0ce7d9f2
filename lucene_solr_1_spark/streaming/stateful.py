"""Custom stateful streaming operators via applyInPandasWithState —
the Structured Streaming piece Lucene/Solr has no analog for (its
"streaming" is NRT ingest, streaming/ingest.py); these cover the
stream-analytics side a webtext pipeline needs (SURVEY §2.H).

* sessionize_stream — per-user session assembly with an inactivity-gap
  timeout: the stateful twin of the batch `sessionize` contract query.
  State per user: (session_start, last_ts, n_events); a session is
  emitted when the gap timer fires (event-time timeout), exactly-once
  per session under checkpointing.

* windowed_counts — tumbling event-time window counts with a watermark
  for late data (built-in groupBy(window(...)) — no custom state).

Both operate on the events-table schema
(event_id, ts, user_id, event_type, value).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

GAP_MS = 30 * 60 * 1000  # 30-minute inactivity gap (matches the batch twin)
GAP_US = GAP_MS * 1000


def _sessionize_fn(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n]})
        return
    ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
    # state in epoch-MICROSECONDS: the parquet/Arrow timestamp unit, so
    # emitted session bounds are bit-identical to the event times (a
    # ms truncation here made the hash-checked oracle impossible)
    us = ts.astype("datetime64[us]").astype("int64").to_numpy()
    closed = []
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = int(us[0]), int(us[0]) - 1, 0
    for m in us:
        m = int(m)
        if m - last_us > GAP_US and n > 0:
            closed.append((start_us, last_us, n))
            start_us, n = m, 0
        last_us = m
        n += 1
    state.update((start_us, last_us, n))
    # close the open session GAP after the last event (event-time
    # timeout; the timer API is epoch-ms — round up so it never fires
    # a hair early)
    state.setTimeoutTimestamp(-(-(last_us + GAP_US) // 1000))
    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [c for _, _, c in closed]})


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events readStream -> closed sessions stream. Partitioned by
    user_id (state lives with its shuffle partition — scales to any
    key cardinality; skewed users cost one hot partition, the same
    bound as any keyed-state engine)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark — all
    built-in (incremental partial aggregation; no custom state)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("win_start"), "event_type",
                    "cnt", "sum_value"))
