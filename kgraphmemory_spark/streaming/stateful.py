"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState`` — the Structured Streaming extension point for
operators Spark lacks built-in (SURVEY.md §2.9; the reference has no
streaming at all, its "real-time updates" are in-process mutations,
/root/reference/README.md:36).

Shape: url-keyed page events arrive on a stream; a session closes when a
key sees no event for ``gap_seconds`` (processing-time timeout).  Each
closed session emits one row (key, n_events, first_ts, last_ts) — the
building block for per-site crawl-burst aggregation at ingest time.

The same callable also runs in batch mode (``sessionize_batch``) where the
gap logic is a window over event time — tests assert stream == batch on
the same input, mirroring how streaming/incremental.py is validated.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("first_ts", T.TimestampType()),
    T.StructField("last_ts", T.TimestampType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("first_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
])


def _session_fn(gap_seconds: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame({
                "key": [key[0]], "n_events": [n],
                "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                "last_ts": [pd.Timestamp(last_ms, unit="ms")],
            })
            return
        n, first_ms, last_ms = (state.get if state.exists
                                else (0, None, None))
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000)
            n += len(pdf)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
        state.update((n, first_ms, last_ms))
        state.setTimeoutDuration(gap_seconds * 1000)
        # nothing to emit until the session closes (timeout branch above)
        return
    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 5,
                      key_col: str = "key", ts_col: str = "ts") -> DataFrame:
    """Streaming input (key, ts, ...) → closed-session rows.  State is one
    (n, first, last) triple per live key — O(live keys), partitioned by
    key hash like any keyed state store."""
    prepared = events.select(F.col(key_col).alias("key"),
                             F.col(ts_col).alias("ts"))
    return prepared.groupBy("key").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 5,
                     key_col: str = "key", ts_col: str = "ts") -> DataFrame:
    """Batch oracle for the streaming operator: split each key's ordered
    events where the gap exceeds ``gap_seconds`` (window lag + cumulative
    session id), aggregate per session."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("double")
    new_session = F.when(
        ts - F.lag(ts).over(w) > float(gap_seconds), 1).otherwise(0)
    return (
        events
        .withColumn("_s", F.sum(new_session).over(w))
        .groupBy(F.col(key_col).alias("key"), F.col("_s"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min(ts_col).alias("first_ts"),
             F.max(ts_col).alias("last_ts"))
        .drop("_s")
    )
