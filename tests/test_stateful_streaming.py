"""applyInPandasWithState sessionization: streaming sessions must equal the
batch window oracle on the same events; timeouts close idle sessions."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.streaming.stateful import (
    SESSION_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

# two bursts for site-a (gap 60 s between them), one for site-b
EVENTS = (
    [("site-a", T0 + dt.timedelta(seconds=s)) for s in (0, 1, 3)]
    + [("site-a", T0 + dt.timedelta(seconds=s)) for s in (63, 64)]
    + [("site-b", T0 + dt.timedelta(seconds=s)) for s in (10, 11, 12, 13)]
)


def test_batch_sessionization(spark):
    ev = spark.createDataFrame(EVENTS, "key string, ts timestamp")
    got = {(r.key, r.n_events, r.first_ts, r.last_ts)
           for r in sessionize_batch(ev, gap_seconds=5).collect()}
    want = {
        ("site-a", 3, T0, T0 + dt.timedelta(seconds=3)),
        ("site-a", 2, T0 + dt.timedelta(seconds=63),
         T0 + dt.timedelta(seconds=64)),
        ("site-b", 4, T0 + dt.timedelta(seconds=10),
         T0 + dt.timedelta(seconds=13)),
    }
    assert got == want


@pytest.mark.slow
def test_stream_matches_batch(spark, tmp_path):
    """All events land in one micro-batch; the processing-time timeout then
    closes every key's state → one session per key covering its full span
    (equal to the batch oracle with an infinite event-time gap)."""
    src = str(tmp_path / "events_in")
    ev = spark.createDataFrame(EVENTS, "key string, ts timestamp")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("key string, ts timestamp").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=2)
        .writeStream.format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("sessions").count() >= 2:
                break
            time.sleep(2)
        rows = {(r.key, r.n_events, r.first_ts, r.last_ts)
                for r in spark.table("sessions").collect()}
    finally:
        q.stop()

    want = {(r.key, r.n_events, r.first_ts, r.last_ts)
            for r in sessionize_batch(ev, gap_seconds=10**9).collect()}
    assert rows == want
    assert {k for k, *_ in rows} == {"site-a", "site-b"}
