"""Watermarked windowed aggregation: closed windows emit exactly once in
append mode; late data beyond the watermark is dropped; the watermark
survives a query restart via the checkpoint."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgraphmemory_spark.streaming.windowed import windowed_message_counts

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("interaction_uri", T.StringType()),
])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


def _run(spark, src, chk, out):
    """availableNow run into a restartable file sink; returns ALL rows
    emitted so far (runs append — callers diff successive results)."""
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (windowed_message_counts(stream, window="1 hour",
                                 late_threshold="30 minutes")
         .writeStream.format("parquet").option("path", out)
         .outputMode("append")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    time.sleep(0.2)
    return {(r.window_start, r.interaction_uri): r.n_messages
            for r in spark.read.parquet(out).collect()}


def test_windowed_counts_close_and_drop_late(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    # hours 0,1,2 for two interactions; max ts = 03:00 → watermark 02:30
    rows = []
    for h in range(3):
        for m in (5, 25, 45):
            rows.append((T0 + dt.timedelta(hours=h, minutes=m), "urn:i:1"))
        rows.append((T0 + dt.timedelta(hours=h, minutes=10), "urn:i:2"))
    rows.append((T0 + dt.timedelta(hours=3), "urn:i:1"))  # watermark driver
    _write(spark, src, rows)
    got1 = _run(spark, src, chk, out)
    # watermark 02:30 → windows [0,1) and [1,2) closed and emitted once;
    # [2,3) ends at 03:00 > watermark → still open, withheld
    closed = {(T0 + dt.timedelta(hours=h), u) for h in (0, 1)
              for u in ("urn:i:1", "urn:i:2")}
    assert set(got1) == closed
    assert all(got1[(T0 + dt.timedelta(hours=h), "urn:i:1")] == 3
               for h in (0, 1))
    assert all(got1[(T0 + dt.timedelta(hours=h), "urn:i:2")] == 1
               for h in (0, 1))

    # restart with LATE data for hour 0 (behind the checkpointed
    # watermark) + a driver event at hour 4 (watermark → 03:30):
    # the late row is dropped — no revised hour-0 emission — and the
    # only new emission is the now-closed [2,3) window
    _write(spark, src, [
        (T0 + dt.timedelta(minutes=7), "urn:i:1"),           # late, dropped
        (T0 + dt.timedelta(hours=4), "urn:i:2"),             # advances wm
    ])
    all2 = _run(spark, src, chk, out)
    got2 = {k: v for k, v in all2.items() if k not in got1}
    h2 = T0 + dt.timedelta(hours=2)
    assert got2 == {(h2, "urn:i:1"): 3, (h2, "urn:i:2"): 1}


def test_windowed_batch_oracle(spark):
    rows = [(T0 + dt.timedelta(hours=h, minutes=m), "urn:i:9")
            for h in range(2) for m in (1, 2, 3)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.window_start, r.n_messages)
           for r in windowed_message_counts(df).collect()}
    assert got == {(T0, 3), (T0 + dt.timedelta(hours=1), 3)}
