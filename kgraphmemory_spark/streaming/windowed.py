"""Watermarked windowed aggregation over the live message stream — the
late-data half of the Structured Streaming surface (SURVEY.md §2.9;
`incremental.py` covers exactly-once ingest, `stateful.py` custom state).

Shape: the chat-analytics rollup (messages per interaction per time
window — the streaming twin of ChatView/recent-interactions counts) as

    stream.withWatermark(ts, late_threshold)
          .groupBy(window(ts, win), interaction_uri).count()

Semantics (and what the tests pin down):
- append output mode emits a window only once its end falls behind the
  watermark — consumers downstream see each closed window exactly once;
- events later than the watermark are DROPPED, not merged — a closed
  window's count never changes (idempotent downstream appends);
- the watermark is carried in the streaming checkpoint, so a restarted
  query keeps rejecting data older than what it already closed.

At scale the state store holds one row per (open window × interaction);
the watermark bounds that state — without it the state grows without
limit (the reason Spark refuses append-mode windowed aggs un-watermarked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_message_counts(messages: DataFrame,
                            window: str = "1 hour",
                            late_threshold: str = "30 minutes") -> DataFrame:
    """messages(ts, interaction_uri, ...) → (window_start, window_end,
    interaction_uri, n_messages); works on a streaming OR batch frame
    (batch ignores the watermark — used as the test oracle)."""
    out = messages
    if out.isStreaming:
        out = out.withWatermark("ts", late_threshold)
    return (
        out.groupBy(F.window("ts", window).alias("w"),
                    F.col("interaction_uri"))
        .agg(F.count(F.lit(1)).alias("n_messages"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "interaction_uri", "n_messages")
    )
