"""Backward/forward as-of join — "the latest right row at or before each
left row" — an operator Spark lacks natively (DuckDB `ASOF JOIN`, kdb+
`aj`, pandas `merge_asof` all ship it).

The reference's closest analogs are its most-recent-context lookups
(latest interaction per chat thread, `kgraph_chat_bridge.py:245-271`;
most-recent-N message windows, `kgraph_interaction_bridge.py:487-493`) —
all phrased there as per-key ORDER BY + LIMIT loops.  At pipeline scale
the same need appears as "join each event to the most recent prior
snapshot/state row", and the naive Spark spellings do not survive:

- range join (`l.ts >= r.ts`) + window to keep the max right ts explodes
  to O(|L| x matches-per-key) intermediate rows;
- per-key `collect_list` + UDF search moves the whole right side through
  Python.

The scalable formulation is the UNION trick: tag both sides, union on the
join key, ONE window partitioned by key ordered by (ts, side) carries the
latest right payload forward (`last(..., ignorenulls=True)` over an
unbounded-preceding frame), then filter back to left rows.  Cost = one
hash shuffle on the key + one in-partition sort — the same shape as a
plain equi-join + window, independent of match fan-out.  Skewed keys hit
the same wall as any keyed shuffle; salt upstream if one key dominates.

Determinism: if several right rows share (key, ts), `last()` picks one
arbitrarily — pre-aggregate the right side to one row per (key, ts)
(as the registry query does) when exact reproducibility is required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    direction: str = "backward",
    tolerance_s: float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``ts`` <= left ``ts`` on the same key (``backward``; ties at
    equal ts match), or the least ``ts`` >= left ts (``forward``).
    Unmatched left rows keep nulls in the right columns (left-outer
    semantics, like DuckDB's ``ASOF LEFT JOIN``).

    Right columns come back prefixed (default ``r_``), including the
    matched right timestamp (``r_ts``).  ``tolerance_s`` (seconds,
    fractional ok) nulls the match when the timestamp gap exceeds it,
    mirroring pandas ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got "
                         f"{direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in (*keys, ts):
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"column {k!r} must exist on both sides")

    lcols = [c for c in left.columns if c not in (*keys, ts)]
    rcols = [c for c in right.columns if c not in (*keys, ts)]
    clash = set(prefix + c for c in [ts, *rcols]) & set([*keys, ts, *lcols])
    if clash:
        raise ValueError(f"prefixed right columns collide with left: "
                         f"{sorted(clash)}")

    lpay = F.struct(*[F.col(c) for c in lcols]) if lcols else F.struct(
        F.lit(True).alias("__present"))
    rpay = F.struct(F.col(ts).alias(prefix + ts),
                    *[F.col(c).alias(prefix + c) for c in rcols])
    # null literal of the opposite side's payload type, for the union
    ltype = left.select(lpay.alias("p")).schema["p"].dataType
    rtype = right.select(rpay.alias("p")).schema["p"].dataType

    lt = left.select(
        *keys, F.col(ts).alias("__ts"), F.lit(1).alias("__side"),
        lpay.alias("__lrow"), F.lit(None).cast(rtype).alias("__rrow"))
    # a NULL timestamp can never be a valid match (DuckDB ASOF and pandas
    # merge_asof never match null keys): drop null-ts right rows — under
    # ascending ordering Spark sorts nulls FIRST, so one would otherwise
    # become the "latest prior" row for every left row with no real
    # predecessor — and null the match for null-ts left rows below
    rt = right.where(F.col(ts).isNotNull()).select(
        *keys, F.col(ts).alias("__ts"), F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__lrow"), rpay.alias("__rrow"))

    tsord: Column = (F.col("__ts").asc() if direction == "backward"
                     else F.col("__ts").desc())
    w = (Window.partitionBy(*keys)
         .orderBy(tsord, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = (lt.unionByName(rt)
         .withColumn("__match", F.last("__rrow", ignorenulls=True).over(w))
         .where(F.col("__side") == 1)
         .withColumn("__match", F.when(F.col("__ts").isNotNull(),
                                       F.col("__match"))))

    if tolerance_s is not None:
        gap = F.abs(F.col("__ts").cast("double")
                    - F.col(f"__match.{prefix}{ts}").cast("double"))
        m = m.withColumn("__match", F.when(gap <= tolerance_s,
                                           F.col("__match")))

    return m.select(
        *keys, F.col("__ts").alias(ts),
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        F.col(f"__match.{prefix}{ts}").alias(prefix + ts),
        *[F.col(f"__match.{prefix}{c}").alias(prefix + c) for c in rcols],
    )
