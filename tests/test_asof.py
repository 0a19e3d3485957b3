"""asof_join (operators/asof.py) vs pandas.merge_asof — the independent
single-node reference implementation — on randomized keyed time series,
plus edge semantics (exact-ts ties, unmatched lefts, tolerance, forward
direction, arg validation)."""

import datetime as dt
import random

import pandas as pd
import pytest

from kgraphmemory_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _mk(rng, n, keys, vcol):
    rows = [(rng.choice(keys),
             T0 + dt.timedelta(seconds=rng.randrange(100_000)),
             round(rng.uniform(0, 100), 2)) for _ in range(n)]
    # unique (key, ts): the operator documents arbitrary pick on dup ts
    seen, out = set(), []
    for k, ts, v in rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            out.append((k, ts, v))
    return pd.DataFrame(out, columns=["k", "ts", vcol])


def _pandas_asof(lp, rp, direction, tolerance=None):
    exp = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"), on="ts", by="k",
        direction=direction, tolerance=tolerance)
    return {(r.k, r.ts, r.lv): (None if pd.isna(r.rv) else r.rv)
            for r in exp.itertuples()}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    rng = random.Random(7)
    keys = [f"u{i}" for i in range(6)]
    lp = _mk(rng, 300, keys, "lv")
    rp = _mk(rng, 200, keys, "rv")
    got_df = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                       on="k", ts="ts", direction=direction)
    got = {(r.k, r.ts, r.lv): r.r_rv for r in got_df.collect()}
    assert got == _pandas_asof(lp, rp, direction)


def test_asof_exact_ts_tie_matches(spark):
    ts = T0 + dt.timedelta(hours=1)
    l = spark.createDataFrame([("a", ts, 1.0)], "k string, ts timestamp, lv double")
    r = spark.createDataFrame([("a", ts, 9.0)], "k string, ts timestamp, rv double")
    row = asof_join(l, r, on="k", ts="ts").collect()[0]
    assert row.r_rv == 9.0 and row.r_ts == ts  # ts >= r.ts includes equality


def test_asof_unmatched_left_keeps_nulls(spark):
    l = spark.createDataFrame(
        [("a", T0, 1.0), ("b", T0, 2.0)], "k string, ts timestamp, lv double")
    r = spark.createDataFrame(
        [("a", T0 + dt.timedelta(seconds=5), 9.0)],
        "k string, ts timestamp, rv double")
    got = {r_.k: (r_.r_rv, r_.r_ts) for r_ in
           asof_join(l, r, on="k", ts="ts").collect()}
    assert got == {"a": (None, None), "b": (None, None)}  # right is AFTER


def test_asof_tolerance(spark):
    rng = random.Random(11)
    keys = ["x", "y"]
    lp = _mk(rng, 120, keys, "lv")
    rp = _mk(rng, 80, keys, "rv")
    got_df = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                       on="k", ts="ts", tolerance_s=3600)
    got = {(r.k, r.ts, r.lv): r.r_rv for r in got_df.collect()}
    assert got == _pandas_asof(lp, rp, "backward",
                               tolerance=pd.Timedelta(seconds=3600))


def test_asof_arg_validation(spark):
    l = spark.createDataFrame([("a", T0, 1.0)],
                              "k string, ts timestamp, r_v double")
    r = spark.createDataFrame([("a", T0, 2.0)],
                              "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, on="k", ts="ts")  # left r_v vs prefixed right v
    with pytest.raises(ValueError, match="backward/forward"):
        asof_join(l, r, on="k", ts="ts", direction="nearest")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(l, r.withColumnRenamed("k", "kk"), on="k", ts="ts")


def test_asof_null_timestamps_never_match(spark):
    """A NULL-ts right row must never be anyone's match (DuckDB ASOF /
    pandas semantics), and a NULL-ts left row gets no match — in both
    directions."""
    ts = T0 + dt.timedelta(hours=1)
    l = spark.createDataFrame(
        [("a", ts, 1.0), ("a", None, 2.0)],
        "k string, ts timestamp, lv double")
    r = spark.createDataFrame(
        [("a", None, 5.0), ("a", ts + dt.timedelta(hours=1), 7.0)],
        "k string, ts timestamp, rv double")
    back = {r_.lv: r_.r_rv for r_ in
            asof_join(l, r, on="k", ts="ts").collect()}
    # left@ts has no prior real right row; the NULL-ts right row (which
    # ascending sort puts FIRST) must not be picked
    assert back == {1.0: None, 2.0: None}
    fwd = {r_.lv: r_.r_rv for r_ in
           asof_join(l, r, on="k", ts="ts", direction="forward").collect()}
    assert fwd == {1.0: 7.0, 2.0: None}
