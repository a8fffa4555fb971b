"""As-of join tests (pipeline/joins.py)."""

import contextlib
import io
import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import joins


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", datetime(2024, 1, 1, 10, 0, 0)),
            (2, "A", datetime(2024, 1, 1, 10, 5, 0)),
            (3, "B", datetime(2024, 1, 1, 10, 2, 0)),
            (4, "C", datetime(2024, 1, 1, 10, 0, 0)),  # no quotes for C
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 9, 59, 0), 100.0),
            ("A", datetime(2024, 1, 1, 10, 0, 0), 101.0),  # equal ts -> inclusive
            ("A", datetime(2024, 1, 1, 10, 4, 0), 102.0),
            ("B", datetime(2024, 1, 1, 10, 3, 0), 200.0),  # after trade 3
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(frames):
    trades, quotes = frames
    out = joins.asof_join(trades, quotes, on=["sym"], left_ts="ts", right_cols=["px"])
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    assert got == {1: 101.0, 2: 102.0, 3: None, 4: None}


def test_asof_forward(frames):
    trades, quotes = frames
    out = joins.asof_join(trades, quotes, on=["sym"], left_ts="ts", right_cols=["px"], direction="forward")
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    assert got == {1: 101.0, 2: None, 3: 200.0, 4: None}


def test_asof_tolerance(frames):
    trades, quotes = frames
    out = joins.asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_cols=["px"], tolerance_seconds=30.0
    )
    got = {r["trade_id"]: r["px_right"] for r in out.collect()}
    # trade 1 matches the equal-ts quote (0s away); trade 2's nearest prior
    # quote is 60s away -> dropped by the 30s tolerance
    assert got == {1: 101.0, 2: None, 3: None, 4: None}


def test_asof_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, datetime(2024, 1, 1, 12, 0, 0))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(datetime(2024, 1, 1, 11, 0, 0), v) for v in (5.0, 9.0, 1.0)], "ts timestamp, v double"
    )
    out = joins.asof_join(left, right, on=[], left_ts="ts", right_cols=["v"])
    assert out.collect()[0]["v_right"] == 9.0  # max payload wins the tie


def test_asof_no_pair_explosion(frames):
    trades, quotes = frames
    out = joins.asof_join(trades, quotes, on=["sym"], left_ts="ts", right_cols=["px"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Join" not in p  # union + window, literally no join operator
    # two exchanges max: right-side dedupe on (keys, ts) + the window shuffle
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) <= 2


def test_asof_validates_args(frames):
    trades, quotes = frames
    with pytest.raises(ValueError, match="direction"):
        joins.asof_join(trades, quotes, on=["sym"], left_ts="ts", direction="nearest")
    with pytest.raises(ValueError, match="right_cols"):
        joins.asof_join(trades, quotes, on=["sym"], left_ts="ts", right_cols=["nope"])


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 25.0), (3, 999.0), (3, 999.0)], "pid long, v double"
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 4.0, 30.0), (12, 20.0, 28.0)], "iid long, lo double, hi double"
    )
    inner = joins.range_join(points, ivs, "v", "lo", "hi")
    pairs = {(r["pid"], r["iid"]) for r in inner.collect()}
    assert pairs == {(1, 10), (1, 11), (2, 11), (2, 12)}
    lj = joins.range_join(points, ivs, "v", "lo", "hi", how="left")
    rows = lj.collect()
    assert len(rows) == 6  # 4 matches + both duplicate unmatched rows kept
    assert sum(1 for r in rows if r["iid"] is None and r["pid"] == 3) == 2


def test_range_join_empty_right(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    ivs = spark.createDataFrame([], "iid long, lo double, hi double")
    assert joins.range_join(points, ivs, "v", "lo", "hi").count() == 0
    left = joins.range_join(points, ivs, "v", "lo", "hi", how="left").collect()
    assert len(left) == 1 and left[0]["iid"] is None


def test_range_join_equi_keys(spark):
    points = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "k string, pid long, v double"
    )
    ivs = spark.createDataFrame([("a", 10, 0.0, 10.0)], "k string, iid long, lo double, hi double")
    # no equi-key and renamed key column: both points fall in the interval
    no_key = joins.range_join(points, ivs.withColumnRenamed("k", "k2"), "v", "lo", "hi")
    assert no_key.count() == 2
    # with the equi-key only the matching side pairs up
    keyed = joins.range_join(points, ivs, "v", "lo", "hi", on=["k"])
    assert [(r["pid"], r["iid"]) for r in keyed.collect()] == [(1, 10)]
    # non-key name collisions are rejected
    with pytest.raises(ValueError, match="collide"):
        joins.range_join(points, ivs.withColumnRenamed("iid", "pid"), "v", "lo", "hi", on=["k"])


def test_range_join_no_nested_loop(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    ivs = spark.createDataFrame([(10, 0.0, 10.0)], "iid long, lo double, hi double")
    out = joins.range_join(points, ivs, "v", "lo", "hi")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_interval_join_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    left = spark.createDataFrame(
        [(i, rng.uniform(0, 100), rng.uniform(0, 10)) for i in range(200)], "lid long, a double, ln double"
    ).select("lid", F.col("a").alias("l_lo"), (F.col("a") + F.col("ln")).alias("l_hi"))
    right = spark.createDataFrame(
        [(j, rng.uniform(0, 100), rng.uniform(0, 25)) for j in range(60)], "rid long, b double, rl double"
    ).select("rid", F.col("b").alias("r_lo"), (F.col("b") + F.col("rl")).alias("r_hi"))
    got = {
        (r.lid, r.rid)
        for r in joins.interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi").collect()
    }
    expect = {
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.l_lo <= r.r_hi and r.r_lo <= l.l_hi
    }
    assert got == expect  # exactly once per overlapping pair, none missed


def test_interval_join_left_and_empty_right(spark):
    left = spark.createDataFrame([(0, 0.0, 1.0), (1, 50.0, 51.0)], "lid long, l_lo double, l_hi double")
    right = spark.createDataFrame([(7, 0.5, 2.0)], "rid long, r_lo double, r_hi double")
    out = joins.interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi", how="left").collect()
    rows = {r.lid: r.rid for r in out}
    assert rows == {0: 7, 1: None}
    empty = right.where("rid < 0")
    out2 = joins.interval_join(left, empty, "l_lo", "l_hi", "r_lo", "r_hi", how="left").collect()
    assert {r.lid for r in out2} == {0, 1} and all(r.rid is None for r in out2)
