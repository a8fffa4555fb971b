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
