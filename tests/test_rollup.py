"""Multi-grain time rollup tests (pipeline/rollup.py)."""

import contextlib
import io
import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import rollup


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, "a", datetime(2024, 1, 1, 10, 15), 1.0),
        (2, "a", datetime(2024, 1, 1, 10, 45), 2.0),
        (3, "a", datetime(2024, 1, 1, 11, 5), 4.0),
        (4, "b", datetime(2024, 1, 2, 10, 0), 8.0),
    ]
    return spark.createDataFrame(rows, "id long, k string, ts timestamp, v double")


def test_rollup_values_across_grains(ev):
    out = rollup.time_rollup(ev, "ts", "v", grains=("hour", "day"), aggs=("count", "sum", "avg"))
    rows = {(r["grain"], str(r["bucket_start"])): r for r in out.collect()}
    h = rows[("hour", "2024-01-01 10:00:00")]
    assert h["count_v"] == 2 and h["sum_v"] == 3.0 and h["avg_v"] == 1.5
    d = rows[("day", "2024-01-01 00:00:00")]
    assert d["count_v"] == 3 and d["sum_v"] == 7.0
    assert rows[("day", "2024-01-02 00:00:00")]["sum_v"] == 8.0


def test_rollup_group_by_and_minmax(ev):
    out = rollup.time_rollup(ev, "ts", "v", grains=("day",), aggs=("min", "max"), group_by=["k"])
    rows = {(r["k"], str(r["bucket_start"])): r for r in out.collect()}
    assert rows[("a", "2024-01-01 00:00:00")]["min_v"] == 1.0
    assert rows[("a", "2024-01-01 00:00:00")]["max_v"] == 4.0
    assert rows[("b", "2024-01-02 00:00:00")]["min_v"] == 8.0


def test_rollup_shares_work_across_grains(ev):
    out = rollup.time_rollup(ev, "ts", "v", grains=("minute", "hour", "day", "month"))
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    # each grain's aggregate is an identical subtree across the union
    # branches, so Spark's exchange reuse computes every level exactly once
    # — the raw-data shuffle (finest grain) runs a single time
    assert "ReusedExchange" in executed
    # no Expand: GROUPING SETS would multiply shuffled rows by grain count
    assert "Expand" not in executed


def test_rollup_validates(ev):
    with pytest.raises(ValueError, match="unsupported grains"):
        rollup.time_rollup(ev, "ts", "v", grains=("fortnight",))
    with pytest.raises(ValueError, match="non-algebraic"):
        rollup.time_rollup(ev, "ts", "v", aggs=("median",))


def test_week_straddles_month_boundary(spark):
    """Regression (r4 review): chaining month off week shifted every
    boundary-straddling week's totals into the earlier month.  2025-03-31
    (Mon) and 2025-04-02 share an ISO week; their month totals must split."""
    ev = spark.createDataFrame(
        [("2025-03-31 10:00:00", 1.0), ("2025-04-02 10:00:00", 10.0)],
        "ts_s string, v double",
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "v")
    out = rollup.time_rollup(ev, "ts", "v", grains=("day", "week", "month"), aggs=("sum",))
    months = {str(r["bucket_start"])[:7]: r["sum_v"] for r in out.where("grain = 'month'").collect()}
    assert months == {"2025-03": 1.0, "2025-04": 10.0}
    weeks = {str(r["bucket_start"])[:10]: r["sum_v"] for r in out.where("grain = 'week'").collect()}
    assert weeks == {"2025-03-31": 11.0}
    # finest = week forces the raw fallback for month
    out2 = rollup.time_rollup(ev, "ts", "v", grains=("week", "month"), aggs=("sum",))
    months2 = {str(r["bucket_start"])[:7]: r["sum_v"] for r in out2.where("grain = 'month'").collect()}
    assert months2 == {"2025-03": 1.0, "2025-04": 10.0}
