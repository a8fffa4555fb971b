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


class TestSlidingRollup:
    def test_matches_f_window_semantics(self, spark):
        """Same output set as a direct F.window(ts, window, slide) pass —
        including windows whose anchor bucket is empty but that cover data."""
        from pyspark.sql import functions as F

        from dqx_spark.pipeline.rollup import sliding_rollup

        rows = [
            ("2024-01-01 00:05:00", 1.0, "a"),
            ("2024-01-01 00:35:00", 2.0, "a"),
            ("2024-01-01 02:10:00", 4.0, "b"),
            ("2024-01-01 02:59:00", 8.0, "b"),
        ]
        df = spark.createDataFrame(rows, "ts string, v double, g string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = {
            (str(r.window_start), str(r.window_end), r.g): (r.count_v, r.sum_v, r.avg_v)
            for r in sliding_rollup(df, "ts", "v", 60, 30, aggs=("count", "sum", "avg"), group_by=["g"]).collect()
        }
        direct = (
            df.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"), "g")
            .agg(F.count("v").alias("c"), F.sum("v").alias("s"), F.avg("v").alias("a"))
        )
        want = {
            (str(r.w.start), str(r.w.end), r.g): (r.c, r.s, r.a) for r in direct.collect()
        }
        assert got == want
        assert len(got) == 6  # 4 rows x 2 windows, minus the two a-rows sharing 00:00-01:00

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from dqx_spark.pipeline.rollup import sliding_rollup

        df = spark.range(1).select(F.current_timestamp().alias("ts"), F.lit(1.0).alias("v"))
        with _pytest.raises(ValueError):
            sliding_rollup(df, "ts", "v", 50, 30)
        with _pytest.raises(ValueError):
            sliding_rollup(df, "ts", "v", 60, 30, aggs=("median",))

    def test_no_raw_row_expansion_in_plan(self, spark):
        """The explode must sit ABOVE the first aggregate (bucket level),
        never on the raw rows."""
        import io, contextlib

        from dqx_spark.pipeline.rollup import sliding_rollup

        df = spark.range(100).select(
            F.timestamp_seconds(F.col("id") * 60).alias("ts"), F.col("id").cast("double").alias("v")
        )
        out = sliding_rollup(df, "ts", "v", 60, 15)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        import re as _re

        p = buf.getvalue()
        # exactly one explode node, sitting between the two aggregations
        # (bucket level), and no F.window-style Expand of the raw rows
        nodes = _re.findall(r"\(\d+\) (\w+)", p)
        assert nodes.count("Generate") == 1
        assert "Expand" not in nodes
        gen = nodes.index("Generate")
        aggs_idx = [i for i, n in enumerate(nodes) if n == "HashAggregate"]
        # formatted explain lists root-first: the final window aggregate
        # precedes Generate, the bucket partials follow it
        assert aggs_idx[0] < gen < aggs_idx[-1]


def test_sliding_rollup_pre_epoch_timestamps(spark):
    """Floor-division regression (r5 review): negative epochs must land in
    the windows that actually contain them, matching F.window exactly."""
    from pyspark.sql import functions as F

    from dqx_spark.pipeline.rollup import sliding_rollup

    rows = [("1969-12-31 23:00:30", 1.0), ("1969-12-31 22:10:00", 2.0), ("1970-01-01 00:10:00", 4.0)]
    df = spark.createDataFrame(rows, "ts string, v double").withColumn("ts", F.to_timestamp("ts"))
    got = {
        (str(r.window_start), str(r.window_end)): (r.count_v, r.sum_v)
        for r in sliding_rollup(df, "ts", "v", 60, 30).collect()
    }
    direct = df.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w")).agg(
        F.count("v").alias("c"), F.sum("v").alias("s")
    )
    want = {(str(r.w.start), str(r.w.end)): (r.c, r.s) for r in direct.collect()}
    assert got == want


def test_sliding_rollup_rejects_nonpositive_params(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dqx_spark.pipeline.rollup import sliding_rollup

    df = spark.range(1).select(F.current_timestamp().alias("ts"), F.lit(1.0).alias("v"))
    for w, sl in ((60, 0), (60, -30), (0, 30), (-60, -30)):
        with _pytest.raises(ValueError, match="positive"):
            sliding_rollup(df, "ts", "v", w, sl)
