"""Trailing-window feature tests: leak-free frames, tie handling."""

from datetime import datetime

from dqx_spark.pipeline import features


def test_trailing_window_features(spark):
    rows = [
        # user 1: events at 00:00, 00:30, 01:15, 01:30
        (0, 1, datetime(2024, 1, 1, 0, 0, 0), 10.0),
        (1, 1, datetime(2024, 1, 1, 0, 30, 0), 20.0),
        (2, 1, datetime(2024, 1, 1, 1, 15, 0), 40.0),
        (3, 1, datetime(2024, 1, 1, 1, 30, 0), 80.0),
        # user 2: single event — frame is itself only
        (4, 2, datetime(2024, 1, 1, 0, 0, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = {
        r.event_id: r
        for r in features.trailing_window_features(
            df, ["user_id"], "ts", "value", windows_minutes=(60,), aggs=("count", "sum")
        ).collect()
    }
    assert (out[0].count_60m, out[0].sum_60m) == (1, 10.0)
    assert (out[1].count_60m, out[1].sum_60m) == (2, 30.0)
    # 01:15 sees 00:30 (45 min ago) but NOT 00:00 (75 min ago)
    assert (out[2].count_60m, out[2].sum_60m) == (2, 60.0)
    # 01:30 sees 00:30 (exactly 60 min ago: inclusive) and 01:15
    assert (out[3].count_60m, out[3].sum_60m) == (3, 140.0)
    # other user's events never leak in
    assert (out[4].count_60m, out[4].sum_60m) == (1, 5.0)


def test_trailing_window_ties_share_frames(spark):
    # value-based frames: rows with the same timestamp see each other
    # regardless of intra-tie order
    rows = [(i, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = features.trailing_window_features(
        df, ["user_id"], "ts", "value", windows_minutes=(60,), aggs=("count",)
    ).collect()
    assert [r.count_60m for r in out] == [3, 3, 3]
