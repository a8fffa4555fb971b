"""Batch sessionization over event streams: gap-based session assignment
and per-session rollups as pure window/aggregate plans.

The classic event-analytics transform: events of a user belong to one
session until an inactivity gap exceeds the threshold.  Complementary to the
streaming sessionizer in ``dqx_spark.streaming`` (applyInPandasWithState):
this is the batch/backfill path, one window shuffle on the user key.

Scale shape: a single hash shuffle on ``user_col`` (the window partition),
then two windowed passes (lag, running sum) inside the same partition — no
second exchange, both window specs share the partitioning.  Heavy-hitter
users (bots) skew the window partition; mitigate upstream by filtering or
capping events per user per day, or rely on AQE skew handling for the
shuffle itself.

No reference twin (the reference scopes session-ish logic to per-micro-batch
streaming checks only); this extends the engine for training-data and
product-analytics pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dqx_spark.pipeline._timeutil import epoch_seconds

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Append a 0-based per-user session index: a new session starts when
    the gap to the previous event is STRICTLY greater than ``gap_minutes``.

    ``order_tiebreak`` (an extra ordering column, e.g. the event id) makes
    the assignment deterministic when timestamps collide.  One shuffle on
    ``user_col``; both windows reuse that partitioning.
    """
    order_cols = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_secs = epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_secs > gap_minutes * 60.0), F.lit(1)).otherwise(F.lit(0))
    running = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, (running - F.lit(1)).cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: ``(user, session_idx, n_events, session_start,
    session_end, duration_secs)``.

    The aggregation groups on (user, session) — same key prefix as the
    sessionize shuffle, so Catalyst reuses the partitioning (no second
    exchange for the groupBy)."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_tiebreak)
    return s.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(epoch_seconds(F.col(ts_col))) - F.min(epoch_seconds(F.col(ts_col)))).alias("duration_secs"),
    )
