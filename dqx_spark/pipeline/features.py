"""Point-in-time feature engineering: trailing-window aggregates per entity.

The classic training-feature shape — "for every event, the count/sum of this
user's events over the trailing N minutes" — computed leak-free (only rows
at or before the event's own timestamp enter its frame).

Plan shape: ONE shuffle on the entity key; every requested window is a
value-based ``RANGE BETWEEN`` frame over the same sorted partition, so k
windows add zero extra shuffles or sorts.  Value-based frames also make
results deterministic under timestamp ties (all peers join the frame,
regardless of intra-tie order) — a rows-based frame would not be.

At 100 TB the partition key is the entity; skewed entities (one user = 10%
of events) should be pre-filtered or capped upstream — a range frame cannot
be salted without changing its semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dqx_spark.pipeline._timeutil import epoch_seconds

__all__ = ["trailing_window_features"]


def trailing_window_features(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    windows_minutes: tuple[int, ...] = (60, 1440),
    aggs: tuple[str, ...] = ("count", "sum"),
) -> DataFrame:
    """Append, for each row, trailing-window aggregates of ``value_col`` over
    the rows of the same ``keys`` whose ``ts_col`` lies in
    ``[ts - w minutes, ts]`` (both ends inclusive, current row included).

    Adds one column per (agg, window): ``count_60m``, ``sum_1440m``, ...
    ``count`` counts frame rows; other aggs resolve from
    ``pyspark.sql.functions`` by name and skip nulls (Spark/ANSI default).
    """
    if not windows_minutes:
        raise ValueError("windows_minutes must be non-empty")
    sec = epoch_seconds(F.col(ts_col)).cast("long")
    out_cols = []
    for w in windows_minutes:
        frame = (
            Window.partitionBy(*keys).orderBy(sec).rangeBetween(-int(w) * 60, 0)
        )
        for agg in aggs:
            if agg == "count":
                expr = F.count(F.lit(1)).over(frame)
            else:
                expr = getattr(F, agg)(F.col(value_col)).over(frame)
            out_cols.append(expr.alias(f"{agg}_{w}m"))
    return df.select("*", *out_cols)
