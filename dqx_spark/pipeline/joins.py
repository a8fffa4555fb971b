"""Temporal join operators Spark lacks natively: as-of join (point-in-time
lookup), implemented with the union + window forward-fill technique.

The naive as-of formulation — a range join ``l.ts >= r.ts`` + "pick the
latest" — explodes into a broadcast-nested-loop or an O(|L|·|R|) range join
per key.  The scalable shape used here:

1. project both sides to a common layout (keys, ts, tagged payload),
2. union them (no join!),
3. one hash shuffle on the equi-keys, sort by (ts, side-tag) inside each
   partition,
4. forward-fill the right payload with ``last(..., ignorenulls)`` over an
   unbounded-preceding window,
5. keep only left rows.

Cost at 100 TB: one exchange of |L|+|R| slim rows and one in-partition sort
— the same price as a regular sort-merge join, with no pair blow-up on hot
keys.  This is the standard point-in-time-correctness join used by feature
stores (no look-ahead leakage), which is exactly the training-data use case.

No reference twin (databrickslabs/dqx has no temporal joins); DuckDB's
native ``ASOF JOIN`` serves as the correctness oracle in the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for every left row, attach the single right row with
    the closest timestamp at-or-before it (``backward``, inclusive) or
    at-or-after it (``forward``, inclusive) within the same ``on`` keys.

    ``right_cols`` (default: all right columns except keys and timestamp)
    are appended with ``suffix``; unmatched left rows get nulls, like a left
    join.  ``tolerance_seconds`` drops matches farther than the tolerance.

    Ties on the right side (same keys + timestamp) are broken by preferring
    the row that sorts last over ``right_cols`` values, deterministically.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_ts = right_ts or left_ts
    right_cols = right_cols or [c for c in right.columns if c not in set(on) | {right_ts}]
    missing = [c for c in right_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right: {missing}")

    pay = F.struct(F.col(right_ts).cast("timestamp").alias("__rts"), *[F.col(c) for c in right_cols])
    # one row per (keys, ts): max() over the payload struct is a deterministic
    # tie-break and keeps the union slim (no duplicate fill candidates)
    rs = (
        right.groupBy(*[F.col(c) for c in on], F.col(right_ts).alias("__ts"))
        .agg(F.max(pay).alias("__rpay"))
        .select(*on, F.col("__ts").cast("timestamp").alias("__ts"), "__rpay")
        .withColumn("__tag", F.lit(0))
    )
    ls = (
        left.withColumn("__ts", F.col(left_ts).cast("timestamp"))
        .withColumn("__rpay", F.lit(None).cast(rs.schema["__rpay"].dataType))
        .withColumn("__tag", F.lit(1))
    )
    unioned = ls.select(*left.columns, "__ts", "__rpay", "__tag").unionByName(
        rs.select(
            *on,
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in on],
            "__ts",
            "__rpay",
            "__tag",
        )
    )
    # backward: right rows sort before left at equal ts (inclusive match);
    # forward: reverse time so "previous" means "next at-or-after"
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__tag").asc())
    else:
        w = Window.partitionBy(*on).orderBy(F.col("__ts").desc(), F.col("__tag").asc())
    filled = F.last("__rpay", ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned.withColumn("__fill", filled).where(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        dist = F.abs(F.col("__ts").cast("double") - F.col("__fill.__rts").cast("double"))
        out = out.withColumn("__fill", F.when(dist <= float(tolerance_seconds), F.col("__fill")))
    proj = [*left.columns, F.col("__fill.__rts").alias(f"{right_ts}{suffix}")] + [
        F.col(f"__fill.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return out.select(*proj)
