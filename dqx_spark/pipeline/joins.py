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

from dqx_spark.pipeline._timeutil import numeric_axis

__all__ = ["asof_join", "range_join", "interval_join"]


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
        # a right row with a null as-of time can never be "at or before"
        # anything — left in, it sorts FIRST under asc and forward-fills
        # into left rows that have no true match (r4 review)
        right.where(F.col(right_ts).isNotNull())
        .groupBy(*[F.col(c) for c in on], F.col(right_ts).alias("__ts"))
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
    # a left row with a null timestamp has no as-of position: always unmatched
    out = out.withColumn("__fill", F.when(F.col("__ts").isNotNull(), F.col("__fill")))
    if tolerance_seconds is not None:
        dist = F.abs(F.col("__ts").cast("double") - F.col("__fill.__rts").cast("double"))
        out = out.withColumn("__fill", F.when(dist <= float(tolerance_seconds), F.col("__fill")))
    proj = [*left.columns, F.col("__fill.__rts").alias(f"{right_ts}{suffix}")] + [
        F.col(f"__fill.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return out.select(*proj)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs where ``right_start <= left_point <=
    right_end`` (inclusive), optionally under equi-keys ``on`` (same column
    name on both sides).  Returns left columns + the non-key right columns
    (those names must not collide with left).

    Spark plans a bare inequality join as a broadcast nested loop — O(|L|·|R|)
    comparisons per key.  Here intervals explode into integer buckets of
    adaptive width (the 90th-percentile interval length via one driver
    action over the slim interval frame, floored so one interval lands in
    O(1) buckets and capped so a single giant interval can't explode);
    a point falls in exactly ONE bucket, so the bucket equi-join yields each
    qualifying pair exactly once — no dedup pass.  ``how='left'`` adds back
    unmatched left rows with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = on or []
    clash = [c for c in right.columns if c in left.columns and c not in on]
    if clash:
        raise ValueError(f"right column names collide with left: {clash}")
    right_out = [c for c in right.columns if c not in on]

    point = numeric_axis(left, left_point)
    lo, hi = numeric_axis(right, right_start), numeric_axis(right, right_end)
    stats = right.where(lo <= hi).agg(
        F.min(lo).alias("lo"),
        F.max(hi).alias("hi"),
        F.percentile_approx(hi - lo, 0.9).alias("p90len"),
    ).first()
    if stats is None or stats["lo"] is None:
        empty_right = [F.lit(None).cast(t).alias(c) for c, t in right.dtypes if c not in on]
        matched = left.select(*left.columns, *empty_right).limit(0)
        return left.select(*left.columns, *empty_right) if how == "left" else matched
    span = float(stats["hi"]) - float(stats["lo"])
    width = max(float(stats["p90len"] or 0.0), span / 4096.0, 1e-9)

    bucketed = right.where(lo <= hi).select(
        "*",
        F.explode(
            F.sequence(F.floor(lo / width).cast("long"), F.floor(hi / width).cast("long"))
        ).alias("__bucket"),
    )
    tagged_left = left.withColumn("__bucket", F.floor(point / width).cast("long"))
    cond = ["__bucket"] + on
    joined = tagged_left.join(bucketed, on=cond, how="inner").where((point >= lo) & (point <= hi))
    matched = joined.select(*left.columns, *right_out)
    if how == "inner":
        return matched
    # add back unmatched left rows, preserving duplicate-row multiplicity via
    # a per-row id that is grouped on and then dropped
    with_id = tagged_left.withColumn("__rowid", F.monotonically_increasing_id())
    misses = with_id.join(
        bucketed.select(*(on + ["__bucket", right_start, right_end])),
        on=cond,
        how="left",
    )
    miss_rows = (
        misses.groupBy("__rowid")
        .agg(
            *[F.first(c).alias(c) for c in left.columns],
            F.max(F.when((point >= lo) & (point <= hi), 1).otherwise(0)).alias("__hit"),
        )
        .where(F.col("__hit") == 0)
    )
    empty_right = [F.lit(None).cast(t).alias(c) for c, t in right.dtypes if c not in on]
    return matched.unionByName(miss_rows.select(*left.columns, *empty_right))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs whose intervals overlap: ``left_start <=
    right_end AND right_start <= left_end`` (inclusive ends), optionally
    under equi-keys ``on``.  Returns left columns + non-key right columns.

    Same scale story as :func:`range_join` — a bare inequality join
    degenerates to a broadcast nested loop — but with BOTH sides exploded
    into adaptive integer buckets.  A pair overlapping several buckets would
    normally need a dedup shuffle; instead each pair is emitted only at its
    CANONICAL bucket, the bucket of ``greatest(left_start, right_start)``
    (the later start lies inside both intervals, so both sides are
    guaranteed to have exploded into that bucket) — qualifying pairs appear
    exactly once with no ``distinct``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = on or []
    clash = [c for c in right.columns if c in left.columns and c not in on]
    if clash:
        raise ValueError(f"right column names collide with left: {clash}")
    right_out = [c for c in right.columns if c not in on]

    llo, lhi = numeric_axis(left, left_start), numeric_axis(left, left_end)
    rlo, rhi = numeric_axis(right, right_start), numeric_axis(right, right_end)
    slim = left.where(llo <= lhi).select(llo.alias("lo"), lhi.alias("hi")).unionByName(
        right.where(rlo <= rhi).select(rlo.alias("lo"), rhi.alias("hi"))
    )
    stats = slim.agg(
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.percentile_approx(F.col("hi") - F.col("lo"), 0.9).alias("p90len"),
    ).first()
    empty_right = [F.lit(None).cast(t).alias(c) for c, t in right.dtypes if c not in on]
    if stats is None or stats["lo"] is None:
        matched = left.select(*left.columns, *empty_right).limit(0)
        return left.select(*left.columns, *empty_right) if how == "left" else matched
    span = float(stats["hi"]) - float(stats["lo"])
    width = max(float(stats["p90len"] or 0.0), span / 4096.0, 1e-9)

    def bucketize(df, lo, hi):
        return df.where(lo <= hi).select(
            "*",
            F.explode(
                F.sequence(F.floor(lo / width).cast("long"), F.floor(hi / width).cast("long"))
            ).alias("__bucket"),
        )

    bl = bucketize(left, llo, lhi)
    br = bucketize(right, rlo, rhi)
    cond = ["__bucket"] + on
    canonical = F.col("__bucket") == F.floor(F.greatest(llo, rlo) / width).cast("long")
    joined = (
        bl.join(br, on=cond, how="inner")
        .where((llo <= rhi) & (rlo <= lhi) & canonical)
    )
    matched = joined.select(*left.columns, *right_out)
    if how == "inner":
        return matched
    with_id = left.withColumn("__rowid", F.monotonically_increasing_id())
    hit_ids = (
        bucketize(with_id, llo, lhi)
        .join(br.select(*(on + ["__bucket", right_start, right_end])), on=cond, how="inner")
        .where((llo <= rhi) & (rlo <= lhi))
        .select("__rowid")
        .distinct()
    )
    misses = with_id.join(hit_ids, "__rowid", "left_anti").drop("__rowid")
    return matched.unionByName(misses.select(*left.columns, *empty_right))
