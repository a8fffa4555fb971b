"""Multi-grain time rollups (hypertable-style continuous aggregates).

``time_rollup`` computes the same aggregate at several calendar grains
(hour/day/month/…) in ONE pass over the raw data: the finest grain
aggregates from the source (the only full shuffle), and every coarser grain
**re-aggregates from the finest result** — at 100 TB the finest rollup is
orders of magnitude smaller than the input, so the coarser grains cost
almost nothing.  The union branches share lineage prefixes; Spark's
exchange-reuse rule (on by default, asserted in tests) executes each
level's aggregate exactly once at runtime.  This beats both N independent scans (N full shuffles) and
Spark's GROUPING SETS (whose Expand operator multiplies the shuffled rows
by the number of grains).

Re-aggregation requires algebraic aggregates: ``count``/``sum`` re-add,
``min``/``max`` re-extremize, and ``avg`` is derived as sum/count at the
end.  Non-algebraic aggregates (median, count_distinct) are rejected —
at scale those need sketches (percentile_approx / HLL), which don't
re-aggregate exactly.

No reference twin (databrickslabs/dqx has no rollup surface); the driver
oracle mirrors the semantics with per-grain GROUP BYs in DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup", "sliding_rollup", "GRAIN_ORDER"]

# finest -> coarsest
GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def _nests_in(a: str, g: str) -> bool:
    """True when every ``a``-bucket lies entirely inside one ``g``-bucket —
    the condition for exact re-aggregation a -> g.  minute/hour/day nest in
    everything coarser; month nests in quarter/year and quarter in year;
    WEEK nests in nothing (ISO weeks straddle month, quarter, and year
    boundaries) and nothing coarser nests through it."""
    if GRAIN_ORDER.index(a) >= GRAIN_ORDER.index(g):
        return False
    if a in ("minute", "hour", "day"):
        return True
    return (a, g) in {("month", "quarter"), ("month", "year"), ("quarter", "year")}

_ALGEBRAIC = {"count", "sum", "min", "max", "avg"}


def _validated_partial_names(aggs) -> set[str]:
    """Which partial aggregates (__cnt/__sum/__min/__max) must be carried
    for exact re-aggregation of ``aggs`` (avg derives from sum/count)."""
    bad = [a for a in aggs if a not in _ALGEBRAIC]
    if bad:
        raise ValueError(f"non-algebraic aggregates {bad}; supported: {sorted(_ALGEBRAIC)}")
    need_avg = "avg" in aggs
    return {a for a in aggs if a != "avg"} | ({"sum", "count"} if need_avg else set())


def _partial_exprs(value_col: str, partial_names: set[str]) -> list:
    v = F.col(value_col)
    out = []
    if "count" in partial_names:
        out.append(F.count(v).alias("__cnt"))
    if "sum" in partial_names:
        out.append(F.sum(v).alias("__sum"))
    if "min" in partial_names:
        out.append(F.min(v).alias("__min"))
    if "max" in partial_names:
        out.append(F.max(v).alias("__max"))
    return out


def _reagg_exprs(partial_names: set[str]) -> list:
    out = []
    if "count" in partial_names:
        out.append(F.sum("__cnt").alias("__cnt"))
    if "sum" in partial_names:
        out.append(F.sum("__sum").alias("__sum"))
    if "min" in partial_names:
        out.append(F.min("__min").alias("__min"))
    if "max" in partial_names:
        out.append(F.max("__max").alias("__max"))
    return out


def _agg_out_cols(aggs, value_col: str) -> list:
    out = []
    for a in aggs:
        if a == "count":
            out.append(F.col("__cnt").alias(f"count_{value_col}"))
        elif a == "sum":
            out.append(F.col("__sum").alias(f"sum_{value_col}"))
        elif a == "min":
            out.append(F.col("__min").alias(f"min_{value_col}"))
        elif a == "max":
            out.append(F.col("__max").alias(f"max_{value_col}"))
        elif a == "avg":
            out.append((F.col("__sum").cast("double") / F.col("__cnt")).alias(f"avg_{value_col}"))
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: list[str] | tuple[str, ...] = ("hour", "day"),
    aggs: list[str] | tuple[str, ...] = ("count", "sum"),
    group_by: list[str] | None = None,
) -> DataFrame:
    """Long-format rollup: one row per (grain, bucket_start, *group_by) with
    one column per aggregate, named ``<agg>_<value_col>``.

    All requested ``grains`` must be in ``GRAIN_ORDER``; aggregates must be
    algebraic (count/sum/min/max/avg).  The finest grain shuffles the raw
    rows once; coarser grains re-aggregate the finest result.
    """
    bad = [g for g in grains if g not in GRAIN_ORDER]
    if bad:
        raise ValueError(f"unsupported grains {bad}; supported: {GRAIN_ORDER}")
    if not grains:
        raise ValueError("grains must not be empty")
    partial_names = _validated_partial_names(aggs)
    group_by = group_by or []
    ordered = sorted(set(grains), key=GRAIN_ORDER.index)
    finest, coarser = ordered[0], ordered[1:]

    def partial_exprs():
        return _partial_exprs(value_col, partial_names)

    def reagg_exprs():
        return _reagg_exprs(partial_names)

    base = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("__bucket"), *[F.col(c) for c in group_by]
    ).agg(*partial_exprs())

    levels = {finest: base}
    for g in coarser:
        # re-aggregate from the COARSEST computed level that exactly nests
        # into g — never through 'week', whose buckets straddle month/
        # quarter/year boundaries (chaining month off week shifted every
        # boundary-straddling week's totals into the earlier month).  When
        # nothing computed nests (e.g. finest='week'), fall back to a fresh
        # partial aggregation of the raw data.
        nesting = [a for a in levels if _nests_in(a, g)]
        if nesting:
            src = levels[max(nesting, key=GRAIN_ORDER.index)]
            lvl = src.groupBy(
                F.date_trunc(g, F.col("__bucket")).alias("__bucket"), *[F.col(c) for c in group_by]
            ).agg(*reagg_exprs())
        else:
            lvl = df.groupBy(
                F.date_trunc(g, F.col(ts_col)).alias("__bucket"), *[F.col(c) for c in group_by]
            ).agg(*partial_exprs())
        levels[g] = lvl

    def finalize(g: str, frame: DataFrame) -> DataFrame:
        cols = [F.lit(g).alias("grain"), F.col("__bucket").alias("bucket_start"), *group_by]
        return frame.select(*cols, *_agg_out_cols(aggs, value_col))

    return reduce(DataFrame.unionByName, [finalize(g, levels[g]) for g in ordered])


def sliding_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_minutes: int,
    slide_minutes: int,
    aggs: list[str] | tuple[str, ...] = ("count", "sum"),
    group_by: list[str] | None = None,
) -> DataFrame:
    """Sliding-window aggregate: one row per (window_start, window_end,
    *group_by) for every window that contains at least one row — the same
    output set as ``F.window(ts, window, slide)``, built the scale-correct
    way.

    A direct ``F.window`` with a slide EXPANDS every raw row into
    ``window/slide`` copies before the shuffle — at 100 TB with a 24 h
    window sliding hourly that is a 24× shuffle multiplier.  Here the raw
    data is first aggregated to TUMBLING ``slide``-grain partials (one
    ordinary shuffle, map-side combined, no row multiplication); only the
    resulting buckets — bounded by the time range, not the data — are
    exploded into the windows they cover and re-aggregated.  Aggregates
    must therefore be algebraic (count/sum/min/max/avg).

    ``window_minutes`` must be a multiple of ``slide_minutes``.
    """
    if window_minutes <= 0 or slide_minutes <= 0:
        raise ValueError("window_minutes and slide_minutes must be positive")
    if window_minutes % slide_minutes != 0:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    partial_names = _validated_partial_names(aggs)
    group_by = group_by or []
    k = window_minutes // slide_minutes
    slide_s = slide_minutes * 60

    # floor division, NOT cast-truncation: pre-1970 epochs are negative,
    # and truncation toward zero would shift them one bucket late
    bucket_epoch = F.floor(F.unix_timestamp(F.col(ts_col)) / slide_s).cast("long") * slide_s
    base = df.groupBy(bucket_epoch.alias("__b"), *[F.col(c) for c in group_by]).agg(
        *_partial_exprs(value_col, partial_names)
    )

    # each slide bucket b belongs to the k windows starting at
    # b, b-slide, ..., b-(k-1)*slide
    anchored = base.select(
        "*",
        F.explode(
            F.sequence(F.col("__b") - F.lit((k - 1) * slide_s), F.col("__b"), F.lit(slide_s))
        ).alias("__w"),
    )
    rolled = anchored.groupBy("__w", *[F.col(c) for c in group_by]).agg(*_reagg_exprs(partial_names))

    out_cols = [
        F.timestamp_seconds(F.col("__w")).alias("window_start"),
        F.timestamp_seconds(F.col("__w") + F.lit(window_minutes * 60)).alias("window_end"),
        *group_by,
    ]
    return rolled.select(*out_cols, *_agg_out_cols(aggs, value_col))
