"""Shuffle-health diagnostics: find the hot keys BEFORE they kill a join.

Every skew mitigation in this package (salting, AQE skew-join, doc-freq
caps, broadcast thresholds) needs the same input: which keys are hot and
how hot.  These helpers compute that with the cheapest possible plans so
they can run ad hoc on a 100 TB table.

Beyond-reference scope: the reference engine profiles VALUES
(profiler.py); this profiles KEY DISTRIBUTIONS for physical planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqx_spark.errors import InvalidParameterError

__all__ = ["key_frequencies", "key_skew_stats"]


def key_frequencies(df: DataFrame, cols: list[str], top_k: int = 100) -> DataFrame:
    """Top ``top_k`` heaviest key values: ``(*cols, key_count,
    key_fraction)``, heaviest first.

    One shuffle (groupBy with map-side combine) + a global top-k
    (TakeOrdered — per-partition heaps, no full sort) + a broadcast 1-row
    total for the fraction.  NULL keys count as a key — they are the most
    common real-world hot key.
    """
    if not cols:
        raise InvalidParameterError("cols must be non-empty")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("key_count"))
    # total from a plain scan-count of df, NOT by re-aggregating `counts` —
    # branching the groupBy subplan would re-run its shuffle lineage twice
    # (r5 review); a bare count is metadata-cheap on columnar sources
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    top = counts.orderBy(F.col("key_count").desc(), *[F.col(c).asc_nulls_last() for c in cols]).limit(top_k)
    return top.crossJoin(F.broadcast(total)).select(
        *cols,
        "key_count",
        (F.col("key_count") / F.col("__total")).alias("key_fraction"),
    )


def key_skew_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row skew summary of a prospective shuffle key: ``(n_rows,
    n_keys, max_key_count, avg_key_count, p99_key_count, skew_factor,
    suggested_salt)``.

    ``skew_factor = max/avg`` is the hot-task multiplier a plain hash
    shuffle on this key would see; ``suggested_salt`` is the power-of-two
    salt bucket count that brings the hottest key down to ~4× the average
    (1 = no salting needed).  Two chained aggregations — the per-key
    counts never leave the executors.
    """
    if not cols:
        raise InvalidParameterError("cols must be non-empty")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    stats = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_key_count"),
        F.avg("c").alias("avg_key_count"),
        F.percentile_approx("c", 0.99).alias("p99_key_count"),
    )
    skew = F.col("max_key_count") / F.col("avg_key_count")
    # smallest power of two >= skew/4, floored at 1
    suggested = F.when(skew <= F.lit(4.0), F.lit(1)).otherwise(
        F.pow(F.lit(2.0), F.ceil(F.log2(skew / F.lit(4.0)))).cast("int")
    )
    return stats.select(
        "n_rows",
        "n_keys",
        "max_key_count",
        F.round("avg_key_count", 3).alias("avg_key_count"),
        "p99_key_count",
        F.round(skew, 3).alias("skew_factor"),
        suggested.alias("suggested_salt"),
    )
