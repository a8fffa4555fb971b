"""Dataset-level checks: each returns ``(condition, apply_closure)``.

The closure transforms the DataFrame (aggregate / join / window) to append a
*hidden message column* (null = pass, message = fail); the condition simply
lifts that column through ``make_condition``.  The engine threads the
DataFrame through closures and restores the original column set afterwards.

Semantics derived from the reference ``check_funcs.py`` §2.4 inventory
(SURVEY.md).  Scale-driven deviations (documented inline):

* grouped aggregate checks use ``groupBy`` + map-side partial aggregation +
  join-back (AQE auto-broadcasts the small aggregated side) instead of a
  window over the full row stream — a window has no partial aggregation and
  shuffles every row; ``groupBy`` shuffles only the reduced groups.
* MAD outlier stats are computed lazily inside the plan (agg + crossJoin of
  1-row DataFrames) instead of driver-side actions.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from dqx_spark.functions._helpers import (
    filtered,
    get_limit_expr,
    str_value,
    unique_suffix,
    within_tolerance,
)
from dqx_spark.reporting import build_dq_info_struct, register_dq_info_field
from dqx_spark.errors import InvalidParameterError, UnsafeSqlQueryError
from dqx_spark.rule import make_condition, normalize_col_str, register_rule, to_col

# model-backed anomaly checks stage per-row diagnostics into the wide
# _dq_info struct (reference schema/dq_info_schema.py registry pattern)
register_dq_info_field(
    "anomaly",
    T.StructType(
        [
            T.StructField("score", T.DoubleType(), True),
            T.StructField("threshold", T.DoubleType(), True),
            T.StructField("is_anomaly", T.BooleanType(), True),
            T.StructField("model_id", T.StringType(), True),
        ]
    ),
)

__all__ = [
    "is_unique",
    "foreign_key",
    "sql_query",
    "is_aggr_not_greater_than",
    "is_aggr_not_less_than",
    "is_aggr_equal",
    "is_aggr_not_equal",
    "aggr_matches_dataset",
    "compare_datasets",
    "is_data_fresh_per_time_window",
    "has_no_gaps_per_time_window",
    "has_valid_schema",
    "has_no_outliers",
    "has_no_aggr_outliers",
    "has_no_row_anomalies",
]

#: Spark rejects DISTINCT aggregates over windows (reference check_funcs.py:78-81)
WINDOW_INCOMPATIBLE_AGGREGATES = {"count_distinct"}

#: reference CURATED_AGGR_FUNCTIONS (check_funcs.py:52-73)
CURATED_AGGR_FUNCTIONS = {
    "count", "sum", "avg", "min", "max", "count_distinct", "approx_count_distinct",
    "count_if", "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
    "var_samp", "median", "mode", "skewness", "kurtosis", "percentile",
    "approx_percentile",
}

_FORBIDDEN_SQL = re.compile(
    r"\b(insert|update|delete|drop|create|alter|truncate|merge|grant|revoke|vacuum|refresh)\b",
    re.IGNORECASE,
)


def _check_sql_safety(text: str) -> None:
    """Reject DDL/DML in user SQL (reference utils.py:309-362)."""
    if _FORBIDDEN_SQL.search(text):
        raise UnsafeSqlQueryError(f"forbidden SQL keyword in: {text!r}")


def _lift(message_col_name: str, alias: str) -> Column:
    """condition = hidden message column, via the standard convention."""
    col = F.col(message_col_name)
    return make_condition(col.isNotNull(), col, alias)


def _resolve_ref(
    ref_df_name: str | None,
    ref_table: str | None,
    spark: SparkSession,
    ref_dfs: dict[str, DataFrame] | None,
) -> DataFrame:
    if (ref_df_name is None) == (ref_table is None):
        raise ValueError("provide exactly one of ref_df_name / ref_table")
    if ref_df_name is not None:
        if not ref_dfs or ref_df_name not in ref_dfs:
            raise ValueError(f"reference DataFrame {ref_df_name!r} not provided in ref_dfs")
        return ref_dfs[ref_df_name]
    return spark.read.table(ref_table)


# ---------------------------------------------------------------------------
# uniqueness
# ---------------------------------------------------------------------------
@register_rule("dataset")
def is_unique(
    columns: list[str | Column],
    nulls_distinct: bool = True,
    row_filter: str | None = None,
    strategy: str = "window",
):
    """Duplicate detection on a (composite) key (reference check_funcs.py:1822-1915).

    ``strategy='window'`` (default, reference parity): a window keyed on the
    composite struct — every row must learn its key's multiplicity, so the
    full row stream shuffles exactly once on the key.  Skew-sensitive: a
    single hot key becomes a single hot task.

    ``strategy='join'`` (the 100 TB path): aggregate key counts (map-side
    combine collapses even a pathologically hot key to one row per input
    partition), keep ONLY keys with count > 1 — normally a tiny set — and
    **broadcast** them back as a join.  The full row stream never shuffles,
    and skew cannot concentrate on one task.  Prefer this when duplicates
    are rare and the input is huge; prefer the window when a large fraction
    of keys duplicate (the dup set would blow the broadcast).

    ``nulls_distinct=True`` (ANSI) makes rows with any NULL key component
    pass.  In streaming, uniqueness is per-micro-batch (reference
    check_funcs.py:1835); the join strategy is also the streaming-safe one
    (no window over an unbounded stream).
    """
    if strategy not in ("window", "join"):
        raise ValueError(f"strategy must be 'window' or 'join', got {strategy!r}")
    names = [normalize_col_str(c) for c in columns]
    alias = f"struct_{'_'.join(names)}_is_not_unique" if len(names) > 1 else f"{names[0]}_is_not_unique"
    cnt_col = f"__dq_unique_cnt_{unique_suffix()}"
    msg_col = f"__dq_unique_msg_{unique_suffix()}"

    def _null_key(cols: list[Column]) -> Column | None:
        has_null = None
        for c in cols:
            term = c.isNull()
            has_null = term if has_null is None else (has_null | term)
        return has_null

    def apply_window(df: DataFrame) -> DataFrame:
        cols = [to_col(c) for c in columns]
        key = F.struct(*cols)
        w = Window.partitionBy(key)
        counted = F.sum(filtered(F.lit(1), row_filter).cast("int")).over(w)
        if nulls_distinct:
            counted = F.when(~_null_key(cols), counted)
        return df.withColumn(cnt_col, counted)

    def apply_join(df: DataFrame) -> DataFrame:
        cols = [to_col(c) for c in columns]
        src = df.where(~_null_key(cols)) if nulls_distinct else df
        dups = (
            src.select(F.struct(*cols).alias("__dq_key"), filtered(F.lit(1), row_filter).cast("int").alias("__dq_one"))
            .groupBy("__dq_key")
            .agg(F.sum("__dq_one").alias(cnt_col))
            .where(F.col(cnt_col) > 1)
        )
        return df.join(
            F.broadcast(dups), F.struct(*[to_col(c) for c in columns]).eqNullSafe(F.col("__dq_key")), "left"
        ).drop("__dq_key")

    def apply(df: DataFrame) -> DataFrame:
        out = apply_window(df) if strategy == "window" else apply_join(df)
        message = F.when(
            F.col(cnt_col) > 1,
            F.format_string(
                f"Value '%s' in column struct({', '.join(names)}) is not unique",
                str_value(F.struct(*[to_col(c) for c in columns]).cast("string")),
            ),
        )
        return out.withColumn(msg_col, message)

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# foreign key
# ---------------------------------------------------------------------------
@register_rule("dataset")
def foreign_key(
    columns: list[str | Column],
    ref_columns: list[str],
    ref_df_name: str | None = None,
    ref_table: str | None = None,
    negate: bool = False,
    row_filter: str | None = None,
    null_safe: bool = False,
):
    """FK must (not) exist in the reference (reference check_funcs.py:1919-2044).

    Plan shape: ``ref.select(keys).distinct()`` (dedupe BEFORE the join —
    reference :2005) then a left join with a marker column; violation = marker
    null.  The deduped key side is usually small → AQE broadcast; for a
    same-size ref this degrades to a sort-merge join, which is the correct
    strategy at scale.
    """
    if len(columns) != len(ref_columns):
        raise ValueError("columns and ref_columns must have the same length")
    names = [normalize_col_str(c) for c in columns]
    alias = f"{'_'.join(names)}_{'exists_in' if negate else 'not_exists_in'}_ref"
    sfx = unique_suffix()
    marker = f"__dq_fk_marker_{sfx}"
    msg_col = f"__dq_fk_msg_{sfx}"

    def apply(df: DataFrame, spark: SparkSession, ref_dfs: dict[str, DataFrame] | None = None) -> DataFrame:
        ref = _resolve_ref(ref_df_name, ref_table, spark, ref_dfs)
        tmp_keys = [f"__dq_fk_ref_{i}_{sfx}" for i in range(len(ref_columns))]
        ref_keys = (
            ref.select(*[to_col(rc).alias(tk) for rc, tk in zip(ref_columns, tmp_keys)])
            .distinct()
            .withColumn(marker, F.lit(True))
        )
        cond = None
        for c, tk in zip(columns, tmp_keys):
            left = to_col(c)
            term = left.eqNullSafe(ref_keys[tk]) if null_safe else (left == ref_keys[tk])
            cond = term if cond is None else (cond & term)
        joined = df.join(ref_keys, on=cond, how="left").drop(*tmp_keys)

        exists = F.col(marker).isNotNull()
        key_cols = [to_col(c) for c in columns]
        any_null = None
        for c in key_cols:
            term = c.isNull()
            any_null = term if any_null is None else (any_null | term)
        if negate:
            violation = exists
        else:
            violation = ~exists if null_safe else (~any_null & ~exists)
        if row_filter:
            violation = F.expr(row_filter) & violation
        verb = "found in" if negate else "not found in"
        message = F.when(
            violation,
            F.format_string(
                f"Value '%s' in column struct({', '.join(names)}) {verb} reference",
                str_value(F.struct(*key_cols).cast("string")),
            ),
        )
        return joined.withColumn(msg_col, message).drop(marker)

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# arbitrary SQL
# ---------------------------------------------------------------------------
@register_rule("dataset")
def sql_query(
    query: str,
    merge_columns: list[str] | None = None,
    msg: str | None = None,
    name: str | None = None,
    negate: bool = False,
    condition_column: str = "condition",
    input_placeholder: str = "input_view",
    row_filter: str | None = None,
):
    """Arbitrary SQL over the input (registered as a unique temp view) and
    reference views (reference check_funcs.py:2048-2175).

    ``{{ input_view }}`` in the query resolves to the input view (the
    reference's default placeholder, check_funcs.py:2055 — caught by
    running its own YAML corpus); the legacy ``{{ input }}`` alias keeps
    working unless a ref DataFrame claims that name.  ``{{ name }}``
    resolves to each ref DataFrame.  With ``merge_columns``: row-level — the query's
    ``condition_column`` is deduped per merge key (groupBy+max) and joined
    back null-safely.  Without: dataset-level — a single verdict broadcast to
    all rows via crossJoin of the 1-row aggregate.
    """
    _check_sql_safety(query)
    sfx = unique_suffix()
    alias = name or f"sql_query_{sfx}"
    msg_col = f"__dq_sql_msg_{sfx}"

    def apply(
        df: DataFrame, spark: SparkSession, ref_dfs: dict[str, DataFrame] | None = None,
        source_df: DataFrame | None = None,
    ) -> DataFrame:
        base = source_df if source_df is not None else df
        # view names are minted PER APPLICATION (not per factory call): the
        # engine memoizes (condition, closure) per rule instance (r8), so a
        # factory-scoped name would be shared by every apply of this rule —
        # two concurrent apply_checks over different tables would then race
        # on createOrReplaceTempView and could validate the wrong table
        view_sfx = unique_suffix()
        view = f"__dq_input_{view_sfx}"
        created_views = [view]
        base.createOrReplaceTempView(view)
        text = query
        # the legacy '{{ input }}' / '{{ input_view }}' aliases are only
        # honored when the caller kept the DEFAULT placeholder — a custom
        # input_placeholder signals those tokens may mean something else in
        # the query and must not be silently rewritten to the temp view
        aliases = [input_placeholder, "input"] if input_placeholder == "input_view" else [input_placeholder]
        try:
            for ph in dict.fromkeys(aliases):
                if ph in (ref_dfs or {}):
                    continue
                text = text.replace("{{ " + ph + " }}", view).replace("{{" + ph + "}}", view)
            for ref_name, ref_df in (ref_dfs or {}).items():
                ref_view = f"__dq_ref_{ref_name}_{view_sfx}"
                created_views.append(ref_view)
                ref_df.createOrReplaceTempView(ref_view)
                text = text.replace("{{ " + ref_name + " }}", ref_view).replace("{{" + ref_name + "}}", ref_view)
            result = spark.sql(text)
        finally:
            # spark.sql analysis is eager — the resolved plan holds the view
            # definitions by value, so the catalog entries can go immediately.
            # Without this, repeated applies (streaming foreachBatch, bench
            # min-of-N loops) grow the session catalog unboundedly, each view
            # pinning a DataFrame plan on the driver.
            for v in created_views:
                spark.catalog.dropTempView(v)

        failure_message = msg or f"Query condition violated: {alias}"
        if merge_columns:
            # dedupe to one verdict per merge key (reference :2157-2159)
            verdict = result.groupBy(*[F.col(c) for c in merge_columns]).agg(
                F.max(F.col(condition_column).cast("boolean")).alias(condition_column)
            )
            tmp = {c: f"__dq_sqlq_{c}_{sfx}" for c in merge_columns}
            verdict = verdict.select(
                *[F.col(c).alias(tmp[c]) for c in merge_columns], F.col(condition_column).alias(f"__dq_sqlq_cond_{sfx}")
            )
            cond = None
            for c in merge_columns:
                term = df[c].eqNullSafe(verdict[tmp[c]])
                cond = term if cond is None else (cond & term)
            joined = df.join(verdict, on=cond, how="left").drop(*tmp.values())
            fired = F.coalesce(F.col(f"__dq_sqlq_cond_{sfx}"), F.lit(False))
            fired = ~fired if negate else fired
            if row_filter:
                fired = F.expr(row_filter) & fired
            return joined.withColumn(msg_col, F.when(fired, F.lit(failure_message))).drop(f"__dq_sqlq_cond_{sfx}")

        # dataset-level: same verdict for every row (reference :4799-4851)
        verdict = result.select(F.max(F.col(condition_column).cast("boolean")).alias(f"__dq_sqlq_cond_{sfx}")).limit(1)
        joined = df.crossJoin(F.broadcast(verdict))
        fired = F.coalesce(F.col(f"__dq_sqlq_cond_{sfx}"), F.lit(False))
        fired = ~fired if negate else fired
        return joined.withColumn(msg_col, F.when(fired, F.lit(failure_message))).drop(f"__dq_sqlq_cond_{sfx}")

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# aggregate-comparison family
# ---------------------------------------------------------------------------
def _agg_expr(column, aggr_type: str, row_filter: str | None, aggr_params: dict | None = None) -> Column:
    """aggr_type resolves to the same-named pyspark.sql.functions member
    (reference _build_aggregate_expression, check_funcs.py:4061-4113).
    The rule filter is pushed INTO the aggregate input — all rows survive for
    annotation (reference :4324-4333)."""
    params = aggr_params or {}
    if column == "*":
        inp = filtered(F.lit(1), row_filter)
        if aggr_type != "count":
            raise ValueError("column '*' only supported with aggr_type='count'")
        return F.count(inp)
    inp = filtered(to_col(column), row_filter)
    if aggr_type == "count_distinct":
        return F.countDistinct(inp)
    if aggr_type in ("percentile", "approx_percentile"):
        pct = params.get("percentage", 0.5)
        fn = F.percentile if aggr_type == "percentile" else F.percentile_approx
        return fn(inp, F.lit(pct))
    if not hasattr(F, aggr_type):
        raise ValueError(f"unknown aggregate function: {aggr_type!r}")
    return getattr(F, aggr_type)(inp)


class _AggFusionSpec:
    """Fusion contract (r12 optimization) for dataset checks whose stats
    pass is a plain aggregate over the ORIGINAL input.  The engine batches
    compatible specs from one ``apply_checks`` call and computes every
    member's aggregate expressions in ONE stats subplan — one input scan +
    one broadcast join-back — instead of one per rule, so N global-aggregate
    rules cost 1 full input scan at 100 TB rather than N.  Results are
    bit-identical to the unfused path: each member's aggregate expression
    and verdict projection are exactly the ones its single-rule ``apply``
    builds; only the number of Aggregate subtrees in the plan changes.

    ``stats_exprs()`` returns the member's aliased aggregate Columns (fresh
    objects per call); ``finish(out, spark, ref_dfs)`` appends the member's
    hidden message column from those aliases and drops them.  ``group_by``
    is ``None`` for global aggregates; grouped members fuse only when their
    normalized group key AND broadcast_stats flag match.  ``distinct_agg``
    members (count_distinct) batch separately from plain aggregates: a
    DISTINCT aggregate rewrites the fused Aggregate through an Expand,
    which changes the accumulation ORDER of any float sum/avg sharing the
    node (measured: last-ulp drift in avg) — distinct metrics themselves
    are exact integers, so distinct-only batches stay value-identical."""

    __slots__ = ("group_by", "broadcast_stats", "stats_exprs", "finish", "distinct_agg")

    def __init__(self, group_by, broadcast_stats, stats_exprs, finish, distinct_agg=False):
        self.group_by = group_by
        self.broadcast_stats = broadcast_stats
        self.stats_exprs = stats_exprs
        self.finish = finish
        self.distinct_agg = distinct_agg

    def key(self) -> tuple:
        if not self.group_by:
            return ("global", bool(self.distinct_agg))
        # r13 (ADVICE r12): the grouped key must be COLLISION-SAFE.
        # normalize_col_str collapses non-alphanumerics, so two rules with
        # DIFFERENT group expressions ('a + b' vs 'a - b', 'a.b' vs 'a_b' —
        # to_col parses strings as full SQL) could normalize identically,
        # silently fuse, and the second rule's stats would group and join
        # back on the FIRST rule's key.  Key on the RAW string instead
        # (equal raw strings parse to equal expressions, so fusing them is
        # exact); Column-object group keys get a per-spec unique key — a
        # singleton batch never fuses, keeping the unfused single-rule plan.
        ids: list[str] = []
        for g in self.group_by:
            if not isinstance(g, str):
                return ("grouped_nofuse", id(self))
            ids.append(g)
        return (
            "grouped",
            tuple(ids),
            bool(self.broadcast_stats),
            bool(self.distinct_agg),
        )


def apply_fused_agg_rules(
    df: DataFrame,
    source_df: DataFrame | None,
    specs: list[_AggFusionSpec],
    spark: SparkSession | None = None,
    ref_dfs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Engine hook: one stats subplan for every spec in the batch.

    Global batch: ``base.select(all agg exprs).limit(1)`` + one broadcast
    crossJoin (the exact single-rule shape, widened to N metric columns).
    Grouped batch: one ``groupBy(keys).agg(all exprs)`` + one null-safe
    join-back.  Each member's ``finish`` then builds its verdict from its
    own metric aliases, so fused output values equal the unfused ones."""
    base = source_df if source_df is not None else df
    exprs = [e for spec in specs for e in spec.stats_exprs()]
    first = specs[0]
    if not first.group_by:
        stats = base.select(*exprs).limit(1)
        out = df.crossJoin(F.broadcast(stats))
    else:
        gcols = [to_col(g) for g in first.group_by]
        sfx = unique_suffix()
        tmp = [f"__dq_aggr_g{i}_{sfx}" for i in range(len(gcols))]
        stats = base.groupBy(*[g.alias(t) for g, t in zip(gcols, tmp)]).agg(*exprs)
        cond = None
        for g, t in zip(gcols, tmp):
            term = g.eqNullSafe(stats[t])
            cond = term if cond is None else (cond & term)
        stats_side = F.broadcast(stats) if first.broadcast_stats else stats
        out = df.join(stats_side, on=cond, how="left").drop(*tmp)
    for spec in specs:
        out = spec.finish(out, spark, ref_dfs)
    return out


def _is_aggr_compare(
    column,
    limit,
    aggr_type: str,
    compare: str,
    group_by: list[str | Column] | None,
    row_filter: str | None,
    abs_tolerance: float | None = None,
    rel_tolerance: float | None = None,
    aggr_params: dict | None = None,
    broadcast_stats: bool = True,
):
    """Shared core (reference check_funcs.py:4234-4403).

    Strategies:
    * global → 1-row aggregate + broadcast crossJoin (explicitly avoids a
      single-partition window — reference :4361-4373);
    * grouped → groupBy + null-safe join-back.  Deviation from the
      reference's window strategy: partial (map-side) aggregation shrinks the
      shuffle to one row per group, and AQE broadcasts the joined-back side
      when small — strictly less data movement at 100 TB than windowing the
      full row stream.
    """
    name = normalize_col_str(column)
    if compare not in ("gt", "lt", "eq", "ne"):
        raise ValueError(f"compare must be one of gt/lt/eq/ne, got {compare!r}")
    alias = f"{name}_{aggr_type}_{compare}_limit"
    sfx = unique_suffix()
    metric_col = f"__dq_aggr_metric_{sfx}"
    msg_col = f"__dq_aggr_msg_{sfx}"

    def _stats_exprs() -> list[Column]:
        return [_agg_expr(column, aggr_type, row_filter, aggr_params).alias(metric_col)]

    def _finish(out: DataFrame, spark=None, ref_dfs=None) -> DataFrame:
        metric = F.col(metric_col)
        limit_expr = get_limit_expr(limit)
        if compare == "gt":
            violated = metric > limit_expr
            desc = "greater than"
        elif compare == "lt":
            violated = metric < limit_expr
            desc = "less than"
        elif compare == "eq":
            violated = ~within_tolerance(metric, limit_expr, abs_tolerance, rel_tolerance)
            desc = "not equal to"
        else:  # ne
            violated = within_tolerance(metric, limit_expr, abs_tolerance, rel_tolerance)
            desc = "equal to"
        message = F.when(
            F.coalesce(violated, F.lit(False)),
            F.format_string(
                f"{aggr_type}({name}) value '%s' is {desc} limit '%s'",
                str_value(metric),
                str_value(limit_expr),
            ),
        )
        return out.withColumn(msg_col, message).drop(metric_col)

    def apply(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
        base = source_df if source_df is not None else df
        if group_by:
            group_cols = [to_col(g) for g in group_by]
            tmp = [f"__dq_aggr_g{i}_{sfx}" for i in range(len(group_cols))]
            stats = base.groupBy(*[g.alias(t) for g, t in zip(group_cols, tmp)]).agg(*_stats_exprs())
            cond = None
            for g, t in zip(group_cols, tmp):
                term = g.eqNullSafe(stats[t])
                cond = term if cond is None else (cond & term)
            # the aggregated side is one row per group — broadcast it
            # explicitly: AQE converts SMJ->BHJ only after shuffling the big
            # side (measured 2x slower at 20M rows).  Callers with extreme
            # group cardinality pass broadcast_stats=False.
            stats_side = F.broadcast(stats) if broadcast_stats else stats
            out = df.join(stats_side, on=cond, how="left").drop(*tmp)
        else:
            stats = base.select(*_stats_exprs()).limit(1)
            out = df.crossJoin(F.broadcast(stats))
        return _finish(out)

    apply._dq_fusion = _AggFusionSpec(
        list(group_by) if group_by else None, broadcast_stats, _stats_exprs, _finish,
        distinct_agg=(aggr_type == "count_distinct"),
    )
    return _lift(msg_col, alias), apply


@register_rule("dataset")
def is_aggr_not_greater_than(
    column,
    limit,
    aggr_type: str = "count",
    group_by: list | None = None,
    row_filter: str | None = None,
    aggr_params: dict | None = None,
    broadcast_stats: bool = True,
):
    """Aggregate must be <= limit (reference check_funcs.py:2179)."""
    return _is_aggr_compare(column, limit, aggr_type, "gt", group_by, row_filter,
                            aggr_params=aggr_params, broadcast_stats=broadcast_stats)


@register_rule("dataset")
def is_aggr_not_less_than(
    column,
    limit,
    aggr_type: str = "count",
    group_by: list | None = None,
    row_filter: str | None = None,
    aggr_params: dict | None = None,
    broadcast_stats: bool = True,
):
    """Aggregate must be >= limit (reference check_funcs.py:2227)."""
    return _is_aggr_compare(column, limit, aggr_type, "lt", group_by, row_filter,
                            aggr_params=aggr_params, broadcast_stats=broadcast_stats)


@register_rule("dataset")
def is_aggr_equal(
    column,
    limit,
    aggr_type: str = "count",
    group_by: list | None = None,
    row_filter: str | None = None,
    aggr_params: dict | None = None,
    abs_tolerance: float | None = None,
    rel_tolerance: float | None = None,
    broadcast_stats: bool = True,
):
    """Aggregate must equal limit within tolerance (reference check_funcs.py:2275)."""
    return _is_aggr_compare(
        column, limit, aggr_type, "eq", group_by, row_filter, abs_tolerance, rel_tolerance, aggr_params,
        broadcast_stats=broadcast_stats,
    )


@register_rule("dataset")
def is_aggr_not_equal(
    column,
    limit,
    aggr_type: str = "count",
    group_by: list | None = None,
    row_filter: str | None = None,
    aggr_params: dict | None = None,
    abs_tolerance: float | None = None,
    rel_tolerance: float | None = None,
    broadcast_stats: bool = True,
):
    """Aggregate must NOT equal limit (reference check_funcs.py:2321)."""
    return _is_aggr_compare(
        column, limit, aggr_type, "ne", group_by, row_filter, abs_tolerance, rel_tolerance, aggr_params,
        broadcast_stats=broadcast_stats,
    )


@register_rule("dataset")
def aggr_matches_dataset(
    column,
    ref_table: str | None = None,
    ref_df_name: str | None = None,
    ref_column=None,
    aggr_type: str = "count",
    aggr_params: dict | None = None,
    group_by: list | None = None,
    ref_group_by: list | None = None,
    row_filter: str | None = None,
    ref_row_filter: str | None = None,
    abs_tolerance: float | None = None,
    rel_tolerance: float | None = None,
):
    """Aggregate on the checked df must equal the same aggregate on an
    upstream reference, scalar or per-group (reference check_funcs.py:2610-2781).

    ``ref_row_filter`` filters the REFERENCE side before aggregation (e.g.
    align both sides on the same date partition); ``aggr_params`` passes
    parameters to aggregates that need them (percentile etc.)."""
    if (group_by is None) != (ref_group_by is None):
        raise ValueError("group_by and ref_group_by must be provided together")
    if group_by and len(group_by) != len(ref_group_by):
        raise ValueError("group_by and ref_group_by must have the same length")
    name = normalize_col_str(column)
    alias = f"{name}_{aggr_type}_matches_dataset"
    sfx = unique_suffix()
    metric_col = f"__dq_amd_metric_{sfx}"
    ref_metric_col = f"__dq_amd_ref_metric_{sfx}"
    msg_col = f"__dq_amd_msg_{sfx}"

    def apply(
        df: DataFrame, spark: SparkSession, ref_dfs: dict[str, DataFrame] | None = None,
        source_df: DataFrame | None = None,
    ) -> DataFrame:
        base = source_df if source_df is not None else df
        ref = _resolve_ref(ref_df_name, ref_table, spark, ref_dfs)
        rc = ref_column if ref_column is not None else column
        agg = _agg_expr(column, aggr_type, row_filter, aggr_params).alias(metric_col)
        ref_agg = _agg_expr(rc, aggr_type, ref_row_filter, aggr_params).alias(ref_metric_col)

        if group_by:
            gcols = [to_col(g) for g in group_by]
            tmp = [f"__dq_amd_g{i}_{sfx}" for i in range(len(gcols))]
            cur = base.groupBy(*[g.alias(t) for g, t in zip(gcols, tmp)]).agg(agg)
            rtmp = [f"__dq_amd_rg{i}_{sfx}" for i in range(len(gcols))]
            refstats = ref.groupBy(
                *[to_col(g).alias(t) for g, t in zip(ref_group_by, rtmp)]
            ).agg(ref_agg)
            # left join: groups missing on the REFERENCE side get a null
            # ref metric -> mismatch.  Groups present only in the reference
            # are intentionally NOT surfaced — dataset checks only annotate
            # rows that exist in the checked DataFrame, and a ref-only
            # group has no input row to attach a flag to (reference
            # check_funcs.py:2646-2649 documents the same semantics; a
            # full_outer here would compute those rows only to drop them in
            # the annotate join)
            jc = None
            for lt, rt in zip(tmp, rtmp):
                term = cur[lt].eqNullSafe(refstats[rt])
                jc = term if jc is None else (jc & term)
            stats = cur.join(refstats, on=jc, how="left").select(
                *tmp, F.col(metric_col), F.col(ref_metric_col)
            )
            cond = None
            for g, t in zip(gcols, tmp):
                term = g.eqNullSafe(stats[t])
                cond = term if cond is None else (cond & term)
            out = df.join(F.broadcast(stats), on=cond, how="left").drop(*tmp)
        else:
            cur = base.select(agg).limit(1)
            refstats = ref.select(ref_agg).limit(1)
            out = df.crossJoin(F.broadcast(cur)).crossJoin(F.broadcast(refstats))

        matches = within_tolerance(F.col(metric_col), F.col(ref_metric_col), abs_tolerance, rel_tolerance)
        message = F.when(
            ~F.coalesce(matches, F.lit(False)),
            F.format_string(
                f"{aggr_type}({name}) value '%s' does not match reference value '%s'",
                str_value(F.col(metric_col)),
                str_value(F.col(ref_metric_col)),
            ),
        )
        return out.withColumn(msg_col, message).drop(metric_col, ref_metric_col)

    if not group_by:
        # r12 fusion: the checked-side aggregate joins the engine's fused
        # global stats pass; the (small) reference-side aggregate stays a
        # per-rule 1-row broadcast crossJoin inside finish.
        def _stats_exprs() -> list[Column]:
            return [_agg_expr(column, aggr_type, row_filter, aggr_params).alias(metric_col)]

        def _fused_finish(out: DataFrame, spark=None, ref_dfs=None) -> DataFrame:
            ref = _resolve_ref(ref_df_name, ref_table, spark, ref_dfs)
            rc = ref_column if ref_column is not None else column
            ref_agg = _agg_expr(rc, aggr_type, ref_row_filter, aggr_params).alias(ref_metric_col)
            refstats = ref.select(ref_agg).limit(1)
            out = out.crossJoin(F.broadcast(refstats))
            matches = within_tolerance(
                F.col(metric_col), F.col(ref_metric_col), abs_tolerance, rel_tolerance
            )
            message = F.when(
                ~F.coalesce(matches, F.lit(False)),
                F.format_string(
                    f"{aggr_type}({name}) value '%s' does not match reference value '%s'",
                    str_value(F.col(metric_col)),
                    str_value(F.col(ref_metric_col)),
                ),
            )
            return out.withColumn(msg_col, message).drop(metric_col, ref_metric_col)

        apply._dq_fusion = _AggFusionSpec(
            None, True, _stats_exprs, _fused_finish,
            distinct_agg=(aggr_type == "count_distinct"),
        )
    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# dataset diff
# ---------------------------------------------------------------------------
@register_rule("dataset")
def compare_datasets(
    columns: list[str],
    ref_columns: list[str],
    ref_df_name: str | None = None,
    ref_table: str | None = None,
    check_missing_records: bool = False,
    exclude_columns: list[str] | None = None,
    null_safe_row_matching: bool = True,
    null_safe_column_value_matching: bool = True,
    row_filter: str | None = None,
    abs_tolerance: float | None = None,
    rel_tolerance: float | None = None,
    dedup_ref: bool = False,
):
    """Full row/column diff keyed on PK (reference check_funcs.py:2785-2944).

    Join on the PK (eqNullSafe by default); per-column diffs over the common
    non-PK columns (map-typed columns skipped — eqNullSafe can't compare
    maps); verdict = JSON {row_missing,row_extra,changed:{col:{df,ref}}}.
    With ``check_missing_records`` the join is full-outer, so ref-only rows
    ARE ADDED to the output (all input columns null) — the one check that may
    change row count.

    A reference side with DUPLICATE match keys also multiplies joined rows
    (each df row matches every ref copy — inherent to the reference's join
    shape too).  ``dedup_ref=True`` (beyond-reference convenience) keeps an
    arbitrary single ref row per key first, restoring the one-annotated-row-
    per-input-row invariant when the ref key is not known to be unique.

    ``row_filter`` (auto-injected from the rule filter) gates the CONDITION
    only, exactly like the reference (:2908 stamps a filter column; matching
    still runs over all rows).  When driven through the engine this is
    equivalent to the generic rule-filter gating — accepting it here keeps
    direct function calls reference-faithful too.
    """
    if len(columns) != len(ref_columns):
        raise ValueError("columns and ref_columns must have the same length")
    alias = f"datasets_diff_{'_'.join(normalize_col_str(c) for c in columns)}"
    sfx = unique_suffix()
    msg_col = f"__dq_cmp_msg_{sfx}"
    excl = set(exclude_columns or [])

    def apply(df: DataFrame, spark: SparkSession, ref_dfs: dict[str, DataFrame] | None = None) -> DataFrame:
        ref = _resolve_ref(ref_df_name, ref_table, spark, ref_dfs)
        if dedup_ref:
            ref = ref.dropDuplicates(list(ref_columns))
        ref_renamed = ref.select(
            *[F.col(c).alias(f"__dq_ref_{c}_{sfx}") for c in ref.columns]
        ).withColumn(f"__dq_ref_marker_{sfx}", F.lit(True))

        def refc(c: str) -> Column:
            return F.col(f"__dq_ref_{c}_{sfx}")

        how = "full_outer" if check_missing_records else "left_outer"
        src = df.withColumn(f"__dq_src_marker_{sfx}", F.lit(True))
        if null_safe_row_matching and not check_missing_records:
            # r13 (VERDICT r12 #2, guide §2.4 "remove shuffles outright"):
            # a null-safe equi-join plans its distribution on
            # coalesce/isnull-DERIVED keys, so a ref side that is already
            # partitioned on the raw PK (a dropDuplicates/aggregate upstream
            # — the common "dedup the ref first" shape) pays a SECOND
            # corpus-sized exchange right before the join.  `a <=> b` only
            # differs from `a = b` when a or b is null, and a null-safe key
            # tuple can only match across the SAME null pattern — so split
            # the REF by key-null-ness:
            #   * rows with all keys non-null join on RAW `=` keys — the
            #     planner reuses the ref side's existing partitioning and
            #     sort (alias-aware), deleting the derived-key re-exchange;
            #   * rows with any null key (normally NONE — the IsNull
            #     predicate pushes to the scan's row-group null counts, so
            #     this branch is metadata-only on null-free data) come back
            #     through one small broadcast join gated on the df side's
            #     any-null keys, then the two match results merge by
            #     coalesce (a row can match in at most one branch).
            # full_outer (check_missing_records) keeps the single null-safe
            # join: its ref-only rows would need a third anti-join leg, and
            # it is the rare reporting mode, not the per-batch hot path.
            anynull_l = None
            anynull_r = None
            for lc, rc in zip(columns, ref_columns):
                tl, tr = df[lc].isNull(), refc(rc).isNull()
                anynull_l = tl if anynull_l is None else (anynull_l | tl)
                anynull_r = tr if anynull_r is None else (anynull_r | tr)
            ref_a = ref_renamed.where(~anynull_r)
            jc = None
            for lc, rc in zip(columns, ref_columns):
                term = df[lc] == refc(rc)
                jc = term if jc is None else (jc & term)
            joined = src.join(ref_a, on=jc, how="left")
            refb = {c: f"__dq_refb_{c}_{sfx}" for c in ref.columns}
            refb_marker = f"__dq_refb_marker_{sfx}"
            ref_b = ref_renamed.where(anynull_r).select(
                *[F.col(f"__dq_ref_{c}_{sfx}").alias(refb[c]) for c in ref.columns],
                F.col(f"__dq_ref_marker_{sfx}").alias(refb_marker),
            )
            jcb = anynull_l
            for lc, rc in zip(columns, ref_columns):
                jcb = jcb & df[lc].eqNullSafe(ref_b[refb[rc]])
            joined = joined.join(F.broadcast(ref_b), on=jcb, how="left")
            keep = [c for c in joined.columns if c not in set(refb.values()) | {refb_marker}]
            merged = {
                f"__dq_ref_{c}_{sfx}": F.coalesce(
                    F.col(f"__dq_ref_{c}_{sfx}"), F.col(refb[c])
                ).alias(f"__dq_ref_{c}_{sfx}")
                for c in ref.columns
            }
            merged[f"__dq_ref_marker_{sfx}"] = F.coalesce(
                F.col(f"__dq_ref_marker_{sfx}"), F.col(refb_marker)
            ).alias(f"__dq_ref_marker_{sfx}")
            joined = joined.select(*[merged.get(c, F.col(c)) for c in keep])
        else:
            jc = None
            for lc, rc in zip(columns, ref_columns):
                term = df[lc].eqNullSafe(refc(rc)) if null_safe_row_matching else (df[lc] == refc(rc))
                jc = term if jc is None else (jc & term)
            joined = src.join(ref_renamed, on=jc, how=how)

        row_extra = F.col(f"__dq_ref_marker_{sfx}").isNull()   # in df, not in ref
        row_missing = F.col(f"__dq_src_marker_{sfx}").isNull() # in ref, not in df

        pk = set(columns)
        ref_pk_by_name = {rc for rc in ref_columns}
        df_types = dict(df.dtypes)
        value_cols = [
            c
            for c in df.columns
            if c in set(ref.columns)
            and c not in pk
            and c not in ref_pk_by_name
            and c not in excl
            and not df_types[c].startswith("map<")
        ]
        numeric_types = ("tinyint", "smallint", "int", "bigint", "float", "double")
        changed_entries = []
        for c in value_cols:
            a, b = df[c], refc(c)
            if (abs_tolerance is not None or rel_tolerance is not None) and (
                df_types[c] in numeric_types or df_types[c].startswith("decimal")
            ):
                same = within_tolerance(a.cast("double"), b.cast("double"), abs_tolerance, rel_tolerance)
            elif null_safe_column_value_matching:
                same = a.eqNullSafe(b)
            else:
                same = F.coalesce(a == b, F.lit(False))
            entry = F.when(
                ~same,
                F.struct(
                    F.lit(c).alias("column"),
                    a.cast("string").alias("df_value"),
                    b.cast("string").alias("ref_value"),
                ),
            )
            changed_entries.append(entry)
        changed = (
            F.array_compact(F.array(*changed_entries)) if changed_entries else F.array().cast(
                "array<struct<column:string,df_value:string,ref_value:string>>"
            )
        )
        diff = F.struct(
            row_missing.alias("row_missing"),
            row_extra.alias("row_extra"),
            F.map_from_arrays(
                F.transform(changed, lambda x: x.getField("column")),
                F.transform(
                    changed,
                    lambda x: F.struct(x.getField("df_value").alias("df"), x.getField("ref_value").alias("ref")),
                ),
            ).alias("changed"),
        )
        fired = row_missing | row_extra | (F.size(changed) > 0)
        if row_filter:
            # NULL (ref-only synthetic rows where the filter can't evaluate)
            # keeps the condition — only an explicit False suppresses it,
            # mirroring the reference's filter_col treatment
            fired = fired & F.coalesce(F.expr(row_filter), F.lit(True))
        message = F.when(fired, F.to_json(diff))
        out = joined.withColumn(msg_col, message)
        if check_missing_records:
            # synthetic ref-only rows carry the REFERENCE key in the PK
            # columns (reference :2924-2927 coalesces them): the caller can
            # see WHICH key is missing, and PK-based rule filters evaluate
            # on the real key instead of NULL
            for lc, rc in zip(columns, ref_columns):
                out = out.withColumn(lc, F.coalesce(F.col(lc), refc(rc)))
        drop_cols = [f"__dq_ref_{c}_{sfx}" for c in ref.columns] + [
            f"__dq_ref_marker_{sfx}",
            f"__dq_src_marker_{sfx}",
        ]
        return out.drop(*drop_cols)

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# time-window checks
# ---------------------------------------------------------------------------
@register_rule("dataset")
def is_data_fresh_per_time_window(
    column: str | Column,
    window_minutes: int,
    min_records_per_window: int,
    lookback_windows: int | None = None,
    row_filter: str | None = None,
    curr_timestamp: Column | str | datetime.datetime | None = None,
):
    """Every fixed time window must contain >= N records
    (reference check_funcs.py:2948-3058).

    Plan shape (r13, guide §2.3 "aggregate before you shuffle"): the
    per-bucket count is ONE narrow groupBy over the bucket expression
    (map-side partial aggregation shrinks the shuffle to one row per
    bucket per map task) broadcast-joined back on the bucket — the same
    shape as :func:`has_no_gaps_per_time_window`.  The pre-r13 body
    computed the count with ``Window.partitionBy(bucket)``, which
    exchanges the FULL input row (every column) to cluster it by bucket:
    at 100 TB that is a corpus-sized wide shuffle + sort to carry one
    long per row.  Counts are per-bucket scalars either way — values
    identical."""
    name = normalize_col_str(column)
    alias = f"{name}_is_not_fresh_per_time_window"
    sfx = unique_suffix()
    cnt_col = f"__dq_fresh_cnt_{sfx}"
    msg_col = f"__dq_fresh_msg_{sfx}"
    bucket_col = f"__dq_fresh_bucket_{sfx}"
    rowb_col = f"__dq_fresh_rowb_{sfx}"

    def apply(df: DataFrame) -> DataFrame:
        ts = F.coalesce(to_col(column), F.lit("1900-01-01").cast("timestamp"))
        bucket = F.window(ts, f"{int(window_minutes)} minutes")
        counts = df.groupBy(bucket.alias(bucket_col)).agg(
            F.count(filtered(F.lit(1), row_filter)).alias(cnt_col)
        )
        # F.window is unresolvable inside a join condition — materialize the
        # row-side bucket as a column first, then join on it (same note as
        # has_no_gaps_per_time_window).  ts is coalesced, so the bucket is
        # never null and every row matches exactly one counts row.
        with_bucket = df.withColumn(rowb_col, bucket)
        out = with_bucket.join(
            F.broadcast(counts), on=with_bucket[rowb_col].eqNullSafe(counts[bucket_col]), how="left"
        ).drop(bucket_col)
        fired = F.col(cnt_col) < F.lit(int(min_records_per_window))
        if lookback_windows is not None:
            curr = (
                F.current_timestamp()
                if curr_timestamp is None
                else (F.lit(curr_timestamp).cast("timestamp") if not isinstance(curr_timestamp, Column) else curr_timestamp)
            )
            horizon = curr - F.expr(f"INTERVAL {int(lookback_windows) * int(window_minutes)} MINUTES")
            fired = fired & (F.col(rowb_col).getField("start") >= horizon)
        message = F.when(
            fired,
            F.format_string(
                f"Time window of '{name}' starting at '%s' has %s records, fewer than {int(min_records_per_window)}",
                F.col(rowb_col).getField("start").cast("string"),
                F.col(cnt_col).cast("string"),
            ),
        )
        return out.withColumn(msg_col, message).drop(cnt_col, rowb_col)

    return _lift(msg_col, alias), apply


@register_rule("dataset")
def has_no_gaps_per_time_window(
    column: str | Column,
    window_minutes: int,
    group_by: list | None = None,
    trailing_gap: bool = False,
    curr_timestamp: Column | str | datetime.datetime | None = None,
    row_filter: str | None = None,
):
    """Detect empty buckets between occupied buckets on a fixed grid, per
    group (reference check_funcs.py:3062-3213).  Occupied buckets are
    ``distinct()``-reduced first, so the lead() window runs over the tiny
    bucket set, not the row stream; the verdict joins back null-safely."""
    name = normalize_col_str(column)
    alias = f"{name}_has_gaps_per_time_window"
    sfx = unique_suffix()
    msg_col = f"__dq_gap_msg_{sfx}"
    bucket_col = f"__dq_gap_bucket_{sfx}"
    next_col = f"__dq_gap_next_{sfx}"
    gcols_tmp = None

    def apply(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
        base = source_df if source_df is not None else df
        ts = F.coalesce(to_col(column), F.lit("1900-01-01").cast("timestamp"))
        if row_filter:
            occupied_src = base.where(F.expr(row_filter))
        else:
            occupied_src = base
        bucket = F.window(ts, f"{int(window_minutes)} minutes").getField("start")
        groups = [to_col(g) for g in (group_by or [])]
        tmp = [f"__dq_gap_g{i}_{sfx}" for i in range(len(groups))]
        occupied = occupied_src.select(
            *[g.alias(t) for g, t in zip(groups, tmp)], bucket.alias(bucket_col)
        ).distinct()
        w = Window.partitionBy(*[F.col(t) for t in tmp]).orderBy(F.col(bucket_col))
        occupied = occupied.withColumn(next_col, F.lead(bucket_col).over(w))
        gap_seconds = F.col(next_col).cast("long") - F.col(bucket_col).cast("long")
        has_gap = F.col(next_col).isNotNull() & (gap_seconds > int(window_minutes) * 60)
        if trailing_gap:
            curr = (
                F.current_timestamp()
                if curr_timestamp is None
                else (F.lit(curr_timestamp).cast("timestamp") if not isinstance(curr_timestamp, Column) else curr_timestamp)
            )
            now_bucket = F.window(curr, f"{int(window_minutes)} minutes").getField("start")
            trailing = F.col(next_col).isNull() & (
                (now_bucket.cast("long") - F.col(bucket_col).cast("long")) > int(window_minutes) * 60
            )
            has_gap = has_gap | trailing
        flags = occupied.select(
            *[F.col(t) for t in tmp],
            F.col(bucket_col),
            F.when(
                has_gap,
                F.format_string(
                    f"Gap detected after time window of '{name}' starting at '%s'",
                    F.col(bucket_col).cast("string"),
                ),
            ).alias(msg_col),
        )
        # F.window is unresolvable inside a join condition — materialize the
        # row-side bucket as a column first, then join on it.
        row_bucket = f"__dq_gap_rowb_{sfx}"
        with_bucket = df.withColumn(row_bucket, bucket)
        cond = with_bucket[row_bucket].eqNullSafe(flags[bucket_col])
        for g, t in zip(groups, tmp):
            cond = cond & g.eqNullSafe(flags[t])
        return with_bucket.join(F.broadcast(flags), on=cond, how="left").drop(bucket_col, row_bucket, *tmp)

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# schema check
# ---------------------------------------------------------------------------
@register_rule("dataset", preselect_original_columns=True)
def has_valid_schema(
    expected_schema: str | T.StructType | None = None,
    ref_df_name: str | None = None,
    ref_table: str | None = None,
    columns: list[str] | None = None,
    strict: bool = False,
    exclude_columns: list[str] | None = None,
):
    """Schema compatibility: permissive (expected subset-compatible) or strict
    (exact, incl. order) — driver-side StructType comparison, verdict
    broadcast as a literal (reference check_funcs.py:3218-3334)."""
    if expected_schema is None and ref_df_name is None and ref_table is None:
        raise ValueError("provide expected_schema, ref_df_name, or ref_table")
    alias = "has_invalid_schema"
    sfx = unique_suffix()
    msg_col = f"__dq_schema_msg_{sfx}"
    excl = set(exclude_columns or [])

    def apply(
        df: DataFrame,
        spark: SparkSession,
        ref_dfs: dict[str, DataFrame] | None = None,
        original_columns: list[str] | None = None,
    ) -> DataFrame:
        if expected_schema is not None:
            expected = (
                T._parse_datatype_string(expected_schema)
                if isinstance(expected_schema, str)
                else expected_schema
            )
        else:
            expected = _resolve_ref(ref_df_name, ref_table, spark, ref_dfs).schema
        visible = original_columns if original_columns is not None else df.columns
        actual_fields = [f_ for f_ in df.schema.fields if f_.name in set(visible)]
        if columns:
            actual_fields = [f_ for f_ in actual_fields if f_.name in set(columns)]
        actual_fields = [f_ for f_ in actual_fields if f_.name not in excl]
        expected_fields = [f_ for f_ in expected.fields if f_.name not in excl]
        if columns:
            expected_fields = [f_ for f_ in expected_fields if f_.name in set(columns)]

        problems: list[str] = []
        if strict:
            # exact match incl. order (reference :3532-3576)
            a = [(f_.name, f_.dataType.simpleString()) for f_ in actual_fields]
            e = [(f_.name, f_.dataType.simpleString()) for f_ in expected_fields]
            if a != e:
                problems.append(f"schema mismatch: expected {e}, got {a}")
        else:
            # permissive: expected ⊆ actual with compatible types (reference :3578-3719)
            actual_by_name = {f_.name: f_ for f_ in actual_fields}
            for f_ in expected_fields:
                got = actual_by_name.get(f_.name)
                if got is None:
                    problems.append(f"missing column: {f_.name}")
                elif got.dataType.simpleString() != f_.dataType.simpleString():
                    problems.append(
                        f"type mismatch for {f_.name}: expected {f_.dataType.simpleString()}, got {got.dataType.simpleString()}"
                    )
        verdict = "; ".join(problems) if problems else None
        return df.withColumn(msg_col, F.lit(verdict).cast("string"))

    return _lift(msg_col, alias), apply


# ---------------------------------------------------------------------------
# outliers
# ---------------------------------------------------------------------------
@register_rule("dataset")
def has_no_outliers(
    column: str | Column,
    row_filter: str | None = None,
    k: float = 3.5,
    approx: bool = False,
    approx_estimator: str = "iqr",
    stats_via: str = "plan",
):
    """MAD outlier band: median ± k·MAD (reference check_funcs.py:1743-1818).

    Deviation: the reference computes median & MAD via two driver-side
    actions (profiling_utils.py:54-107); here both stats live INSIDE the lazy
    plan as 1-row aggregates broadcast-crossJoined back — no driver actions,
    fully distributed.  Exact mode costs two SEQUENTIAL aggregates (the MAD
    is the median of deviations from the median — an irreducible two-pass
    statistic).  ``approx=True`` is the 100 TB path, with the estimator
    chosen by ``approx_estimator``:

    - ``'iqr'`` (default): ONE ``percentile_approx`` sketch over
      [p25, p50, p75], MAD estimated as half the IQR — one job instead of
      two.  NOTE this equals the true MAD only for SYMMETRIC distributions;
      on skewed columns the band differs from exact mode.
    - ``'mad'``: two sequential ``percentile_approx`` sketches (approx
      median, then approx median of absolute deviations) — a true MAD
      estimate at sketch precision, matching exact-mode semantics on skewed
      data at the cost of a second pass.

    ``stats_via`` picks how the 1-row stats reach the verdict rows (r12,
    VERDICT r11 #3):

    - ``'plan'`` (default): the stats stay INSIDE the lazy plan and are
      broadcast-crossJoined back — no driver actions, the deferred-
      execution contract every other dataset check keeps.
    - ``'driver'``: the stats are collected at RULE-BIND time (a bounded
      1-row action — the reference's own strategy at
      profiling_utils.py:54-107) and the band lands in the verdict
      projection as LITERALS, removing the broadcast-exchange build and
      its scheduled stage.  NOT a latency win in practice: a 10-rep
      interleaved A/B at sf0.1 measured plan 0.563 s median vs driver
      0.629 s — Spark overlaps the broadcast build with the main job, so
      the exchange costs ~nothing (the r12 bench note records the runs).
      The mode earns its keep when rule-BIND-time stats are the wanted
      semantics (freeze the band once, apply to many frames / batches),
      not as an optimization.  The trades: the plan is no longer fully
      lazy (``apply_checks`` triggers the stats job immediately), and
      identical values can differ in the last float ulp vs 'plan' mode
      because the band arithmetic happens in Python doubles rather than
      Catalyst (same IEEE operations, so in practice they agree — the
      correctness gate certifies 'plan'; 'driver' is certified equal on
      the test corpus by unit test).
    """
    if approx_estimator not in ("iqr", "mad"):
        raise InvalidParameterError(f"approx_estimator must be 'iqr' or 'mad', got {approx_estimator!r}")
    if stats_via not in ("plan", "driver"):
        raise InvalidParameterError(f"stats_via must be 'plan' or 'driver', got {stats_via!r}")
    name = normalize_col_str(column)
    alias = f"{name}_has_outliers"
    sfx = unique_suffix()
    med_col, mad_col = f"__dq_mad_med_{sfx}", f"__dq_mad_mad_{sfx}"
    msg_col = f"__dq_out_msg_{sfx}"

    def apply(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
        base = source_df if source_df is not None else df
        col = to_col(column).cast("double")
        inp = filtered(col, row_filter)
        if approx and approx_estimator == "iqr":
            # ONE-PASS band: a single percentile_approx sketch yields
            # [p25, p50, p75]; MAD is estimated as half the IQR, which
            # EQUALS median(|x − median|) for any symmetric distribution
            # (and stays within the robust-estimator family otherwise).
            # Exact mode below is two irreducible sequential aggregates
            # (MAD needs deviations FROM the median); this approx estimator
            # exists precisely to collapse them into one job at scale.
            # one Aggregate: the identical percentile_approx expression is
            # deduplicated by physical aggregation, so indexing it twice
            # still computes ONE sketch (and saves a projection round trip)
            q = F.percentile_approx(inp, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            stats = base.select(
                q[1].alias(med_col),
                ((q[2] - q[0]) / 2.0).alias(mad_col),
            )
        elif approx:
            # approx_estimator='mad': true-MAD semantics at sketch
            # precision — two sequential sketches instead of two exact
            # medians, preserving the skew behavior of exact mode.
            med = base.select(F.percentile_approx(inp, F.lit(0.5)).alias(med_col))
            with_med = base.crossJoin(F.broadcast(med))
            stats = with_med.select(
                F.percentile_approx(F.abs(filtered(col, row_filter) - F.col(med_col)), F.lit(0.5)).alias(mad_col),
                F.first(med_col).alias(med_col),
            )
        else:
            med = base.select(F.median(inp).alias(med_col))
            with_med = base.crossJoin(F.broadcast(med))
            stats = with_med.select(
                F.median(F.abs(filtered(col, row_filter) - F.col(med_col))).alias(mad_col),
                F.first(med_col).alias(med_col),
            )
        if stats_via == "driver":
            # bounded 1-row collect at rule-bind time; the band becomes
            # literals in the verdict projection, so every downstream
            # action runs ONE scan job with no broadcast-exchange stage
            row = stats.first()
            med_v = row[med_col] if row is not None else None
            mad_v = row[mad_col] if row is not None else None
            out = df
            if med_v is None or mad_v is None:
                # empty/all-null input: a null band never fires, exactly
                # like the crossJoin against a 1-row-of-nulls stats frame
                lo = F.lit(None).cast("double")
                hi = F.lit(None).cast("double")
            else:
                lo = F.lit(float(med_v) - k * float(mad_v))
                hi = F.lit(float(med_v) + k * float(mad_v))
        else:
            out = df.crossJoin(F.broadcast(stats))
            lo = F.col(med_col) - F.lit(k) * F.col(mad_col)
            hi = F.col(med_col) + F.lit(k) * F.col(mad_col)
        fired = (col < lo) | (col > hi)
        if row_filter:
            fired = F.expr(row_filter) & fired
        message = F.when(
            F.coalesce(fired, F.lit(False)),
            F.format_string(
                f"Value '%s' in Column '{name}' is outside the MAD band [%s, %s]",
                str_value(col),
                str_value(lo),
                str_value(hi),
            ),
        )
        # single projection (withColumn+drop would be two analysis rounds)
        return out.select(*df.columns, message.alias(msg_col))

    if approx and approx_estimator == "iqr" and stats_via == "plan":
        # r12 fusion: the one-pass IQR band is a plain global aggregate, so
        # it can ride the engine's fused stats pass alongside is_aggr_*
        # rules (exact and approx-'mad' modes are two sequential aggregates
        # and stay per-rule).
        def _stats_exprs() -> list[Column]:
            col = to_col(column).cast("double")
            inp = filtered(col, row_filter)
            q = F.percentile_approx(inp, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            return [q[1].alias(med_col), ((q[2] - q[0]) / 2.0).alias(mad_col)]

        def _fused_finish(out: DataFrame, spark=None, ref_dfs=None) -> DataFrame:
            col = to_col(column).cast("double")
            lo = F.col(med_col) - F.lit(k) * F.col(mad_col)
            hi = F.col(med_col) + F.lit(k) * F.col(mad_col)
            fired = (col < lo) | (col > hi)
            if row_filter:
                fired = F.expr(row_filter) & fired
            message = F.when(
                F.coalesce(fired, F.lit(False)),
                F.format_string(
                    f"Value '%s' in Column '{name}' is outside the MAD band [%s, %s]",
                    str_value(col),
                    str_value(lo),
                    str_value(hi),
                ),
            )
            return out.withColumn(msg_col, message).drop(med_col, mad_col)

        apply._dq_fusion = _AggFusionSpec(None, True, _stats_exprs, _fused_finish)
    return _lift(msg_col, alias), apply


@register_rule("dataset")
def has_no_row_anomalies(
    columns: list[str],
    threshold: float = 3.5,
    approx: bool = False,
    row_filter: str | None = None,
    model: dict | None = None,
    score_threshold: float | None = None,
):
    """Multivariate row anomaly detection with two engines:

    - default: the max robust z-score (0.6745·|x−median|/MAD) across the
      given numeric columns; rows above ``threshold`` are flagged with the
      worst column named.  Fully distributed: two lazy aggregate passes
      (medians, then MADs) broadcast back via crossJoin, then a pure Column
      score.  ``approx=True`` switches to percentile_approx for 100 TB.
    - ``model=``: a fitted isolation-forest from
      :func:`dqx_spark.anomaly.fit_isolation_forest` (or
      ``anomaly.load_model``); rows whose forest score exceeds
      ``score_threshold`` (default: the model's calibrated
      ``(1 - contamination)`` training quantile) are flagged.  Scoring is an
      Arrow-batched pandas UDF with the trees broadcast in the closure —
      the train-on-sample / score-distributed lifecycle of the reference's
      anomaly module (anomaly/core.py:45-243, check_funcs.py:119-285)."""
    if not columns:
        raise ValueError("columns must not be empty")
    names = [normalize_col_str(c) for c in columns]
    alias = f"{'_'.join(names)}_has_row_anomalies"
    sfx = unique_suffix()
    msg_col = f"__dq_anom_msg_{sfx}"
    med_cols = [f"__dq_anom_med{i}_{sfx}" for i in range(len(columns))]
    mad_cols = [f"__dq_anom_mad{i}_{sfx}" for i in range(len(columns))]

    if model is not None:
        segmented = model.get("algo") == "isolation_forest_segmented"
        score_col = f"__dq_anom_score_{sfx}"

        def _threshold_col() -> Column:
            if score_threshold is not None:
                return F.lit(float(score_threshold))
            if not segmented:
                return F.lit(float(model["score_threshold"]))
            # per-segment calibrated thresholds (bounded when-chain — the
            # segment dimension is small-cardinality by construction)
            thr = F.lit(float(model["fallback"]["score_threshold"]))
            seg = F.col(model["segment_by"]).cast("string")
            for k, m in model["segments"].items():
                thr = F.when(seg == k, F.lit(float(m["score_threshold"]))).otherwise(thr)
            return thr

        def apply_model(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
            from dqx_spark.anomaly import score_with_model

            scored = score_with_model(df, model, score_col=score_col)
            thr = _threshold_col()
            fired = F.col(score_col) > thr
            if row_filter:
                fired = F.expr(row_filter) & fired
            message = F.when(
                fired,
                F.format_string(
                    f"Isolation-forest score %s exceeds threshold %s (model {model.get('model_id', '?')[:12]})",
                    F.round(F.col(score_col), 4).cast("string"),
                    F.round(thr, 4).cast("string"),
                ),
            )
            # stage per-row diagnostics; the engine merges every
            # __dq_info_* column into the _dq_info array and drops these
            info = build_dq_info_struct(
                anomaly=F.struct(
                    F.col(score_col).alias("score"),
                    thr.alias("threshold"),
                    F.coalesce(fired, F.lit(False)).alias("is_anomaly"),
                    F.lit(str(model.get("model_id", ""))).alias("model_id"),
                )
            )
            return (
                scored.withColumn(msg_col, message)
                .withColumn(f"__dq_info_{sfx}", info)
                .drop(score_col)
            )

        return _lift(msg_col, alias), apply_model

    def apply(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
        base = source_df if source_df is not None else df
        pct = (lambda c: F.percentile_approx(c, 0.5)) if approx else F.median
        cols = [to_col(c).cast("double") for c in columns]
        meds = base.select(*[pct(filtered(c, row_filter)).alias(m) for c, m in zip(cols, med_cols)])
        with_med = base.crossJoin(F.broadcast(meds))
        mads = with_med.select(
            *[
                pct(F.abs(filtered(c, row_filter) - F.col(m))).alias(md)
                for c, m, md in zip(cols, med_cols, mad_cols)
            ],
            *[F.first(m).alias(m) for m in med_cols],
        )
        out = df.crossJoin(F.broadcast(mads))

        zscores = []
        for c, m, md in zip(cols, med_cols, mad_cols):
            z = F.when(F.col(md) > 0, F.lit(0.6745) * F.abs(c - F.col(m)) / F.col(md)).otherwise(F.lit(0.0))
            zscores.append(F.coalesce(z, F.lit(0.0)))
        worst = F.greatest(*zscores) if len(zscores) > 1 else zscores[0]
        worst_name = F.lit(names[0])
        for n, z in zip(names[1:], zscores[1:]):
            worst_name = F.when(z >= worst, F.lit(n)).otherwise(worst_name)
        fired = worst > F.lit(float(threshold))
        if row_filter:
            fired = F.expr(row_filter) & fired
        message = F.when(
            fired,
            F.format_string(
                f"Row anomaly score %s exceeds threshold {threshold} (worst column: %s)",
                F.round(worst, 4).cast("string"),
                worst_name,
            ),
        )
        return out.withColumn(msg_col, message).drop(*med_cols, *mad_cols)

    return _lift(msg_col, alias), apply


@register_rule("dataset")
def has_no_aggr_outliers(
    column,
    time_column: str | Column,
    aggr_type: str = "avg",
    sigma: float = 3.0,
    lookback_num_intervals: int = 14,
    warmup_num_intervals: int = 7,
    time_interval: str = "day",
    group_by: list | None = None,
    row_filter: str | None = None,
    aggr_params: dict | None = None,
):
    """Time-series sigma-band anomaly on an aggregate
    (reference check_funcs.py:2374-2606): bucket by grain, rolling baseline
    mean/stddev_pop over the previous N buckets, flag a bucket once warmed up
    when |cur − µ| > σ·stddev.  Generalized to flag ANY anomalous bucket (the
    reference checks only the latest) — documented deviation.

    Plan: groupBy to one row per (group, bucket) — tiny — then the rolling
    window runs over buckets, and the verdict joins back null-safely."""
    if time_interval not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported time_interval: {time_interval!r}")
    name = normalize_col_str(column)
    alias = f"{name}_{aggr_type}_has_aggr_outliers"
    sfx = unique_suffix()
    msg_col = f"__dq_ao_msg_{sfx}"

    def apply(df: DataFrame, source_df: DataFrame | None = None) -> DataFrame:
        base = source_df if source_df is not None else df
        ts = to_col(time_column)
        bucket = F.date_trunc(time_interval, ts)
        groups = [to_col(g) for g in (group_by or [])]
        tmp = [f"__dq_ao_g{i}_{sfx}" for i in range(len(groups))]
        b = f"__dq_ao_bucket_{sfx}"
        m = f"__dq_ao_metric_{sfx}"
        agg = _agg_expr(column, aggr_type, row_filter, aggr_params).alias(m)
        per_bucket = base.groupBy(*[g.alias(t) for g, t in zip(groups, tmp)], bucket.alias(b)).agg(agg)
        w = (
            Window.partitionBy(*[F.col(t) for t in tmp])
            .orderBy(F.col(b))
            .rowsBetween(-int(lookback_num_intervals), -1)
        )
        stats = per_bucket.select(
            *[F.col(t) for t in tmp],
            F.col(b),
            F.col(m),
            F.avg(m).over(w).alias("__mu"),
            F.stddev_pop(m).over(w).alias("__sd"),
            F.count(m).over(w).alias("__n"),
        )
        fired = (
            (F.col("__n") >= int(warmup_num_intervals))
            & F.col("__sd").isNotNull()
            & (F.abs(F.col(m) - F.col("__mu")) > F.lit(float(sigma)) * F.col("__sd"))
        )
        flags = stats.select(
            *[F.col(t) for t in tmp],
            F.col(b),
            F.when(
                fired,
                F.format_string(
                    f"{aggr_type}({name}) value '%s' in {time_interval} bucket '%s' deviates more than "
                    f"{sigma} sigma from rolling mean '%s'",
                    str_value(F.col(m)),
                    F.col(b).cast("string"),
                    str_value(F.col("__mu")),
                ),
            ).alias(msg_col),
        )
        cond = bucket.eqNullSafe(flags[b])
        for g, t in zip(groups, tmp):
            cond = cond & g.eqNullSafe(flags[t])
        return df.join(F.broadcast(flags), on=cond, how="left").drop(b, *tmp)

    return _lift(msg_col, alias), apply
