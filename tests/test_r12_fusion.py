"""r12 optimization: the engine's fused stats pass.

Dataset rules whose stats subplan is a plain aggregate over the original
input (is_aggr_* family, has_no_outliers approx-iqr 'plan' mode, global
aggr_matches_dataset) are batched by the engine so one stats subplan — one
input scan + one broadcast join-back — serves the whole batch.  These tests
pin (a) value identity against the unfused per-rule path, (b) the plan-shape
win (Aggregate subtree count), and (c) the batching boundaries that keep
values exact (distinct aggregates never fuse with float aggregates)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import dqx_spark.functions as C
from dqx_spark import DQDatasetRule, DQEngine
from dqx_spark.engine import ExtraParams
from dqx_spark.functions.dataset_checks import _AggFusionSpec


EP = ExtraParams(run_time_overwrite="2024-06-01 00:00:00", run_id_overwrite="fusion-test")


def _mk_rules():
    return [
        # global plain aggregates (one fused batch)
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_linenumber",
                      check_func_kwargs={"limit": 4.0, "aggr_type": "avg", "abs_tolerance": 10.0}),
        DQDatasetRule(check_func=C.is_aggr_not_equal, column="l_extendedprice",
                      check_func_kwargs={"limit": -1.0, "aggr_type": "min"}),
        DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 0.0, "aggr_type": "median"}),
        DQDatasetRule(check_func=C.has_no_outliers, column="l_extendedprice",
                      check_func_kwargs={"approx": True}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 100.0, "aggr_type": "avg"}),
        # global distinct aggregates (their own fused batch — Expand changes
        # float accumulation order, so they must never join the batch above)
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_orderkey",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "count_distinct", "abs_tolerance": 1e9}),
        DQDatasetRule(check_func=C.aggr_matches_dataset, column="l_orderkey",
                      check_func_kwargs={"ref_column": "o_orderkey", "aggr_type": "count_distinct",
                                         "ref_df_name": "orders", "abs_tolerance": 1e9}),
        # grouped on l_returnflag (one fused batch, error + warn criticality)
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_quantity",
                      check_func_kwargs={"limit": 26.0, "aggr_type": "avg", "rel_tolerance": 0.5,
                                         "group_by": ["l_returnflag"]}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "sum", "group_by": ["l_returnflag"]}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_quantity",
                      check_func_kwargs={"limit": 1.0, "aggr_type": "sum", "group_by": ["l_returnflag"]},
                      criticality="warn"),
        # grouped on a different key (singleton batch -> per-rule path)
        DQDatasetRule(check_func=C.is_aggr_not_equal, column="l_tax",
                      check_func_kwargs={"limit": -1.0, "aggr_type": "max", "group_by": ["l_linestatus"]}),
    ]


def _strip_fusion(rules):
    for r in rules:
        _cond, closure = r.invoke_cached()
        if hasattr(closure, "_dq_fusion"):
            del closure._dq_fusion
    return rules


def _rowset(df):
    j = df.select(F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)])).alias("j"))
    return {(r["j"], r["n"]) for r in j.groupBy("j").agg(F.count(F.lit(1)).alias("n")).collect()}


def test_fused_equals_unfused_bit_for_bit(spark, lineitem, orders):
    """The fused pass must produce the exact same multiset of result rows
    (messages included — float metric values must not drift by even an ulp)
    as the per-rule path."""
    fused = DQEngine(extra_params=EP).apply_checks(lineitem, _mk_rules(), ref_dfs={"orders": orders})
    unfused = DQEngine(extra_params=EP).apply_checks(
        lineitem, _strip_fusion(_mk_rules()), ref_dfs={"orders": orders}
    )
    assert _rowset(fused) == _rowset(unfused)


def test_fused_plan_collapses_aggregate_subtrees(spark, lineitem, orders):
    """11 dataset rules: unfused plans one stats subtree per rule; fused
    plans one per batch (plain-global, distinct-global, grouped-returnflag)
    plus the two singletons — the input is scanned far fewer times."""
    fused = DQEngine(extra_params=EP).apply_checks(lineitem, _mk_rules(), ref_dfs={"orders": orders})
    unfused = DQEngine(extra_params=EP).apply_checks(
        lineitem, _strip_fusion(_mk_rules()), ref_dfs={"orders": orders}
    )
    pf = fused._jdf.queryExecution().optimizedPlan().toString()
    pu = unfused._jdf.queryExecution().optimizedPlan().toString()
    assert pu.count("parquet") >= 12  # one scan per stats subtree + main
    assert pf.count("parquet") <= 7   # main + one per fused batch/singleton
    assert pf.count("Aggregate") < pu.count("Aggregate")


def test_distinct_aggregates_batch_separately():
    """count_distinct rules advertise distinct_agg=True and a different
    fusion key, so they can never share an Aggregate with float sums."""
    _c, plain = C.is_aggr_not_greater_than("l_quantity", 10.0, aggr_type="sum")
    _c, distinct = C.is_aggr_not_greater_than("l_quantity", 10.0, aggr_type="count_distinct")
    ks_plain = plain._dq_fusion.key()
    ks_distinct = distinct._dq_fusion.key()
    assert ks_plain != ks_distinct
    assert plain._dq_fusion.distinct_agg is False
    assert distinct._dq_fusion.distinct_agg is True


def test_two_pass_outlier_modes_do_not_fuse():
    """Exact and approx-'mad' has_no_outliers are two sequential aggregates
    and must stay per-rule; approx-iqr 'driver' mode collects at bind time
    and must stay per-rule too."""
    _c, exact = C.has_no_outliers("l_quantity")
    _c, amad = C.has_no_outliers("l_quantity", approx=True, approx_estimator="mad")
    _c, drv = C.has_no_outliers("l_quantity", approx=True, stats_via="driver")
    _c, iqr = C.has_no_outliers("l_quantity", approx=True)
    assert not hasattr(exact, "_dq_fusion")
    assert not hasattr(amad, "_dq_fusion")
    assert not hasattr(drv, "_dq_fusion")
    assert isinstance(iqr._dq_fusion, _AggFusionSpec)


def test_skipped_rules_do_not_join_fusion(spark, lineitem):
    """A rule whose column is unresolvable is skipped (structured skip
    entry), and must not contribute to — or break — a fused batch."""
    rules = [
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_quantity",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "sum"}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="no_such_column",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "sum"}),
        DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_quantity",
                      check_func_kwargs={"limit": 0.0, "aggr_type": "min"}),
    ]
    out = DQEngine(extra_params=EP).apply_checks(lineitem, rules)
    errs = out.where(F.col("_errors").isNotNull())
    first = errs.select(F.to_json("_errors").alias("j")).first()
    assert first is not None and "not found in the input" in first["j"]


def test_same_rule_listed_twice_fuses_once(spark, lineitem):
    """The duplicate-rule-object memoization must still hold under fusion."""
    r = DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_quantity",
                      check_func_kwargs={"limit": 1.0, "aggr_type": "sum"})
    other = DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_quantity",
                          check_func_kwargs={"limit": 0.0, "aggr_type": "min"})
    out = DQEngine(extra_params=EP).apply_checks(lineitem, [r, other, r])
    row = out.select(F.to_json("_errors").alias("j")).first()
    # listed twice -> two result entries (each carries the function name in
    # both its `name` and `function` fields -> 4 substring hits)
    assert row["j"].count("is_aggr_not_greater_than") == 4
