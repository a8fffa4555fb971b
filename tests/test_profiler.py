"""Profiler + rule-generation tests on real testdata."""

from pyspark.sql import functions as F

from dqx_spark import DQEngine
from dqx_spark.engine import ExtraParams
from dqx_spark.profiler import DQProfiler, generate_dlt_expectations, generate_rules, resolve_in_list_values
from dqx_spark.serde import validate_checks


def test_profile_lineitem(spark, lineitem):
    profiler = DQProfiler({"sample_fraction": 1.0, "limit": 10000})
    stats, profiles = profiler.profile(lineitem)

    assert stats["l_orderkey"]["null_count"] == 0
    by_col = {}
    for p in profiles:
        by_col.setdefault(p.column, []).append(p.name)
    assert "is_not_null" in by_col["l_orderkey"]
    assert "min_max" in by_col["l_quantity"]
    assert "is_in_list" in by_col["l_returnflag"]

    resolve_in_list_values(lineitem, profiles)
    in_list = [p for p in profiles if p.name == "is_in_list" and p.column == "l_returnflag"][0]
    assert in_list.parameters["allowed"] == ["A", "N", "R"]


def test_generated_rules_run_clean(spark, lineitem):
    profiler = DQProfiler({"sample_fraction": 1.0, "limit": 10000, "remove_outliers": False})
    _, profiles = profiler.profile(lineitem, columns=["l_orderkey", "l_returnflag", "l_quantity"])
    resolve_in_list_values(lineitem, profiles)
    rules = generate_rules(profiles)
    assert not validate_checks(rules).has_errors

    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    checked = engine.apply_checks_by_metadata(lineitem, rules)
    # rules inferred from the full data must hold on the full data
    assert checked.where(F.col("_errors").isNotNull()).count() == 0


def test_nested_struct_flattening(spark):
    df = spark.createDataFrame(
        [(1, ("a", 2.0)), (2, ("b", 3.0))],
        "id int, nested struct<s:string, v:double>",
    )
    profiler = DQProfiler({"sample_fraction": 1.0})
    stats, profiles = profiler.profile(df)
    assert "nested.s" in stats and "nested.v" in stats
    assert any(p.column == "nested.v" and p.name == "min_max" for p in profiles)


def test_dlt_expectations(spark, lineitem):
    profiler = DQProfiler({"sample_fraction": 1.0, "limit": 5000})
    _, profiles = profiler.profile(lineitem, columns=["l_orderkey", "l_quantity"])
    exprs = generate_dlt_expectations(profiles)
    assert any("l_orderkey_is_not_null" in e for e in exprs)
    assert any("EXPECT" in e for e in exprs)


def test_generate_rules_one_sided_bounds():
    """One-sided min_max profiles degrade to the single-ended checks
    (reference generator.dq_generate_min_max)."""
    from dqx_spark.profiler import DQProfile, generate_rules

    lo = generate_rules([DQProfile("min_max", "a", "", {"min": 10, "max": None})])
    assert lo[0]["check"]["function"] == "is_not_less_than"
    assert lo[0]["check"]["arguments"]["limit"] == 10
    hi = generate_rules([DQProfile("min_max", "b", "", {"min": None, "max": 5.5})])
    assert hi[0]["check"]["function"] == "is_not_greater_than"
    both = generate_rules([DQProfile("min_max", "c", "", {"min": 1, "max": 2})])
    assert both[0]["check"]["function"] == "is_in_range"
    assert generate_rules([DQProfile("min_max", "d", "", {"min": None, "max": None})]) == []
