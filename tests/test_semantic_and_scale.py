"""Semantic validation, many-dataset-check plan mitigation, stratified
profiling."""

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.engine import ExtraParams
from dqx_spark.profiler import DQProfiler
from dqx_spark.serde import semantic_validate

RUN_TS = "2024-06-01 00:00:00"


def test_semantic_validate():
    checks = [
        {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "a"}}},
        {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "a"}}},  # dup
        {"criticality": "error", "check": {"function": "is_null", "arguments": {"column": "a"}}},      # contradiction
        {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "b"}}},  # fine
    ]
    warnings = semantic_validate(checks)
    assert any("duplicates" in w for w in warnings)
    assert any("contradictory" in w and "'a'" in w for w in warnings)
    assert not any("'b'" in w for w in warnings)


def test_many_dataset_checks_with_checkpointing(spark, lineitem):
    """20 chained dataset checks with lineage truncation every 5."""
    rules = [
        DQDatasetRule(
            check_func=C.is_aggr_not_greater_than,
            column="l_quantity",
            name=f"aggr_{i}",
            check_func_kwargs={"limit": float(10**9 + i), "aggr_type": "sum", "group_by": ["l_returnflag"]},
        )
        for i in range(20)
    ]
    engine = DQEngine(
        extra_params=ExtraParams(run_time_overwrite=RUN_TS), checkpoint_every_n_dataset_checks=5
    )
    checked = engine.apply_checks(lineitem, rules)
    assert checked.count() == lineitem.count()
    assert checked.where(F.col("_errors").isNotNull()).count() == 0
    assert set(checked.columns) == set(lineitem.columns) | {"_errors", "_warnings"}


def test_stratified_profiling(spark, lineitem):
    profiler = DQProfiler(
        {
            "sample_fraction": None,
            "stratified_column": "l_returnflag",
            "stratified_fractions": {"A": 0.5, "N": 0.5, "R": 0.5},
            "limit": 100000,
        }
    )
    stats, profiles = profiler.profile(lineitem, columns=["l_returnflag", "l_quantity"])
    assert stats["l_quantity"]["total"] > 0
    assert any(p.column == "l_quantity" for p in profiles)
