"""End-to-end slice (SURVEY.md §7.2): row exprs + window + join + global
agg/crossJoin + assembly + split on real testdata."""

from datetime import datetime

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQRowRule, DQDatasetRule
from dqx_spark.engine import ExtraParams

RUN_TS = datetime(2024, 6, 1, 0, 0, 0)


def make_engine():
    return DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS, run_id_overwrite="test-run"))


def test_end_to_end_slice(spark, lineitem, orders):
    checks = [
        DQRowRule(check_func=C.is_not_null, column="l_orderkey"),
        DQRowRule(check_func=C.is_in_range, column="l_quantity", check_func_kwargs={"min_limit": 1, "max_limit": 50}),
        DQDatasetRule(check_func=C.is_unique, columns=["l_orderkey", "l_linenumber"]),
        DQDatasetRule(
            check_func=C.foreign_key,
            columns=["l_orderkey"],
            check_func_kwargs={"ref_columns": ["o_orderkey"], "ref_df_name": "orders"},
        ),
        DQDatasetRule(
            check_func=C.is_aggr_not_greater_than,
            column="l_extendedprice",
            criticality="warn",
            check_func_kwargs={"limit": 1e12, "aggr_type": "avg"},
        ),
    ]
    engine = make_engine()
    checked = engine.apply_checks(lineitem, checks, ref_dfs={"orders": orders})

    assert set(checked.columns) == set(lineitem.columns) | {"_errors", "_warnings"}
    total = lineitem.count()
    assert checked.count() == total

    good, bad = engine.get_valid(checked), engine.get_invalid(checked)
    n_err = checked.where(F.col("_errors").isNotNull()).count()
    assert good.count() == total - n_err

    # independently computed expectation: the only true violations in the
    # testdata are duplicated (l_orderkey, l_linenumber) keys
    expected_dup_rows = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .count()
        .where(F.col("count") > 1)
        .agg(F.sum("count"))
        .collect()[0][0]
    ) or 0
    assert n_err == expected_dup_rows
    assert n_err > 0  # the driver data deliberately contains duplicates


def test_row_check_failure_annotation(spark):
    df = spark.createDataFrame([(1, "x"), (None, ""), (2, None)], "id int, s string")
    engine = make_engine()
    checked = engine.apply_checks(
        df,
        [
            DQRowRule(check_func=C.is_not_null, column="id"),
            DQRowRule(check_func=C.is_not_null_and_not_empty, column="s", criticality="warn"),
        ],
    )
    rows = {tuple(r[:2]): r for r in checked.collect()}
    assert rows[(1, "x")]["_errors"] is None and rows[(1, "x")]["_warnings"] is None
    assert rows[(None, "")]["_errors"][0]["name"] == "id_is_not_null"
    assert rows[(None, "")]["_warnings"][0]["message"] == "Column 's' value is null or empty"
    assert rows[(2, None)]["_errors"] is None
    assert rows[(2, None)]["_warnings"][0]["function"] == "is_not_null_and_not_empty"
    assert rows[(2, None)]["_warnings"][0]["run_id"] == "test-run"


def test_skip_on_missing_column(spark):
    df = spark.createDataFrame([(1,)], "id int")
    engine = make_engine()
    checked = engine.apply_checks(df, [DQRowRule(check_func=C.is_not_null, column="nope")])
    row = checked.collect()[0]
    assert row["_errors"][0]["skipped"] is True
    # suppression mode drops the skipped result entirely
    engine2 = DQEngine(suppress_skipped=True, extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    row2 = engine2.apply_checks(df, [DQRowRule(check_func=C.is_not_null, column="nope")]).collect()[0]
    assert row2["_errors"] is None


def test_metadata_path(spark):
    df = spark.createDataFrame([(1, "A"), (2, "Z")], "id int, flag string")
    checks = [
        {"criticality": "error", "check": {"function": "is_in_list", "arguments": {"column": "flag", "allowed": ["A", "B"]}}},
        {"criticality": "warn", "check": {"function": "is_not_null", "for_each_column": ["id", "flag"]}},
    ]
    engine = make_engine()
    checked = engine.apply_checks_by_metadata(df, checks)
    bad = checked.where(F.col("_errors").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["flag"] == "Z"


def test_destructive_filter_is_skipped_not_run(spark):
    """Reference manager semantics: a filter containing a destructive
    statement cannot parse as an expression, so the check is SKIPPED with a
    structured entry (never executed, never aborts the rule set);
    suppress_skipped removes the entry entirely."""
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, t string")
    rule = DQRowRule(check_func=C.is_not_null, column="t", filter="id = 1 OR DROP TABLE users")
    checked = make_engine().apply_checks(df, [rule])
    for row in checked.collect():
        assert row["_errors"] is not None and row["_errors"][0]["skipped"] is True
        assert "filter" in row["_errors"][0]["message"]
    engine2 = DQEngine(suppress_skipped=True, extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    assert all(r["_errors"] is None for r in engine2.apply_checks(df, [rule]).collect())


def test_custom_result_column_names(spark):
    """ExtraParams.result_column_names renames _errors/_warnings/_dq_info
    per engine instance (reference _result_column_names resolution)."""
    import pytest

    df = spark.createDataFrame([(1, None), (2, "b")], "id int, t string")
    engine = DQEngine(
        extra_params=ExtraParams(
            run_time_overwrite=RUN_TS,
            result_column_names={"errors": "dq_errs", "warnings": "dq_warns"},
        )
    )
    checked = engine.apply_checks(df, [DQRowRule(check_func=C.is_not_null, column="t")])
    assert "dq_errs" in checked.columns and "_errors" not in checked.columns
    bad = {r["id"] for r in checked.where(F.col("dq_errs").isNotNull()).collect()}
    assert bad == {1}
    valid = engine.get_valid(checked)
    assert set(valid.columns) == {"id", "t"}
    assert {r["id"] for r in valid.collect()} == {2}
    invalid = engine.get_invalid(checked)
    assert {r["id"] for r in invalid.collect()} == {1}

    with pytest.raises(ValueError, match="result_column_names"):
        DQEngine(extra_params=ExtraParams(result_column_names={"bogus": "x"}))
