"""_dq_info reporting surface: wide-struct registry, merge_info_columns
semantics (mirrors the reference's reporting_columns integration scenarios),
and the engine-level merge of anomaly diagnostics."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqx_spark import DQDatasetRule, DQEngine
from dqx_spark.engine import ExtraParams
from dqx_spark.reporting import (
    build_dq_info_struct,
    dq_info_item_schema,
    merge_info_columns,
    register_dq_info_field,
)
import dqx_spark.functions as C

RUN_TS = "2024-06-01 00:00:00"


def test_merge_single_column_and_drop(spark):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "__dq_info_a", F.struct(F.struct(F.lit(0.75).alias("score")).alias("anomaly"))
    )
    out = merge_info_columns("_dq_info", df, ["__dq_info_a"])
    assert out.columns == ["id", "_dq_info"]
    row = out.select("_dq_info").first()
    assert len(row[0]) == 1 and row[0][0]["anomaly"]["score"] == 0.75


def test_merge_none_and_missing_names(spark):
    df = spark.createDataFrame([(1, "a")], "id int, x string")
    assert merge_info_columns("_dq_info", df, None).columns == df.columns
    assert merge_info_columns("_dq_info", df, []).columns == df.columns
    # names not present are skipped
    df2 = df.withColumn("__dq_info_real", F.struct(F.lit(0.5).alias("s")))
    out = merge_info_columns("_dq_info", df2, ["__dq_info_real", "__dq_info_missing"])
    assert out.columns == ["id", "x", "_dq_info"]
    assert len(out.select("_dq_info").first()[0]) == 1


def test_merge_twice_appends(spark):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "__dq_info_a", F.struct(F.lit(0.75).alias("s"))
    )
    first = merge_info_columns("_dq_info", df, ["__dq_info_a"]).select("id", "_dq_info")
    second = merge_info_columns(
        "_dq_info",
        first.withColumn("__dq_info_b", F.struct(F.lit(0.5).alias("s"))),
        ["__dq_info_b"],
    )
    arr = second.select("_dq_info").first()[0]
    assert [e["s"] for e in arr] == [0.75, 0.5]


def test_registry_and_wide_struct(spark):
    register_dq_info_field("_test_field_x", T.DoubleType())
    register_dq_info_field("_test_field_x", T.StringType())  # first wins
    schema = dq_info_item_schema()
    assert schema["_test_field_x"].dataType == T.DoubleType()
    assert "anomaly" in schema.fieldNames()  # registered by dataset_checks import
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "i", build_dq_info_struct(**{"_test_field_x": F.lit(1.5)})
    )
    row = df.select("i").first()[0]
    assert row["_test_field_x"] == 1.5 and row["anomaly"] is None
    assert df.schema["i"].dataType == dq_info_item_schema()


def test_engine_merges_anomaly_info(spark):
    from dqx_spark import anomaly

    rows = [(i, float(i % 7), float((i * 3) % 5)) for i in range(200)] + [(997, 90.0, -40.0)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    model = anomaly.fit_isolation_forest(df, ["a", "b"], num_trees=16, seed=3)
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(
        df,
        [
            DQDatasetRule(
                check_func=C.has_no_row_anomalies,
                check_func_kwargs={"columns": ["a", "b"], "model": model},
            )
        ],
    )
    assert "_dq_info" in checked.columns
    rows_out = {r["id"]: r for r in checked.collect()}
    info = rows_out[997]["_dq_info"]
    assert len(info) == 1
    a = info[0]["anomaly"]
    assert a["score"] is not None and a["threshold"] is not None
    assert a["is_anomaly"] == (rows_out[997]["_errors"] is not None)
    assert a["model_id"] == model["model_id"]
    # every row carries diagnostics, not just flagged rows
    assert all(r["_dq_info"] is not None and len(r["_dq_info"]) == 1 for r in rows_out.values())
    # get_valid keeps _dq_info, drops only result arrays (reference parity)
    valid = engine.get_valid(checked)
    assert "_dq_info" in valid.columns and "_errors" not in valid.columns


def test_user_prefixed_column_passes_through(spark):
    # a user column carrying the staging prefix is NOT merged or dropped
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "__dq_info_user", F.lit("mine")
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(
        df, [DQDatasetRule(check_func=C.is_unique, columns=["id"])]
    )
    assert "__dq_info_user" in checked.columns
    assert "_dq_info" not in checked.columns
    assert checked.select("__dq_info_user").first()[0] == "mine"


def test_existing_info_named_column_no_crash(spark):
    # regression (r4 review): an input column named _dq_info (any type) with
    # no info-producing checks must pass through, not crash the merge
    df = spark.createDataFrame([(1, "keep")], "id int, _dq_info string")
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [DQDatasetRule(check_func=C.is_unique, columns=["id"])])
    assert checked.select("_dq_info").first()[0] == "keep"


def test_build_dq_info_struct_rejects_unknown_field():
    import pytest

    with pytest.raises(ValueError, match="unregistered _dq_info fields"):
        build_dq_info_struct(anomalyy=F.lit(1))
