"""E2E runner, metrics, and streaming micro-batch parity tests."""

import json
import os

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.engine import ExtraParams
from dqx_spark.io import InputConfig, OutputConfig, RunConfig
from dqx_spark.metrics import DQMetricsObserver, compute_summary_metrics_lazy
from dqx_spark.serde import save_checks_to_file, serialize_checks, validate_checks
from dqx_spark.streaming import apply_checks_streaming
from dqx_spark.workflow import apply_checks_and_save_in_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
RUN_TS = "2024-06-01 00:00:00"


def test_e2e_run_with_quarantine_and_metrics(spark, tmp_path):
    checks = [
        {"criticality": "error", "check": {"function": "is_unique", "arguments": {"columns": ["l_orderkey", "l_linenumber"]}}},
        {"criticality": "warn", "check": {"function": "is_in_range", "arguments": {"column": "l_quantity", "min_limit": 5, "max_limit": 45}}},
    ]
    checks_path = str(tmp_path / "checks.json")
    with open(checks_path, "w") as fh:
        json.dump(checks, fh)

    rc = RunConfig(
        name="lineitem_run",
        input_config=InputConfig(location=f"{SF_DIR}/lineitem.parquet"),
        output_config=OutputConfig(location=str(tmp_path / "good"), mode="overwrite"),
        quarantine_config=OutputConfig(location=str(tmp_path / "bad"), mode="overwrite"),
        metrics_config=OutputConfig(location=str(tmp_path / "metrics"), mode="overwrite"),
        checks_location=checks_path,
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS, run_id_overwrite="e2e"))
    metrics = apply_checks_and_save_in_table(spark, rc, engine=engine)

    total = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.parquet(str(tmp_path / "bad"))
    assert good.count() + bad.where(F.col("_errors").isNotNull()).count() == total
    assert "_errors" not in good.columns and "_errors" in bad.columns

    assert metrics["input_row_count"] == total
    assert metrics["error_row_count"] == bad.where(F.col("_errors").isNotNull()).count()
    saved = spark.read.parquet(str(tmp_path / "metrics"))
    names = {r["metric_name"] for r in saved.collect()}
    assert {"input_row_count", "error_row_count", "warning_row_count", "valid_row_count"} <= names


def test_lazy_metrics(spark, lineitem):
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(lineitem, [DQRowRule(check_func=C.is_not_null, column="l_orderkey")])
    lazy = compute_summary_metrics_lazy(checked, DQMetricsObserver())
    vals = {r["metric_name"]: int(r["metric_value"]) for r in lazy.collect()}
    assert vals["input_row_count"] == lineitem.count()
    assert vals["error_row_count"] == 0


def test_streaming_micro_batch_parity(spark, lineitem, tmp_path):
    """FIXTURES F4: readStream + availableNow + foreachBatch == batch."""
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS, run_id_overwrite="stream"))
    checks = [
        DQRowRule(check_func=C.is_in_range, column="l_quantity", check_func_kwargs={"min_limit": 5, "max_limit": 45}),
        DQDatasetRule(check_func=C.is_unique, columns=["l_orderkey", "l_linenumber"]),
    ]
    # the file streaming source requires a directory
    src_dir = str(tmp_path / "src")
    import shutil

    os.makedirs(src_dir)
    shutil.copy(f"{SF_DIR}/lineitem.parquet", src_dir)
    stream = spark.readStream.schema(lineitem.schema).parquet(src_dir)
    out_dir = str(tmp_path / "stream_out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = apply_checks_streaming(
        engine, stream, checks, sink,
        trigger={"availableNow": True},
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = engine.apply_checks(lineitem, checks)
    assert streamed.count() == batch.count()
    # single micro-batch over one file: identical error counts
    assert (
        streamed.where(F.col("_errors").isNotNull()).count()
        == batch.where(F.col("_errors").isNotNull()).count()
    )


def test_serde_round_trip(spark):
    rules = [
        DQRowRule(check_func=C.is_not_null, column="a", criticality="warn", filter="b > 0"),
        DQDatasetRule(check_func=C.is_unique, columns=["a", "b"], user_metadata={"team": "core"}),
    ]
    dicts = serialize_checks(rules)
    assert validate_checks(dicts).has_errors is False
    from dqx_spark.serde import deserialize_checks

    back = deserialize_checks(dicts)
    assert [r.name for r in back] == [r.name for r in rules]
    assert [r.fingerprint() for r in back] == [r.fingerprint() for r in rules]
    assert back[0].filter == "b > 0"


def test_validate_checks_errors(spark):
    bad = [
        {"criticality": "fatal", "check": {"function": "is_not_null", "arguments": {"column": "x"}}},
        {"check": {"function": "no_such_check"}},
        {"check": {"function": "is_in_list", "arguments": {"column": "x", "bogus_arg": 1}}},
    ]
    status = validate_checks(bad)
    assert status.has_errors
    text = str(status)
    assert "fatal" in text and "no_such_check" in text and "bogus_arg" in text


def test_multi_table_fan_out(spark, tmp_path):
    from dqx_spark.workflow import apply_checks_and_save_in_tables

    configs, checks_by_run = [], {}
    for table in ("orders", "customer"):
        configs.append(
            RunConfig(
                name=table,
                input_config=InputConfig(location=f"{SF_DIR}/{table}.parquet"),
                output_config=OutputConfig(location=str(tmp_path / table), mode="overwrite"),
                metrics_config=OutputConfig(location=str(tmp_path / f"{table}_m"), mode="overwrite"),
            )
        )
        key = "o_orderkey" if table == "orders" else "c_custkey"
        checks_by_run[table] = [
            {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": key}}}
        ]
    results = apply_checks_and_save_in_tables(spark, configs, checks_by_run, max_parallelism=2)
    assert set(results) == {"orders", "customer"}
    assert results["orders"]["error_row_count"] == 0
    assert spark.read.parquet(str(tmp_path / "customer")).count() == results["customer"]["input_row_count"]


def test_expand_table_patterns(spark):
    from dqx_spark.workflow import expand_table_patterns, run_configs_for_patterns

    catalog = {
        "default": ["sales_2023", "sales_2024", "users", "tmp_scratch"],
        "staging": ["sales_raw", "events"],
    }

    assert expand_table_patterns(spark, ["default.sales_*"], catalog_listing=catalog) == [
        "default.sales_2023",
        "default.sales_2024",
    ]
    # *.glob over every database; exclusion patterns; dedup across patterns
    assert expand_table_patterns(
        spark, ["*.sales_*", "staging.*"], exclude_patterns=["*_raw"], catalog_listing=catalog
    ) == ["default.sales_2023", "default.sales_2024", "staging.events"]
    # exact names pass through without a catalog listing
    assert expand_table_patterns(spark, ["any.table_name"], catalog_listing=catalog) == ["any.table_name"]
    # 3-part exclusions are normalized like includes (r4 review fix)
    assert expand_table_patterns(
        spark, ["default.sales_*"], exclude_patterns=["spark_catalog.default.sales_2023"],
        catalog_listing=catalog,
    ) == ["default.sales_2024"]
    # 3-part reference-style names: spark_catalog accepted, others rejected
    assert expand_table_patterns(spark, ["spark_catalog.default.users"], catalog_listing=catalog) == [
        "default.users"
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expand_table_patterns(spark, ["other_catalog.default.users"], catalog_listing=catalog)

    configs = run_configs_for_patterns(
        spark,
        ["default.sales_*"],
        checks_location="/checks/{table}.yaml",
        quarantine_suffix="_quarantine",
        catalog_listing=catalog,
    )
    assert [c.name for c in configs] == ["default.sales_2023", "default.sales_2024"]
    assert configs[0].output_config.location == "default.sales_2023_dq_output"
    assert configs[0].quarantine_config.location == "default.sales_2023_quarantine"
    assert configs[0].checks_location == "/checks/default.sales_2023.yaml"


def test_expand_table_patterns_real_catalog(spark, tmp_path):
    from dqx_spark.workflow import expand_table_patterns

    spark.sql("CREATE DATABASE IF NOT EXISTS wildtest")
    try:
        spark.range(3).write.mode("overwrite").saveAsTable("wildtest.wild_a")
        spark.range(3).write.mode("overwrite").saveAsTable("wildtest.wild_b")
        spark.range(3).write.mode("overwrite").saveAsTable("wildtest.other")
        assert expand_table_patterns(spark, ["wildtest.wild_*"]) == [
            "wildtest.wild_a",
            "wildtest.wild_b",
        ]
        assert "wildtest.other" in expand_table_patterns(spark, ["wildtest.*"])
    finally:
        spark.sql("DROP DATABASE IF EXISTS wildtest CASCADE")


def test_write_sized_bounds_file_rows(spark, tmp_path):
    from dqx_spark import io as dio

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "sized")
    dio.write_sized(df.coalesce(1), out, max_records_per_file=200)
    import glob

    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == 5  # 1000 rows / 200 per file
    assert spark.read.parquet(out).count() == 1000
    # estimated mode produces a valid bounded write too
    out2 = str(tmp_path / "sized2")
    dio.write_sized(df.coalesce(1), out2, target_file_mb=1)
    assert spark.read.parquet(out2).count() == 1000


def test_sort_for_skipping_layout(spark, tmp_path):
    from dqx_spark import io as dio

    df = spark.range(0, 10000).withColumn("k", (F.col("id") * 7919) % 100)
    laid = dio.sort_for_skipping(df, ["k"], num_partitions=4)
    plan = laid._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    out = str(tmp_path / "skip")
    laid.write.mode("overwrite").parquet(out)
    # each written file covers a narrow, sorted k-range -> per-file min/max
    # stats are tight; verify via per-file spans
    back = spark.read.parquet(out)
    import os

    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(spans) >= 2
    total_span = sum(r.hi - r.lo for r in spans)
    assert total_span <= 110  # ranges are disjoint-ish, not each 0..99


def test_run_config_yaml_round_trip(tmp_path):
    """config_serializer parity (reference config_serializer.py:1-97):
    RunConfig lists round-trip through YAML and JSON; malformed files raise
    typed errors."""
    import pytest as _pytest

    from dqx_spark.errors import InvalidConfigError, MissingResourceError
    from dqx_spark.io import (
        InputConfig,
        OutputConfig,
        RunConfig,
        load_run_configs,
        save_run_configs,
    )

    rcs = [
        RunConfig(
            name="t1",
            input_config=InputConfig(location="/data/in.parquet", options={"mergeSchema": "true"}),
            output_config=OutputConfig(location="cat.sch.out", mode="overwrite", partition_by=["d"]),
            quarantine_config=OutputConfig(location="/data/bad"),
            checks_location="/conf/checks.yaml",
            reference_tables={"ref": InputConfig(location="cat.sch.ref")},
            custom_metrics=["count(1) as n"],
        ),
        RunConfig(name="t2"),
    ]
    for ext in ("yaml", "json"):
        p = str(tmp_path / f"rc.{ext}")
        save_run_configs(rcs, p)
        back = load_run_configs(p)
        assert back == rcs

    bad = tmp_path / "bad.yaml"
    bad.write_text("not-a-list: 1\n")
    with _pytest.raises(InvalidConfigError):
        load_run_configs(str(bad))
    bad.write_text("- input_config: {format: parquet}\n")  # no location
    with _pytest.raises(InvalidConfigError):
        load_run_configs(str(bad))
    with _pytest.raises(MissingResourceError):
        load_run_configs(str(tmp_path / "nope.yaml"))


def test_parquet_layout_and_sort_for_locality(spark, tmp_path):
    from dqx_spark.io import parquet_layout, sort_for_locality

    src = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.rand(42).alias("v")
    )
    out = str(tmp_path / "laid_out")
    sort_for_locality(src, ["k"], num_partitions=4).write.mode("overwrite").parquet(out)

    layout = parquet_layout(spark, out).collect()
    assert len(layout) >= 4
    assert all(r.error is None for r in layout)
    assert sum(r.num_rows for r in layout) == 10_000
    assert all(r.num_row_groups >= 1 and r.size_bytes > 0 for r in layout)
    # locality: each file covers a narrow k-range -> per-file min==max for
    # most files when 7 keys spread over >=4 range partitions
    import pyarrow.parquet as pq

    spans = []
    for r in layout:
        md = pq.ParquetFile(r.file[len("file:"):]).metadata
        ks = [md.row_group(i).column(1).statistics for i in range(md.num_row_groups)]
        spans.append(max(s.max for s in ks) - min(s.min for s in ks))
    assert sum(1 for s in spans if s <= 2) >= len(spans) - 1, spans

    # plan shape: range exchange, not hash
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        sort_for_locality(src, ["k"], num_partitions=4).explain("formatted")
    assert "rangepartitioning" in buf.getvalue()
