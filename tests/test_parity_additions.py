"""Tests for the round-4 signature/semantic parity additions: missing
kwargs on implemented checks and the reference geo families that had no
same-name implementation (multi-type tags, area/num-points comparators,
topological relationship predicates)."""

import pytest
from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule


def _vals(df, cond):
    return [r["c"] is not None for r in df.select(cond.alias("c")).collect()]


# ---------------------------------------------------------------------------
# row_checks kwargs
# ---------------------------------------------------------------------------
def test_trim_strings_on_empty_family(spark):
    df = spark.createDataFrame([("  ",), ("x",), ("",)], "a string")
    assert _vals(df, C.is_not_empty("a")) == [False, False, True]
    assert _vals(df, C.is_not_empty("a", trim_strings=True)) == [True, False, True]
    assert _vals(df, C.is_empty("a", trim_strings=True)) == [False, True, False]


def test_equal_to_tolerances(spark):
    df = spark.createDataFrame([(2.001,), (2.02,), (None,)], "v double")
    assert _vals(df, C.is_equal_to("v", 2.0)) == [True, True, True]
    assert _vals(df, C.is_equal_to("v", 2.0, abs_tolerance=0.01)) == [False, True, True]
    # rel band scales with magnitude: |2.02-2.0|=0.02 <= 0.01*2.02 -> equal
    assert _vals(df, C.is_equal_to("v", 2.0, rel_tolerance=0.01)) == [False, False, True]
    assert _vals(df, C.is_not_equal_to("v", 2.0, abs_tolerance=0.01)) == [True, False, False]
    with pytest.raises(ValueError):
        C.is_equal_to("v", 2.0, abs_tolerance=-1)


def test_iso_code_formats(spark):
    df = spark.createDataFrame([("840",), ("004",), ("000",)], "a string")
    assert _vals(df, C.is_valid_country_code("a", code_format="numeric")) == [False, False, True]
    # 840=USD valid; 004 is a country, not a currency; 000 is neither
    assert _vals(df, C.is_valid_currency_code("a", code_format="numeric")) == [False, True, True]
    # hyphenated and bare spellings both resolve; unknown format raises
    df2 = spark.createDataFrame([("DE",), ("DEU",)], "a string")
    assert _vals(df2, C.is_valid_country_code("a", code_format="alpha-2")) == [False, True]
    assert _vals(df2, C.is_valid_country_code("a", code_format="alpha3")) == [True, False]
    with pytest.raises(ValueError):
        C.is_valid_country_code("a", code_format="bogus")


def test_language_alpha3(spark):
    df = spark.createDataFrame([("deu",), ("eng",), ("xxq",), ("de",)], "a string")
    assert _vals(df, C.is_valid_language_code("a", code_format="alpha-3")) == [False, False, True, True]
    assert _vals(df, C.is_valid_language_code("a")) == [True, True, True, False]


def test_subdivision_country_column(spark):
    df = spark.createDataFrame(
        [("US-CA", "US"), ("US-CA", "GB"), ("US-CA", None), ("XX-1", "US")],
        "sub string, country string",
    )
    got = _vals(df, C.is_valid_subdivision_code("sub", country_column="country"))
    # valid+match, valid+mismatch, valid+null country (passes), invalid code
    assert got == [False, True, False, True]


def test_pii_param_path_builds_analyzer_column(spark):
    # language/threshold select the Presidio engine — Column construction
    # must work without presidio installed (import is executor-side/lazy)
    cond = C.does_not_contain_pii("a", threshold=0.9)
    assert cond is not None
    # default regex path unchanged
    df = spark.createDataFrame([("mail me at a@b.com",), ("clean",)], "a string")
    assert _vals(df, C.does_not_contain_pii("a")) == [True, False]


# ---------------------------------------------------------------------------
# dataset_checks kwargs
# ---------------------------------------------------------------------------
def test_aggr_matches_dataset_ref_row_filter(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    ref = spark.createDataFrame([(1,), (2,), (99,)], "v int")
    engine = DQEngine(spark)
    rule = DQDatasetRule(
        check_func=C.aggr_matches_dataset,
        column="v",
        check_func_kwargs={"ref_df_name": "r", "ref_row_filter": "v < 10"},
    )
    out = engine.apply_checks(df, [rule], ref_dfs={"r": ref}).collect()
    assert all(r["_errors"] is None for r in out)  # counts match once ref is filtered
    rule2 = DQDatasetRule(
        check_func=C.aggr_matches_dataset, column="v", check_func_kwargs={"ref_df_name": "r"}
    )
    out2 = engine.apply_checks(df, [rule2], ref_dfs={"r": ref}).collect()
    assert all(r["_errors"] is not None for r in out2)  # 2 vs 3 mismatch


def test_aggr_matches_dataset_aggr_params(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    engine = DQEngine(spark)
    rule = DQDatasetRule(
        check_func=C.aggr_matches_dataset,
        column="v",
        check_func_kwargs={
            "ref_df_name": "r",
            "aggr_type": "percentile",
            "aggr_params": {"percentage": 0.9},
        },
    )
    out = engine.apply_checks(df, [rule], ref_dfs={"r": df}).collect()
    assert all(r["_errors"] is None for r in out)


def test_compare_datasets_row_filter_gates_condition(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    ref = spark.createDataFrame([(1, "a"), (2, "CHANGED")], "id int, v string")
    engine = DQEngine(spark)
    rule = DQDatasetRule(
        check_func=C.compare_datasets,
        columns=["id"],
        check_func_kwargs={"ref_columns": ["id"], "ref_df_name": "r", "row_filter": "id = 1"},
    )
    out = {r["id"]: r["_errors"] for r in engine.apply_checks(df, [rule], ref_dfs={"r": ref}).collect()}
    assert out[1] is None and out[2] is None  # row 2 differs but is filtered out


# ---------------------------------------------------------------------------
# geo: type tags, comparators, topological predicates
# ---------------------------------------------------------------------------
def test_multi_type_tags(spark):
    df = spark.createDataFrame(
        [
            ("MULTIPOINT ((1 1), (2 2))",),
            ("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",),
            ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",),
            ("GEOMETRYCOLLECTION (POINT (1 1))",),
            ("POINT (1 1)",),
        ],
        "g string",
    )
    assert _vals(df, C.is_multipoint("g")) == [False, True, True, True, True]
    assert _vals(df, C.is_multilinestring("g")) == [True, False, True, True, True]
    assert _vals(df, C.is_multipolygon("g")) == [True, True, False, True, True]
    assert _vals(df, C.is_geometrycollection("g")) == [True, True, True, False, True]


def test_area_comparators(spark):
    # unit square, area 1
    df = spark.createDataFrame([("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",), ("JUNK",), (None,)], "g string")
    # unit square passes/fails by area; malformed WKT always fails; NULL passes
    assert _vals(df, C.is_area_equal_to("g", 1.0)) == [False, True, False]
    assert _vals(df, C.is_area_not_equal_to("g", 2.0)) == [False, True, False]
    assert _vals(df, C.is_area_not_greater_than("g", 0.5)) == [True, True, False]
    assert _vals(df, C.is_area_not_less_than("g", 0.5)) == [False, True, False]
    with pytest.raises(ValueError):
        C.is_area_equal_to("g", 1.0, srid=3857)


def test_num_points_comparators(spark):
    df = spark.createDataFrame([("LINESTRING (0 0, 1 1, 2 2)",)], "g string")
    assert _vals(df, C.is_num_points_equal_to("g", 3)) == [False]
    assert _vals(df, C.is_num_points_not_equal_to("g", 3)) == [True]
    assert _vals(df, C.is_num_points_not_greater_than("g", 2)) == [True]
    assert _vals(df, C.is_num_points_not_less_than("g", 4)) == [True]


SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def test_geo_relations_points(spark):
    df = spark.createDataFrame(
        [("POINT (5 5)",), ("POINT (10 5)",), ("POINT (20 20)",)], "g string"
    )  # interior, boundary, outside
    assert _vals(df, C.is_geo_intersects("g", SQUARE)) == [False, False, True]
    assert _vals(df, C.is_geo_within("g", SQUARE)) == [False, True, True]
    assert _vals(df, C.is_geo_contains("g", SQUARE)) == [False, True, True]
    assert _vals(df, C.is_geo_covers("g", SQUARE)) == [False, False, True]
    assert _vals(df, C.is_geo_touches("g", SQUARE)) == [True, False, True]


def test_geo_relations_polygons(spark):
    inside = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    overlapping = "POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))"
    outside = "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"
    touching = "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))"  # shares the x=10 edge segment
    edge_aligned = "POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0))"  # inside, shares boundary
    df = spark.createDataFrame(
        [(inside,), (overlapping,), (outside,), (touching,), (edge_aligned,)], "g string"
    )
    assert _vals(df, C.is_geo_intersects("g", SQUARE)) == [False, False, True, False, False]
    assert _vals(df, C.is_geo_within("g", SQUARE)) == [False, True, True, True, False]
    assert _vals(df, C.is_geo_covers("g", SQUARE)) == [False, True, True, True, False]
    assert _vals(df, C.is_geo_contains("g", SQUARE)) == [False, True, True, True, True]
    assert _vals(df, C.is_geo_touches("g", SQUARE)) == [True, True, True, False, True]


def test_has_no_aggr_outliers_accepts_aggr_params(spark, events):
    engine = DQEngine(spark)
    rule = DQDatasetRule(
        check_func=C.has_no_aggr_outliers,
        column="value",
        check_func_kwargs={
            "time_column": "ts",
            "aggr_type": "percentile",
            "aggr_params": {"percentage": 0.5},
        },
    )
    engine.apply_checks(events, [rule]).limit(1).collect()  # plan builds and runs


# ---------------------------------------------------------------------------
# engine-level reference-parity method surface (delegates)
# ---------------------------------------------------------------------------
def test_engine_method_surface(spark, tmp_path):
    import json

    engine = DQEngine(spark)
    checks = [{"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "a"}}}]
    # static validators / local-file round trip
    assert not DQEngine.validate_checks(checks).has_errors
    p = str(tmp_path / "checks.json")
    DQEngine.save_checks_in_local_file(checks, p)
    assert DQEngine.load_checks_from_local_file(p) == checks
    # storage round trip through the engine
    loc = str(tmp_path / "stored.yaml")
    engine.save_checks(checks, loc)
    assert engine.load_checks(loc) == checks
    # result_column_names reflects ExtraParams
    from dqx_spark.engine import ExtraParams

    e2 = DQEngine(spark, extra_params=ExtraParams(result_column_names={"errors": "e"}))
    assert e2.result_column_names["errors"] == "e" and e2.result_column_names["warnings"] == "_warnings"


def test_engine_apply_and_save_in_table(spark, tmp_path):
    from dqx_spark.io import InputConfig, OutputConfig

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame([(1, "x"), (2, None)], "id int, v string").write.parquet(src)
    out = str(tmp_path / "out.parquet")
    metrics_out = str(tmp_path / "metrics.parquet")
    engine = DQEngine(spark)
    metrics = engine.apply_checks_and_save_in_table(
        input_config=InputConfig(src),
        output_config=OutputConfig(out, mode="overwrite"),
        metrics_config=OutputConfig(metrics_out, mode="overwrite"),
        checks=[{"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "v"}}}],
    )
    assert metrics["input_row_count"] == 2 and metrics["error_row_count"] == 1
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(metrics_out).count() >= 4


def test_engine_compute_and_save_summary_metrics(spark, tmp_path):
    from dqx_spark.io import OutputConfig
    from dqx_spark.rule import DQRowRule as RR
    from dqx_spark.functions import is_not_null

    engine = DQEngine(spark)
    df = spark.createDataFrame([(None,), ("x",)], "a string")
    checked = engine.apply_checks(df, [RR(check_func=is_not_null, column="a")])
    metrics = engine.compute_summary_metrics(checked)
    assert metrics["error_row_count"] == 1
    dest = str(tmp_path / "m.parquet")
    engine.save_summary_metrics(metrics, OutputConfig(dest, mode="overwrite"), run_name="t")
    saved = spark.read.parquet(dest)
    assert saved.where("metric_name = 'error_row_count'").collect()[0]["metric_value"] == "1"


def test_engine_save_results_in_table(spark, tmp_path):
    from dqx_spark.io import OutputConfig
    from dqx_spark.rule import DQRowRule as RR
    from dqx_spark.functions import is_not_null

    engine = DQEngine(spark)
    df = spark.createDataFrame([(None,), ("x",)], "a string")
    good, bad = engine.apply_checks_and_split(df, [RR(check_func=is_not_null, column="a")])
    engine.save_results_in_table(
        output_df=good, quarantine_df=bad,
        output_config=OutputConfig(str(tmp_path / "good.parquet"), mode="overwrite"),
        quarantine_config=OutputConfig(str(tmp_path / "bad.parquet"), mode="overwrite"),
    )
    assert spark.read.parquet(str(tmp_path / "good.parquet")).count() == 1
    assert spark.read.parquet(str(tmp_path / "bad.parquet")).count() == 1


# ---------------------------------------------------------------------------
# profiler parity surface
# ---------------------------------------------------------------------------
def test_profiler_table_surface(spark, tmp_path):
    from pyspark.sql import types as T
    from dqx_spark.profiler import DQDltGenerator, DQGenerator, DQProfile, DQProfiler

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i, f"v{i % 3}") for i in range(100)], "id int, v string").write.parquet(src)
    profiler = DQProfiler({"sample_fraction": 1.0, "limit": None})
    stats, profiles = profiler.profile_table(src, spark=spark)
    assert stats["id"]["total"] == 100 and any(p.column == "v" for p in profiles)
    # struct flattening helper
    fields = [
        T.StructField("a", T.IntegerType()),
        T.StructField("s", T.StructType([T.StructField("b", T.StringType())])),
    ]
    flat = DQProfiler.get_columns_or_fields(fields)
    assert [f.name for f in flat] == ["a", "s.b"]
    # generator classes
    rules = DQGenerator.generate_dq_rules(profiles)
    assert any(r["check"]["function"] == "is_not_null" or "is_not_null" in str(r) for r in rules) or rules
    contract_rules = DQGenerator.generate_rules_from_contract(
        {"schema": [{"name": "t", "properties": [{"name": "id", "type": "int", "required": True}]}]}
    )
    assert any(c["check"]["function"] == "is_not_null" for c in contract_rules)
    dlt = DQDltGenerator.generate_dlt_rules([DQProfile(name="is_not_null", column="id")], action="drop")
    assert dlt == ["CONSTRAINT id_is_not_null EXPECT (id IS NOT NULL) ON VIOLATION DROP ROW"]


def test_profiler_tables_for_patterns(spark, tmp_path):
    from dqx_spark.profiler import DQProfiler

    spark.sql("CREATE DATABASE IF NOT EXISTS prof_par")
    spark.createDataFrame([(1,), (2,)], "x int").write.mode("overwrite").saveAsTable("prof_par.alpha")
    spark.createDataFrame([(3,), (4,)], "y int").write.mode("overwrite").saveAsTable("prof_par.beta")
    try:
        out = DQProfiler({"sample_fraction": 1.0}).profile_tables_for_patterns(["prof_par.*"], spark=spark)
        assert set(out) == {"prof_par.alpha", "prof_par.beta"}
        assert out["prof_par.alpha"][0]["x"]["total"] == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS prof_par.alpha")
        spark.sql("DROP TABLE IF EXISTS prof_par.beta")
        spark.sql("DROP DATABASE IF EXISTS prof_par")


# ---------------------------------------------------------------------------
# r4 second-pass review regressions
# ---------------------------------------------------------------------------
def test_geo_relation_rejects_bad_reference(spark):
    df = spark.createDataFrame([("POINT (5 5)",)], "g string")
    with pytest.raises(ValueError):  # literal missing inner parens
        C.is_geo_intersects("g", "POLYGON (0 0, 10 0, 10 10, 0 10, 0 0)")
    with pytest.raises(ValueError):  # unsupported literal type
        C.is_geo_intersects("g", "LINESTRING (0 0, 1 1)")
    # POINT literals are supported since r5 (reference corpus usage)
    out = spark.createDataFrame([("POINT (5 5)",), ("POINT (6 6)",)], "g string").select(
        C.is_geo_intersects("g", "POINT (5 5)").alias("c")
    ).collect()
    assert out[0]["c"] is None and out[1]["c"] is not None
    # per-row reference column: malformed value FAILS the row, never passes
    df2 = spark.createDataFrame([("POINT (5 5)", "JUNK")], "g string, ref string")
    out = df2.select(C.is_geo_intersects("g", F.col("ref")).alias("c")).collect()
    assert out[0]["c"] is not None


def test_compare_datasets_missing_record_visible_under_filter(spark):
    # the coalesced PK makes the engine-level rule filter evaluate on the
    # real missing key instead of NULL
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    ref = spark.createDataFrame([(1, "a"), (99, "z")], "id int, v string")
    engine = DQEngine(spark)
    rule = DQDatasetRule(
        check_func=C.compare_datasets,
        columns=["id"],
        filter="id < 100",
        check_func_kwargs={"ref_columns": ["id"], "ref_df_name": "r", "check_missing_records": True},
    )
    rows = {r["id"]: r["_errors"] for r in engine.apply_checks(df, [rule], ref_dfs={"r": ref}).collect()}
    assert rows[99] is not None  # missing record surfaced with its real key


def test_profiler_staticmethod_instance_call():
    from pyspark.sql import types as T
    from dqx_spark.profiler import DQProfiler

    fields = [T.StructField("a", T.IntegerType())]
    assert [f.name for f in DQProfiler().get_columns_or_fields(fields)] == ["a"]


def test_dlt_action_validation():
    from dqx_spark.profiler import DQProfile, generate_dlt_expectations

    p = DQProfile(name="is_not_null", column="x")
    assert "DROP ROW" in generate_dlt_expectations([p], action="Drop")[0]  # case-insensitive
    with pytest.raises(ValueError):
        generate_dlt_expectations([p], action="faill")


def test_llm_user_input_reaches_prompt(spark):
    from dqx_spark.llm import build_rules_prompt

    df = spark.createDataFrame([(1,)], "a int")
    assert "only emails" in build_rules_prompt(df, user_input="only emails")
