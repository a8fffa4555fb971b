"""Unit tests for checks that previously had only gate coverage:
has_valid_schema, has_no_outliers, aggr_matches_dataset — plus the geo-lite
lat/long and built-in PII row checks."""

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.engine import ExtraParams

RUN_TS = "2024-06-01 00:00:00"


def fired_ids(spark, df, rule, ref_dfs=None, id_col="id"):
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule], ref_dfs=ref_dfs)
    return {r[id_col] for r in checked.where(F.col("_errors").isNotNull() | F.col("_warnings").isNotNull()).collect()}


# ---------------------------------------------------------------------------
# has_valid_schema
# ---------------------------------------------------------------------------
def test_has_valid_schema_permissive_and_strict(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, name string, score double")
    # permissive: expected subset with compatible types -> pass
    ok = DQDatasetRule(
        check_func=C.has_valid_schema, check_func_kwargs={"expected_schema": "id int, name string"}
    )
    assert fired_ids(spark, df, ok) == set()
    # permissive: missing expected column -> every row fires
    missing = DQDatasetRule(
        check_func=C.has_valid_schema, check_func_kwargs={"expected_schema": "id int, missing_col string"}
    )
    assert fired_ids(spark, df, missing) == {1}
    # strict: exact schema in order -> pass; any extra column -> fail
    strict_ok = DQDatasetRule(
        check_func=C.has_valid_schema,
        check_func_kwargs={"expected_schema": "id int, name string, score double", "strict": True},
    )
    assert fired_ids(spark, df, strict_ok) == set()
    strict_bad = DQDatasetRule(
        check_func=C.has_valid_schema,
        check_func_kwargs={"expected_schema": "id int, name string", "strict": True},
    )
    assert fired_ids(spark, df, strict_bad) == {1}


def test_has_valid_schema_ref_df_and_exclude(spark):
    df = spark.createDataFrame([(1, "a", 9.9)], "id int, name string, extra double")
    ref = spark.createDataFrame([(2, "b")], "id int, name string")
    rule = DQDatasetRule(
        check_func=C.has_valid_schema,
        check_func_kwargs={"ref_df_name": "r", "strict": True, "exclude_columns": ["extra"]},
    )
    assert fired_ids(spark, df, rule, ref_dfs={"r": ref}) == set()


def test_has_valid_schema_type_incompatibility(spark):
    df = spark.createDataFrame([(1, "x")], "id int, v string")
    rule = DQDatasetRule(check_func=C.has_valid_schema, check_func_kwargs={"expected_schema": "id int, v double"})
    assert fired_ids(spark, df, rule) == {1}


# ---------------------------------------------------------------------------
# has_no_outliers (MAD band)
# ---------------------------------------------------------------------------
def test_has_no_outliers_mad_band(spark):
    # values 10..19 plus one gross outlier; median=~14.5, MAD small
    rows = [(i, float(10 + i)) for i in range(10)] + [(99, 1000.0)]
    df = spark.createDataFrame(rows, "id int, v double")
    rule = DQDatasetRule(check_func=C.has_no_outliers, column="v", check_func_kwargs={"k": 3.5})
    assert fired_ids(spark, df, rule) == {99}
    # approx path flags the same gross outlier
    rule_approx = DQDatasetRule(
        check_func=C.has_no_outliers, column="v", check_func_kwargs={"k": 3.5, "approx": True}
    )
    assert fired_ids(spark, df, rule_approx) == {99}


def test_has_no_outliers_row_filter(spark):
    # the outlier sits outside the filter -> nothing fires
    rows = [(i, float(i % 10), "in") for i in range(20)] + [(99, 500.0, "out")]
    df = spark.createDataFrame(rows, "id int, v double, grp string")
    rule = DQDatasetRule(
        check_func=C.has_no_outliers, column="v", check_func_kwargs={"k": 3.5, "row_filter": "grp = 'in'"}
    )
    assert fired_ids(spark, df, rule) == set()


# ---------------------------------------------------------------------------
# aggr_matches_dataset
# ---------------------------------------------------------------------------
def test_aggr_matches_dataset_scalar(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    ref_same = spark.createDataFrame([(i,) for i in range(100, 110)], "rid int")
    ref_diff = spark.createDataFrame([(i,) for i in range(3)], "rid int")
    rule = DQDatasetRule(
        check_func=C.aggr_matches_dataset,
        column="id",
        check_func_kwargs={"ref_column": "rid", "aggr_type": "count", "ref_df_name": "r"},
    )
    assert fired_ids(spark, df, rule, ref_dfs={"r": ref_same}) == set()
    assert fired_ids(spark, df, rule, ref_dfs={"r": ref_diff}) == set(range(10))


def test_aggr_matches_dataset_grouped_with_tolerance(spark):
    df = spark.createDataFrame([("a", 10.0), ("a", 20.0), ("b", 5.0)], "g string, v double")
    # ref sums: a=30.6 (within 5% rel tol of 30), b=50 (way off)
    ref = spark.createDataFrame([("a", 30.6), ("b", 50.0)], "rg string, rv double")
    rule = DQDatasetRule(
        check_func=C.aggr_matches_dataset,
        column="v",
        check_func_kwargs={
            "ref_column": "rv",
            "aggr_type": "sum",
            "group_by": ["g"],
            "ref_group_by": ["rg"],
            "ref_df_name": "r",
            "rel_tolerance": 0.05,
        },
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule], ref_dfs={"r": ref})
    failed_groups = {r["g"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    assert failed_groups == {"b"}


def test_aggr_matches_dataset_missing_group_fails(spark):
    # a group present in df but absent from ref must fire (null-unsafe compare)
    df = spark.createDataFrame([("a", 1.0), ("c", 2.0)], "g string, v double")
    ref = spark.createDataFrame([("a", 1.0)], "rg string, rv double")
    rule = DQDatasetRule(
        check_func=C.aggr_matches_dataset,
        column="v",
        check_func_kwargs={
            "ref_column": "rv",
            "aggr_type": "sum",
            "group_by": ["g"],
            "ref_group_by": ["rg"],
            "ref_df_name": "r",
        },
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule], ref_dfs={"r": ref})
    failed_groups = {r["g"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    assert failed_groups == {"c"}


# ---------------------------------------------------------------------------
# geo-lite + PII row checks
# ---------------------------------------------------------------------------
def test_is_latitude_longitude(spark):
    df = spark.createDataFrame(
        [(0, "45.5", "120.0"), (1, "95.0", "181.0"), (2, "junk", "junk"), (3, None, None), (4, "-90", "-180")],
        "id int, lat string, lon string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_latitude, column="lat")) == {1, 2}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_longitude, column="lon")) == {1, 2}


def test_does_not_contain_pii(spark):
    df = spark.createDataFrame(
        [
            (0, "clean text here"),
            (1, "my ssn is 123-45-6789 ok"),
            (2, "mail me at a.b@example.org please"),
            (3, "card 4111 1111 1111 1111"),
            (4, None),
        ],
        "id int, t string",
    )
    all_entities = DQRowRule(check_func=C.does_not_contain_pii, column="t")
    assert fired_ids(spark, df, all_entities) == {1, 2, 3}
    only_ssn = DQRowRule(
        check_func=C.does_not_contain_pii, column="t", check_func_kwargs={"entities": ["US_SSN"]}
    )
    assert fired_ids(spark, df, only_ssn) == {1}
