"""WKT-lite geo checks."""

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.engine import ExtraParams

RUN_TS = "2024-06-01 00:00:00"


def fired_ids(spark, df, rule, id_col="id"):
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule])
    return {r[id_col] for r in checked.where(F.col("_errors").isNotNull()).collect()}


WKT_ROWS = [
    (0, "POINT (1.5 2.5)"),
    (1, "POINT (0 0)"),
    (2, "LINESTRING (0 0, 1 1, 2 2)"),
    (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
    (4, "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"),
    (5, "POINT EMPTY"),
    (6, "NOT A SHAPE"),
    (7, None),
    (8, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"),
]


def test_wkt_validity_and_types(spark):
    df = spark.createDataFrame(WKT_ROWS, "id int, g string")
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_geometry, column="g")) == {6}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_point, column="g")) == {2, 3, 4, 6, 8}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_polygon, column="g")) == {0, 1, 2, 5, 6, 8}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_linestring, column="g")) == {0, 1, 3, 4, 5, 6, 8}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_non_empty_geometry, column="g")) == {5}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_not_null_island, column="g")) == {1}


def test_coordinate_bands(spark):
    df = spark.createDataFrame(WKT_ROWS, "id int, g string")
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_x_coordinate_between, column="g", check_func_kwargs={"min_value": 0, "max_value": 5}),
    ) == {4}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_y_coordinate_between, column="g", check_func_kwargs={"min_value": -180, "max_value": 11}),
    ) == {4}


def test_polygons_mutually_disjoint(spark):
    rows = [
        (0, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (1, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),   # overlaps 0
        (2, "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    rule = DQDatasetRule(check_func=C.are_polygons_mutually_disjoint, column="g")
    assert fired_ids(spark, df, rule) == {0, 1}
