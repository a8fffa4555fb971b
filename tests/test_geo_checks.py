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


def test_polygons_disjoint_exact_refinement(spark):
    # two diamonds with OVERLAPPING bounding boxes but disjoint geometry:
    # the exact predicate must NOT flag them (a bbox approximation would)
    rows = [
        (0, "POLYGON ((1 0, 2 1, 1 2, 0 1, 1 0))"),          # diamond at (1,1)
        (1, "POLYGON ((2.9 1.9, 3.9 2.9, 2.9 3.9, 1.9 2.9, 2.9 1.9))"),  # diamond at (2.9,2.9): bbox overlap, L1 3.8 > 2
        (2, "POLYGON ((50 50, 52 50, 52 52, 50 52, 50 50))"),  # far away
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    exact = DQDatasetRule(check_func=C.are_polygons_mutually_disjoint, column="g")
    assert fired_ids(spark, df, exact) == set()
    approx = DQDatasetRule(
        check_func=C.are_polygons_mutually_disjoint, column="g", check_func_kwargs={"exact": False}
    )
    assert fired_ids(spark, df, approx) == {0, 1}


def test_exact_geometry_family(spark):
    rows = [
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),      # square, area 4, valid
        (1, "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"),      # bowtie: self-intersecting, area 0
        (2, "POLYGON ((0 0, 1 1))"),                      # open 2-point ring
        (3, "POINT (5 5)"),
        (4, "LINESTRING (0 0, 1 1, 2 0)"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_area_between, column="g", check_func_kwargs={"min_area": 1.0, "max_area": 10.0}),
    ) == {1, 2, 3, 4}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_num_points_between, column="g", check_func_kwargs={"min_points": 3, "max_points": 10}),
    ) == {2, 3}
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.has_dimension, column="g", check_func_kwargs={"dimension": 2})
    ) == {3, 4}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_ogc_valid, column="g")) == {1, 2}


def test_geography_and_geofence(spark):
    rows = [
        (0, "POINT (10 10)"),
        (1, "POINT (200 10)"),                            # off-globe longitude
        (2, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),       # crosses the fence edge
        (3, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),       # fully within the fence
        (4, "POINT (50 50)"),                             # outside the fence
        (5, "junk"),
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_geography, column="g")) == {1, 5}
    fence = "POLYGON((0 0, 3 0, 3 3, 0 3, 0 0))"
    inside = DQRowRule(check_func=C.is_in_geofence, column="g", check_func_kwargs={"geofence_wkt": fence})
    # intersects-predicate: point 0 outside fence? (10,10) outside -> fails
    assert fired_ids(spark, df, inside) == {0, 1, 4, 5}
    within = DQRowRule(
        check_func=C.is_in_geofence, column="g",
        check_func_kwargs={"geofence_wkt": fence, "predicate": "within"},
    )
    # 'within' additionally rejects the fence-crossing polygon 2
    assert fired_ids(spark, df, within) == {0, 1, 2, 4, 5}
    outside = DQRowRule(
        check_func=C.is_not_in_geofence, column="g", check_func_kwargs={"geofence_wkt": fence}
    )
    assert fired_ids(spark, df, outside) == {2, 3}


def test_polygons_disjoint_donut_holes(spark):
    # interior rings respected: a polygon entirely inside another's HOLE is
    # disjoint; one overlapping the hole boundary intersects
    donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    rows = [
        (0, donut),
        (1, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),      # inside the hole -> disjoint
        (2, "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"),  # far away
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    rule = DQDatasetRule(check_func=C.are_polygons_mutually_disjoint, column="g")
    assert fired_ids(spark, df, rule) == set()

    rows2 = [
        (0, donut),
        (1, "POLYGON ((4 4, 8 4, 8 8, 4 8, 4 4))"),  # crosses the hole boundary -> intersects
    ]
    df2 = spark.createDataFrame(rows2, "id int, g string")
    assert fired_ids(spark, df2, rule) == {0, 1}

    rows3 = [
        (0, donut),
        (1, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),  # in the solid band -> contained
    ]
    df3 = spark.createDataFrame(rows3, "id int, g string")
    assert fired_ids(spark, df3, rule) == {0, 1}


def test_geometrycollection_grammar(spark):
    rows = [
        (0, "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"),
        (1, "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 0)))"),
        (2, "GEOMETRYCOLLECTION EMPTY"),
        (3, "GEOMETRYCOLLECTION (BANANA (1 2))"),
        (4, "POINT (3 4)"),
        (5, "GEOMETRYCOLLECTION (MULTIPOINT (1 2, 3 4))"),
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_geometry, column="g")) == {3}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_non_empty_geometry, column="g")) == {2}
    # collection dimension = max member dimension (0 for EMPTY)
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.has_dimension, column="g", check_func_kwargs={"dimension": 1})
    ) == {1, 2, 3, 4, 5}
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.has_dimension, column="g", check_func_kwargs={"dimension": 2})
    ) == {0, 2, 3, 4, 5}
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.has_dimension, column="g", check_func_kwargs={"dimension": 0})
    ) == {0, 1, 3}
    # every coordinate (members included) on the globe
    df2 = spark.createDataFrame(
        [(0, "GEOMETRYCOLLECTION (POINT (200 10))"), (1, "GEOMETRYCOLLECTION (POINT (20 10))")],
        "id int, g string",
    )
    assert fired_ids(spark, df2, DQRowRule(check_func=C.is_geography, column="g")) == {0}


def test_ogc_valid_interior_rings(spark):
    rows = [
        (0, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"),  # valid donut
        (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 7, 7 3, 3 7, 3 3))"),  # bowtie hole
        (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 3, 3 7))"),  # unclosed hole
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    fired = fired_ids(spark, df, DQRowRule(check_func=C.is_ogc_valid, column="g"))
    assert fired == {1, 2}


def test_geofence_grid_matches_exact(spark):
    # the grid method is an exact short-circuit: identical verdicts to the
    # ray cast on a point cloud spanning interior, exterior, and cells the
    # fence boundary passes through (L-shaped fence -> non-convex)
    fence = "POLYGON((0 0, 10 0, 10 4, 6 4, 6 10, 0 10, 0 0))"
    rows = [(i * 37 % 29, (i * 53 % 31) / 2.3, (i * 71 % 37) / 3.1) for i in range(200)]
    df = spark.createDataFrame(
        [(i, f"POINT ({x} {y})") for i, (_, x, y) in enumerate(rows)], "id int, g string"
    )
    exact = DQRowRule(
        check_func=C.is_in_geofence, column="g", check_func_kwargs={"geofence_wkt": fence}
    )
    grid = DQRowRule(
        check_func=C.is_in_geofence, column="g",
        check_func_kwargs={"geofence_wkt": fence, "method": "grid", "grid_cells": 64},
    )
    assert fired_ids(spark, df, exact) == fired_ids(spark, df, grid)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        C.is_in_geofence("g", fence, method="h4")


def test_polygons_disjoint_containment(spark):
    # one polygon strictly inside another: no edge crossings, still intersect
    rows = [
        (0, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        (1, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),   # contained in 0
        (2, "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"),
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    rule = DQDatasetRule(check_func=C.are_polygons_mutually_disjoint, column="g")
    assert fired_ids(spark, df, rule) == {0, 1}


def test_point_reference_geometry_relations(spark):
    """POINT reference literals (reference corpus usage): exact OGC
    semantics — a positive-area polygon is never within a point, a point
    touches a polygon boundary it sits on, equal points relate."""
    import dqx_spark.functions as C

    df = spark.createDataFrame(
        [
            (1, "POINT(2 2)"),
            (2, "POINT(3 4)"),
            (3, "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"),   # 2 2 strictly inside
            (4, "POLYGON((2 2, 5 2, 5 5, 2 5, 2 2))"),   # 2 2 on boundary
            (5, "POLYGON((10 10, 11 10, 11 11, 10 11, 10 10))"),
        ],
        "id long, g string",
    )

    def fails(check_col):
        out = df.select("id", check_col.alias("c"))
        return {r.id for r in out.collect() if r.c is not None}

    # within POINT(2 2): only the identical point holds
    assert fails(C.is_geo_within("g", "POINT(2 2)")) == {2, 3, 4, 5}
    # intersects: the point itself, interior hit, boundary hit
    assert fails(C.is_geo_intersects("g", "POINT(2 2)")) == {2, 5}
    # touches: boundary contact only
    assert fails(C.is_geo_touches("g", "POINT(2 2)")) == {1, 2, 3, 5}
    # covers (ref covers col): nothing but the equal point
    assert fails(C.is_geo_covers("g", "POINT(2 2)")) == {2, 3, 4, 5}
