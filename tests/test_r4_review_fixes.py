"""Regression tests for the round-4 core review findings (engine / rule /
serde / functions)."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.engine import DQEngine
from dqx_spark.rule import DQForEachColRule, DQRowRule
from dqx_spark.serde import semantic_validate, validate_checks
from dqx_spark.functions.row_checks import is_not_null, sql_expression
from dqx_spark.functions.geo_checks import is_in_geofence, are_polygons_mutually_disjoint


def _errors_fired(df, n_expected):
    rows = df.collect()
    return sum(1 for r in rows if r["_errors"] is not None) == n_expected


def test_column_expression_rule_runs_instead_of_skipping(spark):
    # review #1: a Column-expression column arg used to probe its NORMALIZED
    # name and always skip
    df = spark.createDataFrame([("x",), (None,)], "a string")
    rule = DQRowRule(check_func=is_not_null, column=F.upper(F.col("a")))
    out = DQEngine(spark).apply_checks(df, [rule]).collect()
    fired = [r for r in out if r["_errors"] is not None]
    assert len(fired) == 1
    assert fired[0]["_errors"][0]["skipped"] is False


def test_column_expression_unresolvable_still_skips(spark):
    df = spark.createDataFrame([("x",)], "a string")
    rule = DQRowRule(check_func=is_not_null, column=F.upper(F.col("missing")))
    out = DQEngine(spark).apply_checks(df, [rule]).collect()
    assert out[0]["_errors"][0]["skipped"] is True


def test_cache_not_shared_between_colliding_fingerprints(spark):
    # review #2: F.col('a b')-style expression and plain 'a_b' normalize to
    # the same fingerprint; the cache must not hand one the other's condition
    df = spark.createDataFrame([(None, "ok"), ("ok", None)], "a_b string, `a b` string")
    r1 = DQRowRule(check_func=is_not_null, column=F.col("a b"))
    r2 = DQRowRule(check_func=is_not_null, column="a_b")
    assert r1.fingerprint() == r2.fingerprint()  # the collision is real
    out = DQEngine(spark).apply_checks(df, [r1, r2]).collect()
    # row 0: a_b null -> r2 fires; row 1: a.b null -> r1 fires
    assert all(r["_errors"] is not None and len(r["_errors"]) == 1 for r in out)


def test_sql_expression_negate_null_passes(spark):
    # review #4: under negate, fail only when the expression HOLDS; a NULL
    # expression does not hold (reference check_funcs.py:546-554 semantics)
    df = spark.createDataFrame([(None,), (10,), (1,)], "v int")
    cond = sql_expression("v > 5", negate=True)
    vals = df.select(cond.alias("c")).collect()
    assert vals[0]["c"] is None  # NULL expr -> pass
    assert vals[1]["c"] is not None  # holds -> fail
    assert vals[2]["c"] is None  # does not hold -> pass


def test_semantic_validate_unknown_function_warns_not_crashes():
    # review #5: used to die with AttributeError in _auto_name
    warnings = semantic_validate([
        {"check": {"function": "bogus_fn", "arguments": {"column": "a"}}},
        {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "a"}}},
        {"criticality": "error", "check": {"function": "is_null", "arguments": {"column": "a"}}},
    ])
    assert any("not semantically validated" in w for w in warnings)
    assert any("contradictory" in w for w in warnings)


def test_validate_checks_flags_missing_column_argument():
    # review #6: column/columns are only injected via for_each_column
    status = validate_checks([{"check": {"function": "is_not_null"}}])
    assert status.has_errors and "column" in str(status)
    ok = validate_checks([{"check": {"function": "is_not_null", "for_each_column": ["a", "b"]}}])
    assert not ok.has_errors


def test_for_each_column_forwards_message_expr(spark):
    # review #7: message_expr (and name) were dropped on the fan-out path
    df = spark.createDataFrame([(None, None)], "a string, b string")
    engine = DQEngine(spark)
    out = engine.apply_checks_by_metadata(
        df,
        [{
            "criticality": "error",
            "check": {"function": "is_not_null", "for_each_column": ["a", "b"]},
            "message_expr": "'custom-msg'",
        }],
    ).collect()
    msgs = [e["message"] for e in out[0]["_errors"]]
    assert msgs == ["custom-msg", "custom-msg"]


def test_grid_geofence_concave_notch_matches_exact(spark):
    # review #3: a concave notch smaller than one grid cell used to be
    # swallowed into a fully-interior cell
    # fence: unit square with a thin notch cut into the right edge at y~0.5
    fence = (
        "POLYGON ((0 0, 1 0, 1 0.499, 0.001 0.4995, 1 0.501, 1 1, 0 1, 0 0))"
    )
    pts = [
        ("POINT (0.5 0.4995)",),  # inside the notch -> OUTSIDE the fence
        ("POINT (0.5 0.25)",),    # plainly inside
        ("POINT (1.5 0.5)",),     # plainly outside
    ]
    df = spark.createDataFrame(pts, "g string")
    for grid_cells in (16, 4096):
        exact = df.select(is_in_geofence("g", fence, method="exact").alias("c")).collect()
        grid = df.select(
            is_in_geofence("g", fence, method="grid", grid_cells=grid_cells).alias("c")
        ).collect()
        assert [r["c"] is None for r in exact] == [r["c"] is None for r in grid], grid_cells
    assert exact[0]["c"] is not None and exact[1]["c"] is None and exact[2]["c"] is not None


def test_polygon_disjoint_empty_input_and_laziness(spark):
    # review #9: plan construction must not run Spark actions; empty input
    # must produce an unflagged (empty) result rather than crash
    empty = spark.createDataFrame([], "g string")
    engine = DQEngine(spark)
    from dqx_spark.rule import DQDatasetRule

    rule = DQDatasetRule(check_func=are_polygons_mutually_disjoint, column="g")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    checked = engine.apply_checks(empty, [rule])  # plan only — no action yet
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "apply_checks ran a Spark action during plan construction"
    assert checked.count() == 0
