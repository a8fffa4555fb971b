"""Isolation-forest anomaly lifecycle: fit determinism, planted-outlier
detection, registry round-trip, model-backed check, drift PSI."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dqx_spark import DQDatasetRule, DQEngine, anomaly
from dqx_spark.engine import ExtraParams
import dqx_spark.functions as C


def _engine():
    return DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))


@pytest.fixture(scope="module")
def cluster_df(spark):
    # 500 inliers in a tight 2D cluster + 5 far outliers
    rng = np.random.RandomState(0)
    rows = [(i, float(10 + rng.randn()), float(20 + rng.randn())) for i in range(500)]
    rows += [(900 + j, 500.0 + j, -400.0 - j) for j in range(5)]
    return spark.createDataFrame(rows, "id long, a double, b double")


def test_fit_is_deterministic(cluster_df):
    m1 = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=16, seed=11)
    m2 = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=16, seed=11)
    assert m1["trees"] == m2["trees"]
    assert m1["score_threshold"] == m2["score_threshold"]


def test_outliers_score_highest(cluster_df):
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=32, seed=3)
    scored = anomaly.score_with_model(cluster_df, model).orderBy(F.desc("anomaly_score"))
    top5 = {r["id"] for r in scored.limit(5).collect()}
    assert top5 == {900, 901, 902, 903, 904}


def test_model_backed_check_flags_outliers(spark, cluster_df):
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=32, seed=3)
    rule = DQDatasetRule(
        check_func=C.has_no_row_anomalies,
        check_func_kwargs={"columns": ["a", "b"], "model": model},
    )
    checked = _engine().apply_checks(cluster_df, [rule])
    flagged = {r["id"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    assert {900, 901, 902, 903, 904} <= flagged
    # calibrated threshold keeps false-positive rate near contamination=1%
    assert len(flagged) <= 25


def test_registry_round_trip(spark, cluster_df, tmp_path):
    registry = str(tmp_path / "registry")
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=8, seed=5)
    mid = anomaly.save_model(spark, model, registry)
    loaded = anomaly.load_model(spark, registry, model_id=mid)
    assert loaded["trees"] == model["trees"]
    # newest-wins load: save a second model, latest should win
    model2 = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=8, seed=6)
    model2["created_at"] = "2999-01-01T00:00:00+00:00"
    anomaly.save_model(spark, model2, registry)
    assert anomaly.load_model(spark, registry)["model_id"] == model2["model_id"]


def test_feature_drift_psi(spark, cluster_df):
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=8, seed=5)
    same = anomaly.feature_drift(cluster_df, model)
    assert all(v < 0.1 for v in same.values()), same
    shifted = cluster_df.select("id", (F.col("a") + 100).alias("a"), "b")
    moved = anomaly.feature_drift(shifted, model)
    assert moved["a"] > 1.0, moved
    assert moved["b"] < 0.1, moved
