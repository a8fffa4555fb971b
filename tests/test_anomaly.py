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


def test_explain_contributions(cluster_df):
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=32, seed=3)
    rows = anomaly.explain_with_model(cluster_df, model).where(F.col("id") >= 900).collect()
    for r in rows:
        contrib = r["anomaly_contributions"]
        # the planted outliers are extreme in BOTH features; each feature's
        # actual value must push the score up vs its median-ablated twin
        assert contrib["a"] > 0 and contrib["b"] > 0, r
    # an inlier's contributions should be near zero
    inlier = anomaly.explain_with_model(cluster_df, model).where(F.col("id") == 0).collect()[0]
    assert all(abs(v) < 0.2 for v in inlier["anomaly_contributions"].values())


def test_segmented_fit_and_score(spark):
    rng = np.random.RandomState(1)
    # segment s0 clusters near 0, s1 near 1000: a value of 500 is anomalous
    # in BOTH segments but would look ordinary to one global model
    rows = [(i, "s0", float(rng.randn())) for i in range(300)]
    rows += [(1000 + i, "s1", float(1000 + rng.randn())) for i in range(300)]
    rows += [(5000, "s0", 500.0), (5001, "s1", 500.0), (5002, "s2", 1e6)]
    df = spark.createDataFrame(rows, "id long, seg string, v double")
    model = anomaly.fit_segmented_isolation_forest(df, ["v"], "seg", num_trees=32, seed=9)
    assert set(model["segments"]) == {"s0", "s1", "s2"}
    rule = DQDatasetRule(
        check_func=C.has_no_row_anomalies, check_func_kwargs={"columns": ["v"], "model": model}
    )
    checked = _engine().apply_checks(df, [rule])
    flagged = {r["id"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    assert {5000, 5001} <= flagged
    assert len(flagged) <= 30
    # registry round-trip keeps the segmented structure
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        anomaly.save_model(spark, model, f"{td}/reg")
        loaded = anomaly.load_model(spark, f"{td}/reg")
        assert loaded["algo"] == "isolation_forest_segmented"
        assert set(loaded["segments"]) == {"s0", "s1", "s2"}


def test_segment_cardinality_guard(spark):
    df = spark.createDataFrame([(i, str(i), float(i)) for i in range(50)], "id long, seg string, v double")
    with pytest.raises(ValueError, match="distinct values"):
        anomaly.fit_segmented_isolation_forest(df, ["v"], "seg", max_segments=10)


def test_feature_drift_psi(spark, cluster_df):
    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=8, seed=5)
    same = anomaly.feature_drift(cluster_df, model)
    assert all(v < 0.1 for v in same.values()), same
    shifted = cluster_df.select("id", (F.col("a") + 100).alias("a"), "b")
    moved = anomaly.feature_drift(shifted, model)
    assert moved["a"] > 1.0, moved
    assert moved["b"] < 0.1, moved


def test_isolation_forest_ensemble_lifecycle(spark, tmp_path):
    """Ensemble fit -> registry round-trip -> scoring = mean of member
    scores; an obvious outlier scores above the calibrated threshold."""
    import numpy as np

    from dqx_spark import anomaly

    rows = [(float(i % 10), float((i * 7) % 10)) for i in range(500)] + [(500.0, -500.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    model = anomaly.fit_isolation_forest_ensemble(df, ["x", "y"], n_models=3, num_trees=30, seed=7)
    assert model["algo"] == "isolation_forest_ensemble" and len(model["members"]) == 3
    # distinct member seeds -> distinct forests
    assert len({m["seed"] for m in model["members"]}) == 3

    reg = str(tmp_path / "registry")
    anomaly.save_model(spark, model, reg)
    back = anomaly.load_model(spark, reg)
    assert back["model_id"] == model["model_id"]

    scored = anomaly.score_with_model(df, back).collect()
    outlier = [r for r in scored if r.x == 500.0][0]
    inliers = [r.anomaly_score for r in scored if r.x != 500.0]
    assert outlier.anomaly_score > np.mean(inliers)
    assert outlier.anomaly_score > back["score_threshold"]
    # ensemble score == mean of member scores
    member_scores = [
        [r.anomaly_score for r in anomaly.score_with_model(df, m).collect()]
        for m in model["members"]
    ]
    ens = [r.anomaly_score for r in anomaly.score_with_model(df, model).collect()]
    want = np.mean(member_scores, axis=0)
    assert np.allclose(ens, want)


def test_llm_group_explanations(spark, cluster_df):
    """Group-based LLM explanations: one provider call per (segment,
    pattern) group — never per row — rows in a group share the struct,
    groups beyond max_groups get null, non-JSON replies fall back to raw
    narrative text."""
    import json as _json

    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=32, seed=3)
    scored = anomaly.score_with_model(cluster_df, model)
    explained = anomaly.explain_with_model(scored, model)
    anomalous = explained.where(F.col("anomaly_score") >= model["score_threshold"])

    calls = []

    def provider(prompt):
        calls.append(prompt)
        return _json.dumps(
            {"narrative": f"group #{len(calls)}", "business_impact": "bi", "action": "act"}
        )

    out = anomaly.add_llm_explanations(anomalous, provider, top_n=2, max_groups=20).collect()
    assert out, "expected anomalous rows"
    n_groups = len({r["ai_explanation"]["pattern"] for r in out if r["ai_explanation"]})
    assert len(calls) == n_groups  # one LLM call per group, not per row
    assert all("isolation-forest" in p and "Rows in group" in p for p in calls)
    by_pattern = {}
    for r in out:
        e = r["ai_explanation"]
        assert e is not None and e["group_size"] >= 1 and e["business_impact"] == "bi"
        by_pattern.setdefault(e["pattern"], set()).add(e["narrative"])
    # every row of a group carries the SAME narrative
    assert all(len(v) == 1 for v in by_pattern.values())

    # budget: max_groups=1 keeps only the largest group, others null
    calls.clear()
    capped = anomaly.add_llm_explanations(anomalous, provider, top_n=2, max_groups=1).collect()
    assert len(calls) == 1
    assert any(r["ai_explanation"] is None for r in capped) or n_groups == 1

    # non-JSON reply: raw text becomes the narrative, empty impact/action
    raw = anomaly.add_llm_explanations(
        anomalous, lambda p: "just words", top_n=2, max_groups=20
    ).collect()
    assert all(r["ai_explanation"]["narrative"] == "just words" for r in raw if r["ai_explanation"])

    # segmentation flows into the group key and the prompt
    seg_calls = []

    def seg_provider(prompt):
        seg_calls.append(prompt)
        return "{}"

    seg_df = anomalous.withColumn("region", F.when(F.col("id") % 2 == 0, "us").otherwise("eu"))
    anomaly.add_llm_explanations(seg_df, seg_provider, segment_cols=["region"], max_groups=20).collect()
    assert any("region=us" in p for p in seg_calls) and any("region=eu" in p for p in seg_calls)


def test_exact_shap_values(spark, cluster_df):
    """True-SHAP surface computed natively on the numpy forest: the
    efficiency axiom holds exactly (sum(phi) == score - base score), a
    never-split (dummy) feature gets phi == 0, planted outliers get
    positive phi on both extreme features, and the width guard refuses
    exponential blowups."""
    import math

    from dqx_spark.anomaly import _c, _exact_shap_row, _score_payload, _tree_expected_path
    from dqx_spark.errors import ComputationError

    model = anomaly.fit_isolation_forest(cluster_df, ["a", "b"], num_trees=16, seed=5)
    payload = _score_payload(model)
    scored = anomaly.score_with_model(cluster_df, model)
    shapped = anomaly.shap_explain(scored, model).where(F.col("id").isin(0, 900, 904))
    rows = {r["id"]: r for r in shapped.collect()}

    # efficiency: sum(phi) == v(full) - v(empty), both recomputed here
    c_n = _c(float(payload["sample_size"]))
    base_path = sum(
        _tree_expected_path(t, [0.0, 0.0], [0, 0]) for t in payload["trees"]
    ) / len(payload["trees"])
    base_score = 2.0 ** (-base_path / c_n)
    for rid, r in rows.items():
        phi = r["anomaly_shap"]
        assert math.isclose(
            sum(phi.values()), r["anomaly_score"] - base_score, rel_tol=1e-9, abs_tol=1e-9
        ), rid
    # outliers: both extreme features push the score UP
    assert rows[900]["anomaly_shap"]["a"] > 0 and rows[900]["anomaly_shap"]["b"] > 0
    # signs agree with the median-ablation heuristic on the outliers
    abl = {
        r["id"]: r["anomaly_contributions"]
        for r in anomaly.explain_with_model(cluster_df, model).where(F.col("id").isin(900, 904)).collect()
    }
    for rid in (900, 904):
        for f in ("a", "b"):
            assert (rows[rid]["anomaly_shap"][f] > 0) == (abl[rid][f] > 0)

    # dummy axiom: a constant feature is never split on -> phi exactly 0
    df2 = cluster_df.withColumn("const", F.lit(1.0))
    m2 = anomaly.fit_isolation_forest(df2, ["a", "const"], num_trees=8, seed=7)
    out2 = anomaly.shap_explain(df2.limit(20), m2).collect()
    assert all(r["anomaly_shap"]["const"] == 0.0 for r in out2)

    # direct row check: _exact_shap_row matches the udf path
    phis = _exact_shap_row(payload, [500.0, -400.0], 2)
    assert phis[0] > 0 and phis[1] > 0

    # width guard
    wide = dict(model)
    wide["columns"] = [f"f{i}" for i in range(11)]
    import pytest as _pytest

    with _pytest.raises(ComputationError, match="max_features"):
        anomaly.shap_explain(cluster_df, wide)


def test_feature_drift_return_counts(spark):
    """r7: the gate's PSI columns depend on the counts payload — pin its
    shape (one int list per feature, bins = edges+1, sums = row count) and
    the loud ensemble rejection BEFORE any per-member Spark work."""
    import pytest

    from dqx_spark import anomaly

    df = spark.createDataFrame([(i, float(i % 50), float(i)) for i in range(300)], "k long, a double, b double")
    model = anomaly.fit_isolation_forest(df, ["a", "b"], num_trees=4, sample_size=64, seed=3)
    psi_only = anomaly.feature_drift(df, model)
    psi, counts = anomaly.feature_drift(df, model, return_counts=True)
    assert psi == psi_only
    for c in ("a", "b"):
        assert len(counts[c]) == len(model["hist"][c]["edges"]) + 1
        assert all(isinstance(v, int) for v in counts[c])
        assert sum(counts[c]) == 300
    ensemble = anomaly.fit_isolation_forest_ensemble(df, ["a", "b"], n_models=2, num_trees=2, sample_size=32)
    with pytest.raises(ValueError, match="ensemble"):
        anomaly.feature_drift(df, ensemble, return_counts=True)
