"""ML anomaly lifecycle: isolation-forest training, model registry,
distributed scoring, and drift detection — no sklearn dependency.

Mirrors the reference's anomaly module surface (anomaly/core.py:45-243:
sample -> fit -> persist -> score; anomaly/check_funcs.py:119-285: the
model-backed ``has_no_row_anomalies`` check), re-derived Spark-first:

- **fit** happens on a BOUNDED driver sample (deterministic top-k by hash,
  which Spark executes as TakeOrdered — no full sort/shuffle at 100 TB),
  using a pure-numpy isolation forest (random feature, random split in the
  node's range, depth cap ``ceil(log2(psi))`` — Liu et al. 2008).
- **models are JSON rows** in a registry table or parquet path: append-only,
  newest wins, loadable by id.
- **scoring is distributed**: the fitted trees broadcast inside an
  Arrow-batched pandas UDF; traversal is vectorized across the batch
  (max_depth iterations of numpy fancy-indexing per tree, not per-row
  recursion).
- **drift** = Population Stability Index per feature against the training
  sample's quantile histogram, computed with one Spark aggregate; only the
  per-bin counts (cols x bins scalars) reach the driver.
"""

from __future__ import annotations
from dqx_spark.errors import ComputationError, ModelLoadError

import json
import math
import uuid
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "fit_isolation_forest",
    "fit_isolation_forest_on_sample",
    "fit_segmented_isolation_forest",
    "save_model",
    "load_model",
    "score_with_model",
    "explain_with_model",
    "shap_explain",
    "add_llm_explanations",
    "feature_drift",
]

_REGISTRY_SCHEMA = "model_id string, created_at string, columns string, payload string"


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    if n == 2:
        return 1.0
    h = math.log(n - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_tree(x: np.ndarray, rng: np.random.RandomState, max_depth: int) -> dict:
    """One isolation tree as flat arrays (feature=-1 marks a leaf; ``size``
    feeds the c(n) leaf adjustment at scoring time)."""
    feature: list[int] = []
    threshold: list[float] = []
    left: list[int] = []
    right: list[int] = []
    size: list[int] = []

    def grow(idx: np.ndarray, depth: int) -> int:
        node = len(feature)
        feature.append(-1)
        threshold.append(0.0)
        left.append(-1)
        right.append(-1)
        size.append(int(idx.size))
        if depth >= max_depth or idx.size <= 1:
            return node
        sub = x[idx]
        spans = sub.max(axis=0) - sub.min(axis=0)
        nonconst = np.flatnonzero(spans > 0)
        if nonconst.size == 0:
            return node
        f = int(rng.choice(nonconst))
        lo, hi = float(sub[:, f].min()), float(sub[:, f].max())
        t = float(rng.uniform(lo, hi))
        mask = sub[:, f] < t
        if not mask.any() or mask.all():
            return node
        feature[node] = f
        threshold[node] = t
        left[node] = grow(idx[mask], depth + 1)
        right[node] = grow(idx[~mask], depth + 1)
        return node

    grow(np.arange(x.shape[0]), 0)
    return {"feature": feature, "threshold": threshold, "left": left, "right": right, "size": size}


def _score_matrix(x: np.ndarray, model: dict) -> np.ndarray:
    """Vectorized anomaly scores in [0, 1] (higher = more isolated)."""
    n = x.shape[0]
    if n == 0:
        return np.empty(0)
    total_path = np.zeros(n)
    max_depth = int(model["max_depth"])
    for tree in model["trees"]:
        feature = np.asarray(tree["feature"], dtype=np.int64)
        threshold = np.asarray(tree["threshold"], dtype=np.float64)
        left = np.asarray(tree["left"], dtype=np.int64)
        right = np.asarray(tree["right"], dtype=np.int64)
        size = np.asarray(tree["size"], dtype=np.float64)
        node = np.zeros(n, dtype=np.int64)
        depth = np.zeros(n)
        for _ in range(max_depth + 1):
            f = feature[node]
            active = f >= 0
            if not active.any():
                break
            fa = np.where(active, f, 0)
            go_left = x[np.arange(n), fa] < threshold[node]
            nxt = np.where(go_left, left[node], right[node])
            node = np.where(active, nxt, node)
            depth += active
        leaf_sizes = size[node]
        safe = np.maximum(leaf_sizes, 3.0)
        big = 2.0 * (np.log(safe - 1.0) + 0.5772156649015329) - 2.0 * (safe - 1.0) / safe
        adj = np.where(leaf_sizes <= 1, 0.0, np.where(leaf_sizes == 2, 1.0, big))
        total_path += depth + adj
    mean_path = total_path / len(model["trees"])
    return 2.0 ** (-mean_path / _c(float(model["sample_size"])))


def _impute(pdf: pd.DataFrame, columns: list[str], medians: list[float]) -> np.ndarray:
    x = pdf[columns].astype(float)
    for c, m in zip(columns, medians):
        x[c] = x[c].fillna(m)
    return x.to_numpy()


def fit_isolation_forest_on_sample(
    sample_pdf: pd.DataFrame,
    columns: list[str],
    num_trees: int = 64,
    sample_size: int = 256,
    contamination: float = 0.01,
    seed: int = 42,
    drift_bins: int = 10,
) -> dict:
    """Numpy core of :func:`fit_isolation_forest`: fit on an ALREADY
    MATERIALIZED pandas sample (row order matters — the seeded RNG draws
    tree subsamples by position).  Public so a driver-local twin can fit
    the bit-identical model from the same sample for distributed-vs-local
    parity checks (the gate's ``anomaly_train_score`` oracle)."""
    if sample_pdf.empty:
        raise ComputationError("cannot fit an isolation forest on an empty training sample")
    medians = [float(sample_pdf[c].median()) if sample_pdf[c].notna().any() else 0.0 for c in columns]
    x = _impute(sample_pdf, columns, medians)
    rng = np.random.RandomState(seed)
    psi = min(int(sample_size), max(x.shape[0], 2))
    max_depth = max(1, math.ceil(math.log2(max(psi, 2))))
    trees = []
    for _ in range(int(num_trees)):
        idx = rng.choice(x.shape[0], size=min(psi, x.shape[0]), replace=False)
        trees.append(_build_tree(x[idx], rng, max_depth))
    model = {
        "model_id": uuid.uuid4().hex,
        "created_at": datetime.now(timezone.utc).isoformat(),
        "algo": "isolation_forest",
        "columns": list(columns),
        "num_trees": int(num_trees),
        "sample_size": psi,
        "max_depth": max_depth,
        "seed": int(seed),
        "medians": medians,
        "train_rows": int(x.shape[0]),
        "trees": trees,
    }
    train_scores = _score_matrix(x, model)
    model["score_threshold"] = float(np.quantile(train_scores, 1.0 - contamination))
    # quantile histogram of the training sample, for PSI drift at score time
    hist = {}
    for i, c in enumerate(columns):
        edges = np.unique(np.quantile(x[:, i], np.linspace(0, 1, drift_bins + 1)[1:-1]))
        counts, _ = np.histogram(x[:, i], bins=np.concatenate(([-np.inf], edges, [np.inf])))
        hist[c] = {"edges": [float(e) for e in edges], "counts": [int(v) for v in counts]}
    model["hist"] = hist
    return model


def fit_isolation_forest(
    df: DataFrame,
    columns: list[str],
    num_trees: int = 64,
    sample_size: int = 256,
    max_samples: int = 65536,
    contamination: float = 0.01,
    seed: int = 42,
    drift_bins: int = 10,
    sample_order_by: list[str] | None = None,
) -> dict:
    """Fit on a deterministic bounded sample and return a JSON-able model.

    The sample is the ``max_samples`` rows with the smallest
    ``xxhash64(columns, seed)`` — Spark plans orderBy+limit as a TakeOrdered
    (per-partition top-k then merge), so this never full-sorts the input.
    ``sample_order_by`` replaces the hash ordering with named columns (e.g.
    a unique key) — a PORTABLE total order another engine can reproduce
    exactly, used by cross-engine parity fixtures; prefer the default hash
    order in production (a key-ordered prefix biases the sample toward old
    rows).  Because the fit is row-order-dependent by design, a NON-unique
    order key would make the TakeOrdered boundary nondeterministic, so a
    hash of the feature columns is appended as a deterministic tiebreaker
    (rows tying on BOTH the key and every feature are interchangeable in
    the fitted matrix).  ``score_threshold`` is calibrated as the
    (1 - contamination) quantile of the training sample's own scores."""
    if not columns:
        raise ValueError("columns must not be empty")
    cols = [F.col(c).cast("double").alias(c) for c in columns]
    if sample_order_by:
        order_aliases = [f"__dq_ord{i}" for i in range(len(sample_order_by))]
        tiebreak = F.xxhash64(*[F.col(c).cast("double") for c in columns], F.lit(seed))
        sample_pdf = (
            df.select(*cols, *[F.col(c).alias(a) for c, a in zip(sample_order_by, order_aliases)])
            .orderBy(*order_aliases, tiebreak)
            .limit(int(max_samples))
            .toPandas()[list(columns)]
        )
    else:
        sample_pdf = (
            df.select(*cols)
            .orderBy(F.xxhash64(*[F.col(c) for c in columns], F.lit(seed)))
            .limit(int(max_samples))
            .toPandas()
        )
    return fit_isolation_forest_on_sample(
        sample_pdf,
        columns,
        num_trees=num_trees,
        sample_size=sample_size,
        contamination=contamination,
        seed=seed,
        drift_bins=drift_bins,
    )


def fit_segmented_isolation_forest(
    df: DataFrame,
    columns: list[str],
    segment_by: str,
    max_segments: int = 100,
    **fit_kwargs,
) -> dict:
    """One isolation forest per segment value plus a global fallback
    (reference anomaly segmentation: per-segment train/score in
    tests/integration_anomaly).  Distinct segment values are collected
    (guarded by ``max_segments``); each segment fits on its own bounded
    sample; rows from unseen segments score against the fallback.

    Driver orchestration is one action per segment + one for the fallback —
    segmentation is by construction a small-cardinality dimension (region,
    source, product line), so this is bounded, not data-sized."""
    # keys use SPARK's string rendering (cast), not Python str(): scoring
    # matches segments against cast("string") values, and the renderings
    # differ (bool True -> Spark 'true' vs Python 'True') — a Python-keyed
    # map would silently route every row to the fallback (r4 review)
    vals = [
        (r[0], r[1])
        for r in df.select(F.col(segment_by), F.col(segment_by).cast("string"))
        .distinct()
        .limit(max_segments + 1)
        .collect()
    ]
    if len(vals) > max_segments:
        raise ValueError(f"segment_by={segment_by!r} has more than {max_segments} distinct values")
    segments = {}
    for v, v_str in vals:
        if v is None:
            continue
        segments[v_str] = fit_isolation_forest(
            df.where(F.col(segment_by) == F.lit(v)), columns, **fit_kwargs
        )
    fallback = fit_isolation_forest(df, columns, **fit_kwargs)
    return {
        "model_id": uuid.uuid4().hex,
        "created_at": datetime.now(timezone.utc).isoformat(),
        "algo": "isolation_forest_segmented",
        "columns": list(columns),
        "segment_by": segment_by,
        "segments": segments,
        "fallback": fallback,
        # top-level threshold = fallback's, for callers that want one number
        "score_threshold": fallback["score_threshold"],
    }


def _is_segmented(model: dict) -> bool:
    return model.get("algo") == "isolation_forest_segmented"


def _is_ensemble(model: dict) -> bool:
    return model.get("algo") == "isolation_forest_ensemble"


def fit_isolation_forest_ensemble(
    df: DataFrame,
    columns: list[str],
    n_models: int = 3,
    num_trees: int = 100,
    sample_size: int = 256,
    max_samples: int = 65536,
    seed: int = 42,
    contamination: float = 0.01,
) -> dict:
    """Ensemble of independently-seeded forests; the ensemble score is the
    member mean (reference ensemble_training/ensemble_scorer semantics —
    variance reduction against single-forest seed sensitivity).  Same
    registry/threshold/scoring lifecycle as a flat model."""
    if n_models < 1:
        raise ValueError("n_models must be >= 1")
    members = [
        fit_isolation_forest(
            df, columns, num_trees=num_trees, sample_size=sample_size,
            max_samples=max_samples, seed=seed + i, contamination=contamination,
        )
        for i in range(n_models)
    ]
    return {
        "model_id": uuid.uuid4().hex,
        "created_at": datetime.now(timezone.utc).isoformat(),
        "algo": "isolation_forest_ensemble",
        "columns": list(columns),
        "seed": int(seed),
        "n_models": int(n_models),
        "members": members,
        # ensemble threshold: mean of member thresholds (each derives from
        # the same contamination quantile on its own training scores)
        "score_threshold": float(np.mean([m["score_threshold"] for m in members])),
        # top-level imputation stats aggregate ACROSS members (each trains
        # on a differently-seeded sample, so no single member's medians
        # represent the ensemble); scoring still uses per-member medians
        "medians": [
            float(np.mean([m["medians"][i] for m in members]))
            for i in range(len(members[0]["medians"]))
        ],
        "train_rows": int(np.mean([m["train_rows"] for m in members])),
    }


def _is_path(registry: str) -> bool:
    return "/" in registry


def save_model(spark: SparkSession, model: dict, registry: str) -> str:
    """Append the model as one JSON row to the registry (parquet path when
    the name contains '/', otherwise a saveAsTable target).  Returns the
    model_id."""
    row = [
        (
            model["model_id"],
            model["created_at"],
            json.dumps(model["columns"]),
            json.dumps(model),
        )
    ]
    out = spark.createDataFrame(row, _REGISTRY_SCHEMA)
    if _is_path(registry):
        out.write.mode("append").parquet(registry)
    else:
        out.write.mode("append").saveAsTable(registry)
    return model["model_id"]


def load_model(spark: SparkSession, registry: str, model_id: str | None = None) -> dict:
    """Load a model by id, or the newest one."""
    reg = spark.read.parquet(registry) if _is_path(registry) else spark.read.table(registry)
    if model_id is not None:
        rows = reg.where(F.col("model_id") == model_id).limit(1).collect()
    else:
        rows = reg.orderBy(F.col("created_at").desc()).limit(1).collect()
    if not rows:
        raise ModelLoadError(f"no model found in registry {registry!r} (model_id={model_id!r})")
    return json.loads(rows[0]["payload"])


def _score_payload(model: dict) -> dict:
    return {
        "columns": model["columns"],
        "medians": model["medians"],
        "trees": model["trees"],
        "max_depth": model["max_depth"],
        "sample_size": model["sample_size"],
    }


def score_with_model(df: DataFrame, model: dict, score_col: str = "anomaly_score") -> DataFrame:
    """Append the model's anomaly score: Arrow-batched pandas UDF, trees
    broadcast in the closure, traversal vectorized across each batch.
    Segmented models route each row to its segment's forest (fallback for
    unseen segments) inside the same batch."""
    columns = model["columns"]
    if _is_ensemble(model):
        payloads = [_score_payload(m) for m in model["members"]]

        @F.pandas_udf("double")
        def ens_score_udf(*series: pd.Series) -> pd.Series:
            pdf = pd.concat(series, axis=1)
            pdf.columns = columns
            acc = None
            for p in payloads:
                x = _impute(pdf, columns, p["medians"])
                sc = _score_matrix(x, p)
                acc = sc if acc is None else acc + sc
            return pd.Series(acc / len(payloads))

        return df.withColumn(score_col, ens_score_udf(*[F.col(c).cast("double") for c in columns]))

    if _is_segmented(model):
        seg_payloads = {k: _score_payload(m) for k, m in model["segments"].items()}
        fb_payload = _score_payload(model["fallback"])
        segment_by = model["segment_by"]

        @F.pandas_udf("double")
        def seg_score_udf(seg: pd.Series, *series: pd.Series) -> pd.Series:
            pdf = pd.concat(series, axis=1)
            pdf.columns = columns
            out = pd.Series(np.zeros(len(pdf)), index=pdf.index)
            keys = seg.astype(str).where(seg.notna(), None)
            for k, idx in pdf.groupby(keys, dropna=False).groups.items():
                p = seg_payloads.get(k, fb_payload)
                x = _impute(pdf.loc[idx], columns, p["medians"])
                out.loc[idx] = _score_matrix(x, p)
            return out

        return df.withColumn(
            score_col,
            seg_score_udf(F.col(segment_by).cast("string"), *[F.col(c).cast("double") for c in columns]),
        )

    payload = _score_payload(model)

    @F.pandas_udf("double")
    def score_udf(*series: pd.Series) -> pd.Series:
        pdf = pd.concat(series, axis=1)
        pdf.columns = columns
        x = _impute(pdf, columns, payload["medians"])
        return pd.Series(_score_matrix(x, payload))

    return df.withColumn(score_col, score_udf(*[F.col(c).cast("double") for c in columns]))


def explain_with_model(
    df: DataFrame, model: dict, contrib_col: str = "anomaly_contributions"
) -> DataFrame:
    """Append a per-feature contribution map: ``contribution(f) = score(x) -
    score(x with f ablated to the training median)``.  A positive value
    means the feature's actual value PUSHED the row toward anomalous —
    the same explanatory role as the reference's SHAP values
    (anomaly/check_funcs.py `_dq_info` contributions) computed by
    median-ablation instead of shap (which needs sklearn models).  Cost is
    (d+1) vectorized forest evaluations per batch."""
    if _is_segmented(model):
        raise ValueError("explain_with_model supports flat models; explain per segment instead")
    columns = model["columns"]
    # ensemble: the score is the member mean, and ablation is linear in the
    # score, so contributions are the mean of member contributions
    payloads = (
        [_score_payload(m) for m in model["members"]] if _is_ensemble(model) else [_score_payload(model)]
    )

    @F.pandas_udf("map<string,double>")
    def contrib_udf(*series: pd.Series) -> pd.Series:
        pdf = pd.concat(series, axis=1)
        pdf.columns = columns
        contribs = {c: 0.0 for c in columns}
        n = None
        for payload in payloads:
            x = _impute(pdf, columns, payload["medians"])
            base = _score_matrix(x, payload)
            n = x.shape[0]
            for i, c in enumerate(columns):
                ablated = x.copy()
                ablated[:, i] = payload["medians"][i]
                contribs[c] = contribs[c] + (base - _score_matrix(ablated, payload)) / len(payloads)
        out = []
        for j in range(n):
            out.append({c: float(contribs[c][j]) for c in columns})
        return pd.Series(out)

    return df.withColumn(contrib_col, contrib_udf(*[F.col(c).cast("double") for c in columns]))


def _tree_expected_path(tree: dict, x_row, in_s) -> float:
    """Expected isolation-tree path length for row ``x_row`` when only the
    features flagged in ``in_s`` are known: at a split on a known feature
    follow the row's branch; at a split on an unknown feature take the
    training-distribution mixture of both children (weights = per-node
    sample counts stored at fit time).  This is the standard tree-
    conditional expectation ("path-dependent" in the TreeSHAP paper,
    Lundberg et al. 2018/2020 — public) that makes exact Shapley values
    computable without any retraining."""
    feature, threshold = tree["feature"], tree["threshold"]
    left, right, size = tree["left"], tree["right"], tree["size"]

    def adj(sz: float) -> float:
        if sz <= 1:
            return 0.0
        if sz == 2:
            return 1.0
        return 2.0 * (math.log(sz - 1.0) + 0.5772156649015329) - 2.0 * (sz - 1.0) / sz

    def rec(node: int, depth: float) -> float:
        f = feature[node]
        if f < 0:
            return depth + adj(float(size[node]))
        if in_s[f]:
            child = left[node] if x_row[f] < threshold[node] else right[node]
            return rec(child, depth + 1.0)
        wl = size[left[node]] / float(size[node])
        return wl * rec(left[node], depth + 1.0) + (1.0 - wl) * rec(right[node], depth + 1.0)

    return rec(0, 0.0)


def _exact_shap_row(payload: dict, x_row, d: int) -> list[float]:
    """EXACT Shapley values of the anomaly score for one row, by full
    subset enumeration (2^d coalitions — exponential by definition of the
    Shapley value, hence the ``max_features`` cap on the public API).
    v(S) = 2^(-mean expected path | S known / c(sample_size)); phi_i sums
    the weighted marginal contributions over all coalitions.  Satisfies
    the efficiency axiom by construction: sum(phi) = score(x) - base
    score (property-tested)."""
    trees = payload["trees"]
    c_n = _c(float(payload["sample_size"]))
    n_masks = 1 << d
    v = [0.0] * n_masks
    for mask in range(n_masks):
        in_s = [(mask >> i) & 1 for i in range(d)]
        mean_path = sum(_tree_expected_path(t, x_row, in_s) for t in trees) / len(trees)
        v[mask] = 2.0 ** (-mean_path / c_n)
    fact = [math.factorial(k) for k in range(d + 1)]
    denom = fact[d]
    phis = []
    for i in range(d):
        phi = 0.0
        for mask in range(n_masks):
            if (mask >> i) & 1:
                continue
            s = bin(mask).count("1")
            w = fact[s] * fact[d - s - 1] / denom
            phi += w * (v[mask | (1 << i)] - v[mask])
        phis.append(phi)
    return phis


def shap_explain(
    df: DataFrame,
    model: dict,
    shap_col: str = "anomaly_shap",
    max_features: int = 10,
) -> DataFrame:
    """Append EXACT Shapley values of the anomaly score as a
    ``map<string,double>`` column — the true-SHAP counterpart of
    :func:`explain_with_model`'s median-ablation heuristic, computed
    natively on the numpy forest (the reference gates this surface behind
    the ``shap``+sklearn packages; here the per-node sample counts stored
    at fit time give the tree-conditional expectations directly).

    Exactness costs 2^d coalition evaluations PER ROW (the Shapley value
    is exponential by definition; polynomial TreeSHAP is an algorithmic
    rearrangement of the same quantity) — so pass only the FLAGGED rows
    you need explained, and ``max_features`` refuses models wider than 10
    features by default.  For wide models use :func:`explain_with_model`
    (linear in d).  sum(shap.values()) == score − base_score
    (efficiency axiom, property-tested in tests/test_anomaly.py)."""
    if _is_segmented(model):
        raise ValueError("shap_explain supports flat models; explain per segment instead")
    columns = model["columns"]
    if len(columns) > max_features:
        raise ComputationError(
            f"exact Shapley enumerates 2^{len(columns)} coalitions per row; model has "
            f"{len(columns)} features > max_features={max_features}. Use "
            "explain_with_model (median ablation, linear cost) or raise max_features "
            "explicitly if you accept the cost"
        )
    payloads = (
        [_score_payload(m) for m in model["members"]] if _is_ensemble(model) else [_score_payload(model)]
    )
    d = len(columns)

    @F.pandas_udf("map<string,double>")
    def shap_udf(*series: pd.Series) -> pd.Series:
        pdf = pd.concat(series, axis=1)
        pdf.columns = columns
        out = []
        for _, row in pdf.iterrows():
            phis = [0.0] * d
            for payload in payloads:
                x = _impute(row.to_frame().T, columns, payload["medians"])[0]
                row_phis = _exact_shap_row(payload, x, d)
                phis = [a + b / len(payloads) for a, b in zip(phis, row_phis)]
            out.append({c: float(p) for c, p in zip(columns, phis)})
        return pd.Series(out)

    return df.withColumn(shap_col, shap_udf(*[F.col(c).cast("double") for c in columns]))


def add_llm_explanations(
    df: DataFrame,
    provider,
    contrib_col: str = "anomaly_contributions",
    score_col: str = "anomaly_score",
    segment_cols: list[str] | None = None,
    top_n: int = 2,
    max_groups: int = 20,
    out_col: str = "ai_explanation",
) -> DataFrame:
    """GROUP-based LLM explanations for anomalous rows — the OSS-Spark
    re-derivation of the reference's ``ai_query`` explainer
    (anomaly/anomaly_llm_explainer.py): rows are grouped by a deterministic
    (segment, pattern) key where the pattern is the row's ``top_n``
    contributing features (from :func:`explain_with_model`'s ablation map),
    and the language model is invoked ONCE PER GROUP, never per row.  Every
    row in a group gets the same narrative struct plus ``group_size`` /
    ``group_avg_severity``, which signal the explanation describes a
    pattern, not an individual record.

    Deviation from the reference: the model call is an injected
    ``provider: Callable[[prompt_str], json_str]`` (exactly like
    :mod:`dqx_spark.llm`) instead of the Databricks-only SQL ``ai_query``
    — LLM cost stays bounded at ``max_groups`` driver-side calls (largest
    groups first; smaller groups get a null explanation and a count is
    logged in the struct-free rows), and the join-back is a broadcast on
    the tiny group table, so the row side never collects.

    Pass only ANOMALOUS rows (filter on your score threshold first) — the
    grouping is meaningful for flagged rows.
    """
    spark = df.sparkSession
    entries = F.map_entries(F.col(contrib_col))
    ranked = F.array_sort(
        entries,
        lambda a, b: F.when(a["value"] > b["value"], F.lit(-1))
        .when(a["value"] < b["value"], F.lit(1))
        .when(a["key"] < b["key"], F.lit(-1))
        .otherwise(F.lit(1)),
    )
    top = F.slice(ranked, 1, top_n)
    pattern = F.array_join(F.transform(top, lambda e: e["key"]), ",")
    segment = (
        F.concat_ws(", ", *[F.concat_ws("=", F.lit(c), F.col(c).cast("string")) for c in segment_cols])
        if segment_cols
        else F.lit("")
    )
    work = df.withColumn("__dq_pattern", pattern).withColumn("__dq_segment", segment).withColumn(
        "__dq_topvals", F.transform(top, lambda e: e["value"])
    )
    groups = (
        work.groupBy("__dq_pattern", "__dq_segment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.avg(score_col).alias("avg_sev"),
            F.min(score_col).alias("min_sev"),
            F.max(score_col).alias("max_sev"),
            *[
                F.avg(F.element_at("__dq_topvals", i + 1)).alias(f"c{i}")
                for i in range(top_n)
            ],
        )
        .orderBy(F.col("group_size").desc(), "__dq_pattern", "__dq_segment")
        .limit(max_groups)  # LLM budget: one call per kept group
        .collect()
    )
    rows = []
    for g in groups:
        feats = g["__dq_pattern"].split(",") if g["__dq_pattern"] else []
        contribs = ", ".join(
            f"{f} ({g[f'c{i}']:+.4f})" for i, f in enumerate(feats) if g[f"c{i}"] is not None
        )
        prompt = (
            "Role: data-quality analyst. A group of rows was flagged anomalous by an "
            "isolation-forest model; explain the group's SHARED pattern in plain business "
            "language (the text is shown on every row of the group — never describe a "
            "single record, and do not invent features, values, or segments that are not "
            "listed below).\n"
            f"Rows in group: {g['group_size']}\n"
            f"Top contributing features (mean ablation contribution): {contribs}\n"
            f"Anomaly score: mean {g['avg_sev']:.4f}, min {g['min_sev']:.4f}, max {g['max_sev']:.4f}\n"
            f"Segment: {g['__dq_segment'] or '(none)'}\n"
            'Reply with ONLY a JSON object: {"narrative": ..., "business_impact": ..., "action": ...}'
        )
        raw = provider(prompt)
        try:
            parsed = json.loads(raw)
            narrative = str(parsed.get("narrative", ""))
            impact = str(parsed.get("business_impact", ""))
            action = str(parsed.get("action", ""))
        except (json.JSONDecodeError, TypeError, AttributeError):
            narrative, impact, action = str(raw), "", ""  # non-JSON reply: keep the text
        rows.append(
            (
                g["__dq_pattern"], g["__dq_segment"], narrative, impact, action,
                int(g["group_size"]), float(g["avg_sev"]) if g["avg_sev"] is not None else None,
            )
        )
    expl = spark.createDataFrame(
        rows,
        "__dq_pattern string, __dq_segment string, narrative string, business_impact string, "
        "action string, group_size bigint, group_avg_severity double",
    )
    joined = work.join(F.broadcast(expl), ["__dq_pattern", "__dq_segment"], "left")
    struct = F.when(
        F.col("narrative").isNotNull(),
        F.struct(
            "narrative", "business_impact", "action", "group_size", "group_avg_severity",
            F.col("__dq_pattern").alias("pattern"),
        ),
    )
    return joined.withColumn(out_col, struct).drop(
        "__dq_pattern", "__dq_segment", "__dq_topvals",
        "narrative", "business_impact", "action", "group_size", "group_avg_severity",
    )


def feature_drift(
    df: DataFrame, model: dict, return_counts: bool = False
) -> dict[str, float] | tuple[dict[str, float], dict[str, list[int]]]:
    """PSI per feature vs the training histogram.  One Spark aggregate; the
    driver sees only cols x bins counts.  Segmented models carry per-segment
    histograms on their members — compute drift against the FALLBACK model
    (whole-population histogram) rather than raising mid-pipeline.

    ``return_counts=True`` additionally returns the CURRENT per-bin counts
    (the exact-integer output of the distributed aggregate) — the gate's
    oracle compares those instead of the PSI float, whose last-ULP depends
    on the log/sum implementation."""
    if _is_segmented(model):
        model = model["fallback"]
    if _is_ensemble(model):
        if return_counts:
            # raise BEFORE the per-member Spark jobs, not after
            raise ValueError("return_counts is not defined for ensemble models (counts differ per member)")
        # members train on differently-seeded samples of the same data;
        # average their per-feature PSI
        drifts = [feature_drift(df, m) for m in model["members"]]
        return {c: float(np.mean([d[c] for d in drifts])) for c in drifts[0]}
    aggs = []
    for c, h in model["hist"].items():
        edges = h["edges"]
        bin_expr = F.lit(0)
        for e in edges:
            bin_expr = bin_expr + (F.col(c).cast("double") >= F.lit(float(e))).cast("int")
        for b in range(len(edges) + 1):
            aggs.append(F.sum((bin_expr == b).cast("long")).alias(f"{c}__{b}"))
    row = df.agg(*aggs).collect()[0]
    psi = {}
    counts = {}
    for c, h in model["hist"].items():
        cur_ints = [int(row[f"{c}__{b}"] or 0) for b in range(len(h["edges"]) + 1)]
        counts[c] = cur_ints
        train = np.asarray(h["counts"], dtype=float)
        cur = np.asarray(cur_ints, dtype=float)
        p = np.clip(train / max(train.sum(), 1.0), 1e-6, None)
        q = np.clip(cur / max(cur.sum(), 1.0), 1e-6, None)
        psi[c] = float(np.sum((p - q) * np.log(p / q)))
    return (psi, counts) if return_counts else psi
