"""r9 ADVICE regression tests: sql_query temp-view cleanup, PQ codebook
mode tagging, deterministic_shuffle full-width key + certifiable
positions, js_divergence single-scan materialization."""

import pytest

import pyspark.sql.functions as F

from dqx_spark.pipeline import similarity


def test_sql_query_drops_temp_views(spark):
    """r9 ADVICE (medium): repeated applies of a sql_query rule must not
    grow the session catalog — each __dq_input_*/__dq_ref_* view is
    dropped right after eager analysis resolves the plan."""
    from dqx_spark.engine import DQEngine
    from dqx_spark.rule import DQRule
    from dqx_spark.functions import dataset_checks as dc

    df = spark.createDataFrame([(1, 5), (2, -1)], "id long, v long")
    ref = spark.createDataFrame([(1,)], "id long")
    rule = DQRule(
        name="neg_v",
        criticality="error",
        check_func=dc.sql_query,
        check_func_kwargs={
            "query": "SELECT id, v < 0 AS condition FROM {{ input_view }} "
            "WHERE id IN (SELECT id FROM {{ refv }})",
            "merge_columns": ["id"],
        },
    )
    engine = DQEngine(spark)
    for _ in range(3):
        out = engine.apply_checks(df, [rule], ref_dfs={"refv": ref})
        out.count()  # plan still executes after the views are gone
    leftover = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__dq_input_") or t.name.startswith("__dq_ref_")
    ]
    assert leftover == []


def test_pq_codebook_mode_tag_raises_on_mismatch(spark):
    """r9 ADVICE (low): residual-trained codebooks used in raw mode (or
    vice versa) raise instead of silently collapsing recall."""
    vecs = [(i, [float(i % 7), float((i * 3) % 5), float(i % 2), 1.0]) for i in range(64)]
    df = spark.createDataFrame(vecs, "id long, vec array<float>")
    cents = similarity.ivf_train_centroids(df, "vec", n_centroids=2, max_samples=64)
    raw = similarity.pq_train_codebooks(df, "vec", 4, num_subvectors=2, num_centroids=4, max_samples=64)
    res = similarity.pq_train_codebooks(
        df, "vec", 4, num_subvectors=2, num_centroids=4, max_samples=64,
        residual_centroids=cents,
    )
    assert raw.residual_trained is False and res.residual_trained is True

    with pytest.raises(ValueError, match="residual"):
        similarity.pq_encode(df, res, "vec", "id")  # residual books, raw encode
    indexed = similarity.ivf_assign_buckets(df, cents, "vec", "id")
    with pytest.raises(ValueError, match="residual"):
        similarity.pq_encode(indexed, raw, "vec", "id", residual_centroids=cents)
    with pytest.raises(ValueError, match="residual"):
        similarity.pq_topk(df, res, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="residual"):
        similarity.ivfpq_topk(indexed, cents, raw, [0.0] * 4, residual=True)
    with pytest.raises(ValueError, match="residual"):
        similarity.ivfpq_topk(indexed, cents, res, [0.0] * 4, residual=False)
    # untagged plain lists skip the check (deserialized codebooks)
    plain = [list(book) for book in raw]
    similarity.pq_topk(
        similarity.pq_encode(df, plain, "vec", "id"), plain, [0.0] * 4, k=3
    ).collect()


def test_js_divergence_single_scan_still_correct(spark):
    """r9 ADVICE (low): the localCheckpoint refactor must not change the
    report values (same-corpus js == 0, disjoint-vocab == ln 2)."""
    import math
    from dqx_spark.pipeline import corpus

    a = spark.createDataFrame([(0, "x y x"), (1, "y z")], "id long, t string")
    b = spark.createDataFrame([(0, "p q"), (1, "q r")], "id long, t string")
    same = corpus.token_distribution_divergence(a, a, "t").collect()[0]
    assert same["js_divergence"] == 0.0
    disj = corpus.token_distribution_divergence(a, b, "t").collect()[0]
    assert abs(disj["js_divergence"] - math.log(2.0)) < 1e-12


def test_emb_decon_threshold_is_vintage_robust():
    """r9 (VERDICT #4): the embedding-decon threshold is derived mid-gap
    from the measured pair-cosine distribution at gate-prep time — same
    verdict set as the 0.35 target by construction, maximal margin, and
    the derivation RAISES (re-probe guidance) if the gap shrinks below
    the cross-engine float-agreement floor.  This test would have caught
    a testdata regeneration before the driver's hash did."""
    import __spark_entry__ as entrymod

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t = entrymod._emb_decon_threshold(sf_dir)  # raises if gap < 1e-9
        assert abs(t - 0.35) < 0.05, f"derived threshold drifted: {t} at {sf_dir}"
        assert entrymod._emb_decon_threshold(sf_dir) == t  # memoized, stable


def test_lsh_multiprobe_radius_validated(spark):
    """r9 review: multiprobe values > 1 were silently treated as radius 1
    (single-bit flips only) while the docstring promised a radius — both
    LSH entry points now reject unimplemented radii."""
    df = spark.createDataFrame([(0, [1.0, 0.0])], "id long, vec array<double>")
    q = spark.createDataFrame([(1, [1.0, 0.0])], "qid long, qv array<double>")
    with pytest.raises(ValueError, match="multiprobe"):
        similarity.ann_lsh_topk(df, [1.0, 0.0], "vec", "id", multiprobe=3)
    with pytest.raises(ValueError, match="multiprobe"):
        similarity.ann_lsh_topk_join(q, df, "vec", "id", "qv", "qid", multiprobe=2)
