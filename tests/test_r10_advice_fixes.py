"""r10 ADVICE regression pins: LSH-join candidate broadcast decoupling,
shuffle_positions prefix cap, StatefulProcessor real subclass, js report
persist release (the plan-side pin lives in test_plans.py)."""

import pytest

from dqx_spark.pipeline import mixing, similarity


def _toy(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(30)],
        "id long, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.2]), (2, [3.0, 1.0, 0.0])], "qid long, qv array<double>"
    )
    return corpus, queries


def test_lsh_join_candidate_strategy_decoupled(spark):
    """broadcast_candidates is its own knob: all three settings (None =
    AQE-decides default, forced True, forced False) produce identical
    rows — strategy never changes results — and the default no longer
    rides broadcast_queries (which only governs the query-scaled sides)."""
    corpus, queries = _toy(spark)

    def run(**kw):
        return sorted(
            (r["query_id"], r["id"], r["rank"])
            for r in similarity.ann_lsh_topk_join(
                queries, corpus, "vec", "id", "qv", "qid",
                k=3, num_planes=4, num_tables=2, **kw
            ).collect()
        )

    base = run()
    assert base == run(broadcast_candidates=True)
    assert base == run(broadcast_candidates=False)
    # broadcast_queries=False with a forced candidate broadcast must also
    # be expressible (the r9 coupling made this combination impossible)
    assert base == run(broadcast_queries=False, broadcast_candidates=True)


def test_shuffle_positions_prefix_chars_capped(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    for bad in (7, 8, 0):
        with pytest.raises(ValueError, match="prefix_chars"):
            mixing.shuffle_positions(df, "id", prefix_chars=bad)
    # 6 (the new cap, ~16.7M bucket bound) still works and stays a permutation
    pos = sorted(r["shuffle_pos"] for r in mixing.shuffle_positions(df, "id", prefix_chars=6).collect())
    assert pos == list(range(10))


def test_sessionize_processor_real_subclass():
    """The v2 processor subclasses the real StatefulProcessor ABC when the
    module is importable (it is on pyspark 4.1.x), so isinstance checks and
    abstractmethod enforcement in the TWS runner hold by construction."""
    from dqx_spark import streaming as st

    proc = st._SessionizeProcessor("user_id", "ts", 30, None)
    try:
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    except ImportError:  # pragma: no cover - stripped builds keep duck-typing
        pytest.skip("StatefulProcessor ABC not importable in this build")
    assert isinstance(proc, StatefulProcessor)
    # the ABC's abstract surface is fully implemented (instantiation above
    # would raise TypeError otherwise) and the optional hooks exist
    for hook in ("init", "handleInputRows", "handleExpiredTimer", "handleInitialState", "close"):
        assert callable(getattr(proc, hook))


def test_js_divergence_result_is_local_and_released(spark):
    """The 1-row report is computed eagerly under a materialization
    (r11: eager localCheckpoint; r10 shipped a persist that measured
    ~1.5-2x slower in-suite) whose blocks are RELEASED before return;
    the returned local frame is re-collectable without re-running the
    token join (no persisted RDD lingers)."""
    from dqx_spark.pipeline import corpus

    a = spark.createDataFrame([(0, "x y y")], "id long, t string")
    b = spark.createDataFrame([(1, "y z")], "id long, t string")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = corpus.token_distribution_divergence(a, b, "t")
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
    r1 = out.collect()[0]
    r2 = out.collect()[0]
    assert r1 == r2
    assert r1["vocab_union"] == 3
