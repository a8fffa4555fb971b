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


# ---------------------------------------------------------------------------
# batch 2: metrics / reporting / contracts / llm review findings
# ---------------------------------------------------------------------------
def test_observer_with_custom_result_columns(spark):
    from dqx_spark.engine import ExtraParams
    from dqx_spark.metrics import DQMetricsObserver

    df = spark.createDataFrame([(None,), ("x",)], "a string")
    engine = DQEngine(spark, extra_params=ExtraParams(result_column_names={"errors": "dq_errs", "warnings": "dq_warns"}))
    checked = engine.apply_checks(df, [DQRowRule(check_func=is_not_null, column="a")])
    obs = DQMetricsObserver(errors_col="dq_errs", warnings_col="dq_warns")
    observed, observation = obs.attach(checked)
    observed.count()
    got = observation.get
    assert got["input_row_count"] == 2 and got["error_row_count"] == 1


def test_merge_info_columns_null_dest_keeps_new_elements(spark):
    from dqx_spark.reporting import build_dq_info_struct, merge_info_columns

    df = spark.createDataFrame([(1,), (2,)], "id int")
    staged = df.withColumn("__dq_info_x", build_dq_info_struct())
    first = merge_info_columns("_dq_info", staged, ["__dq_info_x"])
    # simulate a union with unchecked data: _dq_info NULL on one row
    import pyspark.sql.functions as SF

    with_null = first.withColumn("_dq_info", SF.when(SF.col("id") == 1, SF.col("_dq_info")))
    restaged = with_null.withColumn("__dq_info_y", build_dq_info_struct())
    merged = merge_info_columns("_dq_info", restaged, ["__dq_info_y"])
    sizes = {r["id"]: len(r["_dq_info"]) for r in merged.collect()}
    assert sizes == {1: 2, 2: 1}  # row 2's NULL dest must not swallow the new element


def test_per_check_metrics_hostile_names(spark):
    from dqx_spark.metrics import per_check_metrics

    names = ["tick`name", "back\\slash", "quo'te"]
    df = spark.createDataFrame([(None,), ("x",)], "a string")
    checked = DQEngine(spark).apply_checks(
        df, [DQRowRule(check_func=is_not_null, column="a", name=n) for n in names]
    )
    row = checked.selectExpr(*per_check_metrics(names)).collect()[0]
    assert list(row.asDict().values()) == [1, 1, 1]


def test_summary_metrics_lazy_dotted_alias(spark):
    from dqx_spark.metrics import DQMetricsObserver, compute_summary_metrics_lazy

    df = spark.createDataFrame([(None,), ("x",)], "a string")
    checked = DQEngine(spark).apply_checks(df, [DQRowRule(check_func=is_not_null, column="a")])
    obs = DQMetricsObserver(custom_metrics=["count(1) AS `p.50`"])
    rows = {r["metric_name"]: r["metric_value"] for r in compute_summary_metrics_lazy(checked, obs).collect()}
    assert rows["p.50"] == "2"


def test_contract_length_checks_pass_nulls(spark):
    from dqx_spark.contracts import generate_rules_from_contract

    contract = {"schema": [{"name": "t", "properties": [
        {"name": "nick", "type": "string", "maxLength": 5},
    ]}]}
    checks = generate_rules_from_contract(contract)
    df = spark.createDataFrame([(None,), ("ok",), ("toolongvalue",)], "nick string")
    out = DQEngine(spark).apply_checks_by_metadata(df, checks).collect()
    fired = [r["nick"] for r in out if r["_errors"] is not None]
    assert fired == ["toolongvalue"]  # NULL must pass length bounds


def test_pk_detection_retries_on_hallucinated_columns(spark):
    from dqx_spark.llm import detect_primary_keys_with_llm

    df = spark.createDataFrame([(1, "a"), (2, "b")], "order_id int, v string")
    calls = []

    def provider(prompt):
        calls.append(prompt)
        if len(calls) == 1:
            return '[["orderid"]]'  # hallucinated name
        assert "unknown columns" in prompt  # feedback must reach the retry
        return '[["order_id"]]'

    assert detect_primary_keys_with_llm(df, provider) == ["order_id"]
    assert len(calls) == 2


class TestTypedErrorHierarchy:
    """Reference errors.py:1-53 name parity: reference-style except clauses
    work, and every typed error still satisfies the builtin the package
    raised historically."""

    def test_hierarchy(self):
        from dqx_spark import errors as E

        assert issubclass(E.InvalidParameterError, E.ParameterError)
        assert issubclass(E.ParameterError, E.DQXError)
        for cls in (E.UnsafeSqlQueryError, E.InvalidCheckError, E.InvalidConfigError,
                    E.ModelLoadError, E.ODCSContractError, E.MissingResourceError):
            assert issubclass(cls, E.DQXError) and issubclass(cls, ValueError)
        assert issubclass(E.ComputationError, RuntimeError)

    def test_unsafe_sql_gate_raises_typed(self, spark):
        import pytest as _pytest

        from dqx_spark import DQDatasetRule, DQEngine, UnsafeSqlQueryError
        import dqx_spark.functions as C

        df = spark.createDataFrame([(1,)], "a long")
        engine = DQEngine()
        with _pytest.raises(UnsafeSqlQueryError):
            engine.apply_checks(df, [DQDatasetRule(
                check_func=C.sql_query,
                check_func_kwargs={"query": "DROP TABLE x", "merge_columns": ["a"],
                                   "condition_column": "c"},
            )])

    def test_invalid_rule_raises_typed_but_still_valueerror(self):
        import pytest as _pytest

        from dqx_spark import DQRowRule, InvalidParameterError
        import dqx_spark.functions as C

        with _pytest.raises(InvalidParameterError):
            DQRowRule(check_func=C.is_not_null, column="a", criticality="fatal")
        with _pytest.raises(ValueError):
            DQRowRule(check_func=C.is_not_null, column="a", criticality="fatal")


class TestR5ReviewFixes:
    def test_clean_corpus_decontamination_with_normalize(self, spark):
        """r5 review: with normalize=True the corpus text column is
        text_norm, which must NOT be resolved against eval_df."""
        from dqx_spark.pipeline import corpus as C_

        eval_doc = "the capital of france is paris and the capital of spain is madrid ok"
        df = spark.createDataFrame(
            [(0, eval_doc.replace("ok", "yes")), (1, "spark shuffle partitions broadcast joins all day long")],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame([(100, eval_doc)], "doc_id long, text string")
        out = C_.clean_corpus(
            df, "doc_id", "text", normalize=True,
            min_words=3, max_symbol_to_word_ratio=1.0, min_alpha_word_fraction=0.0,
            eval_df=ev, contamination_threshold=0.2, contamination_n=8,
            fuzzy_contamination_threshold=0.5,
        )
        assert {r.doc_id for r in out.select("doc_id").collect()} == {1}

    def test_dedup_paragraphs_null_id_rows_pass_through(self, spark):
        """r5 review: a NULL-id row must neither win a canonical slot nor
        lose its paragraphs."""
        from dqx_spark.pipeline import dedup

        df = spark.createDataFrame(
            [(None, "dup para"), (1, "dup para"), (2, "dup para\n\nown text")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(df, "doc_id", "text").collect()}
        # NULL-id row untouched
        assert out[None].text_dedup == "dup para" and out[None].removed_paragraph_count == 0
        # doc 1 is the canonical owner among addressable rows; doc 2 loses it
        assert out[1].text_dedup == "dup para"
        assert out[2].text_dedup == "own text" and out[2].removed_paragraph_count == 1

    def test_typed_errors_raised_by_storage_contracts_anomaly(self, spark, tmp_path):
        import pytest as _pytest

        from dqx_spark.checks_storage import FileChecksStorage
        from dqx_spark.contracts import generate_rules_from_contract
        from dqx_spark.errors import ComputationError, MissingResourceError, ODCSContractError

        with _pytest.raises(MissingResourceError):
            FileChecksStorage(str(tmp_path / "nope.yaml")).load()
        # still catchable as the builtin previously raised
        with _pytest.raises(FileNotFoundError):
            FileChecksStorage(str(tmp_path / "nope.yaml")).load()
        with _pytest.raises(ODCSContractError):
            generate_rules_from_contract({"schema": "not-a-list"})
        with _pytest.raises(ODCSContractError):
            generate_rules_from_contract({"schema": [{"properties": "nope"}]})
        # unnamed properties are skipped, not fatal (reference :590)
        assert generate_rules_from_contract({"schema": [{"name": "t", "properties": [{"type": "int"}]}]}) == []

        from dqx_spark.anomaly import fit_isolation_forest

        empty = spark.createDataFrame([], "x double, y double")
        with _pytest.raises(ComputationError):
            fit_isolation_forest(empty, ["x", "y"])
