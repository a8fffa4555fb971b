"""Regression tests for the round-7 advisor findings (ADVICE.md r7):
quoted-directive datetime pass-through, non-unique sample-order
tiebreaking, memoized temperature-mix twin counts, deterministic wheel
walk order, and regexp_replace replacement escaping."""

import os

from pyspark.sql import functions as F

from dqx_spark.functions.row_checks import _normalize_datetime_format
from dqx_spark.pipeline.pii import redact_pii


def test_java_pattern_with_quoted_directive_passes_through():
    # ADVICE r7: these used to be silently rewritten (and mangled) because
    # any recognized %X anywhere selected the strftime dialect
    assert _normalize_datetime_format("'%H' HH") == "'%H' HH"
    assert _normalize_datetime_format("HH 'at %Hrs'") == "HH 'at %Hrs'"
    assert _normalize_datetime_format("'as of %Y' yyyy-MM-dd") == "'as of %Y' yyyy-MM-dd"
    # unquoted directive still selects strftime
    assert _normalize_datetime_format("%Y-%m-%d") == "yyyy-MM-dd"
    # unbalanced quotes keep the strftime fallback
    assert _normalize_datetime_format("o'clock %H") == "'o''clock 'HH"


def test_redact_pii_replacement_with_dollar_and_backslash(spark):
    """ADVICE r7: '$' and '\\' in the replacement reach Java's
    Matcher.replaceAll, where '$1' is a group reference and a lone '\\'
    an escape — both used to throw or substitute groups at task time."""
    df = spark.createDataFrame([(1, "mail me at bob@example.com ok")], "id long, text string")
    out = redact_pii(df, "id", "text", replacement="<$redacted\\{entity}>").collect()[0]
    assert out["text_redacted"] == "mail me at <$redacted\\EMAIL_ADDRESS> ok"
    # typed default placeholders (no specials) are unchanged by the escaping
    out2 = redact_pii(df, "id", "text").collect()[0]
    assert "[EMAIL_ADDRESS]" in out2["text_redacted"]


def test_forest_sample_order_tiebreak_is_deterministic(spark):
    """ADVICE r7: a NON-unique sample_order_by key must not make the fit
    nondeterministic — the feature-hash tiebreaker pins the TakeOrdered
    boundary.  Run the fit twice over differently-partitioned inputs and
    require identical models."""
    from dqx_spark.anomaly import fit_isolation_forest

    rows = [(i % 7, float(i % 13), float((i * 37) % 101)) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, x double, y double")
    m1 = fit_isolation_forest(
        df.repartition(8), ["x", "y"], num_trees=8, max_samples=100, sample_order_by=["grp"]
    )
    m2 = fit_isolation_forest(
        df.repartition(3, "y"), ["x", "y"], num_trees=8, max_samples=100, sample_order_by=["grp"]
    )
    assert m1["score_threshold"] == m2["score_threshold"]
    assert m1["hist"] == m2["hist"]


def test_ivf_train_tiebreak_is_deterministic(spark):
    from dqx_spark.pipeline.similarity import ivf_train_centroids

    rows = [(i % 5, [float(i % 11), float((i * 3) % 17)]) for i in range(300)]
    df = spark.createDataFrame(rows, "grp int, emb array<double>")
    c1 = ivf_train_centroids(
        df.repartition(7), "emb", n_centroids=4, max_samples=80, sample_order_by="grp", n_init=3
    )
    c2 = ivf_train_centroids(
        df.repartition(2, "emb"), "emb", n_centroids=4, max_samples=80, sample_order_by="grp", n_init=3
    )
    assert c1 == c2


def test_tmix_source_counts_memoized():
    import __spark_entry__ as entry

    entry._tmix_source_counts.cache_clear()
    sfd = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    a = entry._tmix_source_counts(sfd)
    b = entry._tmix_source_counts(sfd)
    assert a is b and len(a) > 0
    assert entry._tmix_source_counts.cache_info().hits >= 1


def test_wheel_walk_sorts_dirnames():
    # the fix is textual but cheap to pin: dirnames must be sorted so the
    # archive (and RECORD) order is filesystem-independent
    with open(os.path.join(os.path.dirname(__file__), "..", "scripts", "build_wheel.py")) as fh:
        src = fh.read()
    assert "dirnames[:] = sorted(" in src


# ---------------------------------------------------------------------------
# r8 self-review regression tests (second review pass)
# ---------------------------------------------------------------------------
def test_bare_unquoted_percent_rejected_even_with_quoted_directive():
    import pytest as _pytest

    from dqx_spark.errors import InvalidParameterError

    # a quoted directive must not smuggle a bare unquoted '%' past the
    # build-time rejection
    with _pytest.raises(InvalidParameterError, match="strftime"):
        _normalize_datetime_format("'%H' HH 50%")


def test_duplicate_rule_object_in_one_list(spark):
    """The same DQDatasetRule OBJECT listed twice must produce two
    identical result entries, not an ambiguous-reference crash (the r8
    invoke memoization shares one temp message column between them)."""
    from pyspark.sql import functions as F

    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams

    df = spark.createDataFrame([(i, float(i)) for i in range(40)] + [(99, 1e9)], "id long, v double")
    e = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    rule = DQDatasetRule(check_func=C.has_no_outliers, column="v")
    out = e.apply_checks(df, [rule, rule])
    bad = out.where(F.col("_errors").isNotNull()).select("id", F.size("_errors").alias("n")).collect()
    assert {r["id"] for r in bad} == {99}
    assert all(r["n"] == 2 for r in bad)  # both listings report


def test_sql_query_rule_reuse_across_tables(spark):
    """One sql_query rule object applied to two different tables must
    validate each table's own data (the temp view is minted per
    application, not frozen per rule — r8 review finding #1)."""
    from pyspark.sql import functions as F

    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams

    e = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    rule = [DQDatasetRule(check_func=C.sql_query, check_func_kwargs={
        "query": "SELECT id, v > 100 AS condition FROM {{ input }}",
        "merge_columns": ["id"], "condition_column": "condition"})]
    a = spark.createDataFrame([(1, 1.0), (2, 200.0)], "id long, v double")
    b = spark.createDataFrame([(1, 500.0), (2, 5.0)], "id long, v double")
    bad_a = {r["id"] for r in e.apply_checks(a, rule).where(F.col("_errors").isNotNull()).collect()}
    bad_b = {r["id"] for r in e.apply_checks(b, rule).where(F.col("_errors").isNotNull()).collect()}
    assert bad_a == {2} and bad_b == {1}


def test_dataset_struct_cache_is_bounded(spark):
    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    e = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    e._dataset_struct_cache_max = 8
    for _ in range(20):  # fresh rule objects each pass, like by-metadata loops
        e.apply_checks(df, [DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="v",
                                          check_func_kwargs={"limit": 1e9, "aggr_type": "sum"})])
    assert len(e._dataset_struct_cache) <= 8
