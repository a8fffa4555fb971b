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
