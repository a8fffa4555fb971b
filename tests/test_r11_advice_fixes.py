"""Regression tests for the round-11 ADVICE items and VERDICT #5 policy:

* LshIndex handle freshness across path-based mutations (ADVICE medium):
  stale-until-invalidated is the pinned contract; ``handle=`` on
  ``append_to_lsh_index`` / ``remove_from_ann_index`` auto-invalidates.
* ``dedup_against_index(pairs=)`` passthrough (ADVICE low): the sink's
  precomputed probe frame yields the identical verdict with no second
  probe execution.
* ``save_lsh_index`` layout auto-select counts the WRITTEN vecs parquet,
  not the caller's upstream plan (ADVICE low).
* ``DedupIndex._read`` empty-layout fallback routes on filesystem state
  (Hadoop FS probe), not exception text (ADVICE low).
* ``recommend_index_maintenance`` policy + CLI exit codes (VERDICT #5).
"""
import os

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import dedup_index as di
from dqx_spark.pipeline import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# LshIndex handle freshness
# ---------------------------------------------------------------------------

def test_lsh_handle_stale_until_invalidated_and_handle_passthrough(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old = df.where(F.col("vec_id") % 4 != 0)
    new = df.where(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "lsh")
    similarity.save_lsh_index(old, path, "embedding", "vec_id", layout="flat")

    held = similarity.load_lsh_index(spark, path)
    n_old = held.vecs.count()

    # path-based append WITHOUT the handle: the held handle keeps serving
    # the pre-append state (pinned contract) until invalidate()
    similarity.append_to_lsh_index(new, path, "embedding", "vec_id")
    assert held.vecs.count() == n_old, "stale-until-invalidated is the contract"
    held.invalidate()
    n_all = held.vecs.count()
    assert n_all == df.count()

    # append WITH handle=: auto-invalidated, next access sees the batch
    more = df.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    similarity.append_to_lsh_index(more, path, "embedding", "vec_id", handle=held)
    assert held.vecs.count() == n_all + more.count()

    # mismatched handle path refuses rather than invalidating the wrong index
    with pytest.raises(ValueError, match="does not match"):
        similarity.append_to_lsh_index(
            new, str(tmp_path / "other"), "embedding", "vec_id", handle=held
        )


def test_remove_from_ann_index_handle_invalidation(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    path = str(tmp_path / "lsh")
    similarity.save_lsh_index(df, path, "embedding", "vec_id", layout="flat")
    held = similarity.load_lsh_index(spark, path)
    n = held.vecs.count()
    # without handle: stale
    similarity.remove_from_ann_index(spark, path, [0, 1])
    assert held.vecs.count() == n
    held.invalidate()
    n_after = held.vecs.count()
    assert n_after == n - df.where(F.col("vec_id").isin(0, 1)).count()
    # with handle: fresh immediately
    similarity.remove_from_ann_index(spark, path, [2], handle=held)
    assert held.vecs.count() == n_after - df.where(F.col("vec_id") == 2).count()
    with pytest.raises(ValueError, match="does not match"):
        similarity.remove_from_ann_index(spark, str(tmp_path / "nope"), [3], handle=held)


# ---------------------------------------------------------------------------
# dedup_against_index pairs= passthrough
# ---------------------------------------------------------------------------

def test_dedup_against_index_pairs_passthrough_identical_verdict(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seed = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "didx")
    di.save_dedup_index(seed, path, "doc_id", "text", method="exact")
    idx = di.load_dedup_index(spark, path)

    pairs = di.dedup_pairs_against_index(batch, idx, "doc_id", "text").localCheckpoint()
    with_pairs = di.dedup_against_index(batch, idx, "doc_id", "text", pairs=pairs)
    without = di.dedup_against_index(batch, idx, "doc_id", "text")
    key = lambda rows: sorted(
        (r["doc_id"], r["matched_index"], r["kept"]) for r in rows
    )
    assert key(with_pairs.collect()) == key(without.collect())


# ---------------------------------------------------------------------------
# save_lsh_index auto-layout counts the written parquet, not the input plan
# ---------------------------------------------------------------------------

def test_save_lsh_auto_layout_executes_upstream_once(spark, tmp_path):
    """The upstream plan behind the corpus df must execute exactly once
    during save (the vecs write) — the auto-select count and the melt
    hash from the WRITTEN parquet.  Counted via a Spark accumulator
    bumped inside a UDF on the upstream plan."""
    from pyspark.sql.types import ArrayType, DoubleType

    acc = spark.sparkContext.accumulator(0)

    def bump(arr):
        acc.add(1)
        return [float(x) for x in arr]

    bump_udf = F.udf(bump, ArrayType(DoubleType()))
    # no .limit() here: a parquet-scan + limit + write plan does not
    # surface UDF accumulator updates in this Spark version (verified in
    # isolation); the full 500-row table counts cleanly
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    upstream = base.select("vec_id", bump_udf("embedding").alias("embedding"))
    path = str(tmp_path / "lsh_once")
    similarity.save_lsh_index(upstream, path, "embedding", "vec_id", layout=None)
    n_rows = base.count()
    assert acc.value == n_rows, (
        f"upstream executed {acc.value / n_rows:.1f}x - the auto-layout "
        "count must read the written vecs/, never re-run the caller's plan"
    )
    # and the auto choice still landed in the sidecar
    idx = similarity.load_lsh_index(spark, path)
    assert idx.meta["layout"] == "flat"


# ---------------------------------------------------------------------------
# DedupIndex empty-layout fallback routes on filesystem state
# ---------------------------------------------------------------------------

def test_dedup_index_empty_seed_fallback_is_structural(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "empty_idx")
    di.save_dedup_index(docs.limit(0), path, "doc_id", "text", method="minhash")
    idx = di.load_dedup_index(spark, path)
    # empty-seed reads fall back to typed empty frames (FS probe says empty)
    assert idx.bands.count() == 0
    assert idx.sigs.count() == 0

    # corrupt NON-empty sub-layout must raise, not be adopted as empty
    bad = str(tmp_path / "bad_idx")
    di.save_dedup_index(docs.limit(20), bad, "doc_id", "text", method="minhash")
    idx2 = di.load_dedup_index(spark, bad)
    sig_dir = bad + "/sigs"
    # clobber every parquet data file with garbage bytes, keeping the dir
    # non-empty: the structural probe must see "exists with data files"
    # and re-raise the read failure instead of serving an empty frame
    import glob

    for f in glob.glob(sig_dir + "/**/*.parquet", recursive=True):
        with open(f, "wb") as fh:
            fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        idx2._read("sigs").collect()


def test_fsutil_probes(spark, tmp_path):
    from dqx_spark.pipeline._fsutil import hadoop_path_exists, read_missing

    p = str(tmp_path / "somewhere")
    assert not hadoop_path_exists(spark, p)
    assert read_missing(spark, p)
    os.makedirs(p)
    assert hadoop_path_exists(spark, p)
    assert not read_missing(spark, p)


# ---------------------------------------------------------------------------
# recommend_index_maintenance policy (VERDICT r11 #5)
# ---------------------------------------------------------------------------

def test_maintenance_policy_ok_compact_retrain():
    rec = similarity.recommend_index_maintenance
    ok = rec({"method": "ivf", "rows": 1000, "files_per_partition": 2.0,
              "bucket_skew": 1.5, "tombstoned": 0})
    assert ok["action"] == "ok" and ok["reasons"] == []

    comp_files = rec({"method": "ivf", "rows": 1000, "files_per_partition": 40.0,
                      "bucket_skew": 1.5, "tombstoned": 0})
    assert comp_files["action"] == "compact"
    assert any("files_per_partition" in r for r in comp_files["reasons"])

    comp_tomb = rec({"method": "lsh", "rows": 700, "files_per_partition": 2.0,
                     "bucket_skew": 1.0, "tombstoned": 300})
    assert comp_tomb["action"] == "compact"
    assert comp_tomb["metrics"]["tombstone_ratio"] == 0.3

    retrain = rec({"method": "ivf", "rows": 1000, "files_per_partition": 40.0,
                   "bucket_skew": 12.0, "tombstoned": 500})
    assert retrain["action"] == "retrain", "retrain subsumes compact"
    assert len(retrain["reasons"]) == 3

    # dedup families: skew is informational, never a retrain
    dedup = rec({"method": "minhash", "state_rows": 1000, "pb_skew": 50.0,
                 "files_per_partition": 2.0, "tombstoned": 0})
    assert dedup["action"] == "ok"
    assert any("informational" in r for r in dedup["reasons"])


def test_maintenance_policy_trips_on_real_skewed_and_tombstoned_index(spark, tmp_path):
    """End-to-end: a tombstone-heavy real index trips compact through the
    actual stats reader (VERDICT #5's 'a skewed/tombstone-heavy index
    trips it' requirement)."""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    path = str(tmp_path / "lshpol")
    similarity.save_lsh_index(df, path, "embedding", "vec_id", layout="flat")
    stats_before = similarity.ann_index_stats(spark, path)
    assert similarity.recommend_index_maintenance(stats_before)["action"] == "ok"
    # tombstone 30% of ids -> compact
    ids = [r["vec_id"] for r in df.select("vec_id").limit(30).collect()]
    similarity.remove_from_ann_index(spark, path, ids)
    stats = similarity.ann_index_stats(spark, path)
    verdict = similarity.recommend_index_maintenance(stats)
    assert verdict["action"] == "compact"
    assert verdict["metrics"]["tombstoned"] == 30


def test_maintenance_cli_exit_codes(spark, tmp_path, capsys):
    from dqx_spark import cli

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(60)
    path = str(tmp_path / "lshcli")
    similarity.save_lsh_index(df, path, "embedding", "vec_id", layout="flat")
    rc = cli.main(["index-maintenance", "--kind", "lsh", "--input", path])
    assert rc == 0
    similarity.remove_from_ann_index(
        spark, path, [r["vec_id"] for r in df.select("vec_id").limit(20).collect()]
    )
    rc = cli.main(["index-maintenance", "--kind", "lsh", "--input", path])
    assert rc == 2
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    rep = json.loads(out)
    assert rep["action"] == "compact" and rep["kind"] == "lsh"


# ---------------------------------------------------------------------------
# has_no_outliers stats_via='driver' (VERDICT r11 #3)
# ---------------------------------------------------------------------------

def test_r12_mad_modes_driver_equals_plan(spark, orders):
    """The literal-band fast path must flag exactly the rows the lazy
    broadcast path flags, in every (approx, estimator) mode, and behave
    like the null-band crossJoin on empty input."""
    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine

    e = DQEngine()
    flagged = lambda kw: sorted(  # noqa: E731
        r["o_orderkey"]
        for r in e.apply_checks(
            orders,
            [DQDatasetRule(check_func=C.has_no_outliers, column="o_totalprice",
                           check_func_kwargs=kw)],
        ).where(F.col("_errors").isNotNull()).select("o_orderkey").collect()
    )
    for mode in ({}, {"approx": True}, {"approx": True, "approx_estimator": "mad"}):
        plan = flagged({**mode, "k": 1.0, "stats_via": "plan"})
        driver = flagged({**mode, "k": 1.0, "stats_via": "driver"})
        assert plan == driver and len(plan) > 0, mode

    empty = orders.limit(0)
    out = e.apply_checks(
        empty,
        [DQDatasetRule(check_func=C.has_no_outliers, column="o_totalprice",
                       check_func_kwargs={"stats_via": "driver"})],
    )
    assert out.count() == 0

    import pytest as _pytest

    from dqx_spark.errors import InvalidParameterError

    with _pytest.raises(InvalidParameterError):
        C.has_no_outliers("o_totalprice", stats_via="collect")
