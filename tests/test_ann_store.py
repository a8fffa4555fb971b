"""Versioned ANN store + streaming embedding-ingestion sink (r12 — the
similarity-family sibling of the dedup store/sink):

* store init/resolve/compact for BOTH families (LSH + IVF), with the
  crash fallbacks the shared ``pipeline._store`` discipline documents;
* ``ann_index_sink`` over real micro-batches: final search results
  bit-equal to a one-shot build over the whole corpus, across a
  mid-stream pointer-flip compaction;
* plain-path mode (no store) appends but refuses maintenance knobs;
* the policy verdict the sink cannot execute (retrain) is surfaced
  through ``verdict_sink``.
"""
import os

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def _queries(df):
    return df.where(F.col("vec_id").isin(1, 7, 13)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )


def _lsh_results(spark, df, queries, index_path):
    idx = similarity.load_lsh_index(spark, index_path)
    rows = similarity.ann_lsh_topk_join(
        queries, None, "", "", "embedding", "qid", k=10, corpus_index=idx
    ).collect()
    return sorted((r["query_id"], r["id"], r["rank"]) for r in rows)


def test_lsh_store_init_resolve_compact_and_fallbacks(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    root = str(tmp_path / "store")
    v0 = similarity.init_lsh_store(df, root, "embedding", "vec_id", layout="flat")
    assert similarity.current_ann_store_version(spark, root) == v0

    # crashed partial version: ignored by resolution, skipped by compaction
    os.makedirs(root + "/v1/melt", exist_ok=True)
    with open(root + "/v1/melt/garbage", "w") as fh:
        fh.write("partial")
    assert similarity.current_ann_store_version(spark, root) == v0
    dst = similarity.compact_ann_store(spark, root)
    assert dst == root + "/v2"
    assert similarity.current_ann_store_version(spark, root) == dst

    # compaction is bit-neutral to search results across versions
    q = _queries(df)
    assert _lsh_results(spark, df, q, dst) == _lsh_results(spark, df, q, v0)

    # lost pointer: highest COMPLETE version wins
    import shutil

    shutil.rmtree(root + "/_current")
    assert similarity.current_ann_store_version(spark, root) == dst

    with pytest.raises(ValueError, match="no complete index version"):
        similarity.current_ann_store_version(spark, str(tmp_path / "none"))


def test_ann_sink_lsh_empty_seed_micro_batches_equal_one_shot(spark, tmp_path):
    """Three real micro-batches through ann_index_sink with compact_every=2
    (one pointer-flip compaction mid-stream): searches over the final
    store version are bit-equal to a one-shot save over the whole corpus."""
    from dqx_spark.streaming import ann_index_sink

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for b in range(3):
        df.where(F.col("vec_id") % 3 == b).coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "store")
    similarity.init_lsh_store(df.limit(0), root, "embedding", "vec_id", layout="flat")
    q = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(
            ann_index_sink(root, "embedding", "vec_id", compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    cur = similarity.current_ann_store_version(spark, root)
    assert cur == root + "/v1", "compaction fired once mid-stream"

    one_shot = str(tmp_path / "oneshot")
    similarity.save_lsh_index(df, one_shot, "embedding", "vec_id", layout="flat")
    queries = _queries(df)
    assert _lsh_results(spark, df, queries, cur) == _lsh_results(
        spark, df, queries, one_shot
    )


def test_ann_sink_plain_path_and_guards(spark, tmp_path):
    from dqx_spark.streaming import ann_index_sink

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "plain")
    similarity.save_lsh_index(
        df.where(F.col("vec_id") % 2 == 0), path, "embedding", "vec_id", layout="flat"
    )
    sink = ann_index_sink(path, "embedding", "vec_id")
    sink(df.where(F.col("vec_id") % 2 == 1), 0)  # direct foreachBatch body call
    idx = similarity.load_lsh_index(spark, path)
    assert idx.vecs.count() == df.count()

    # maintenance knobs on a plain path refuse loudly
    guarded = ann_index_sink(path, "embedding", "vec_id", compact_every=1)
    with pytest.raises(ValueError, match="versioned store"):
        guarded(df.limit(1), 1)


def test_ann_sink_ivf_family_and_verdict_surface(spark, tmp_path):
    """IVF store through the sink (seeded with the trained sample, batches
    appended against the sidecar's centroids), and a tombstone-heavy store
    trips the policy: the verdict reaches verdict_sink and the sink
    compacts (which applies the tombstones physically)."""
    from dqx_spark.streaming import ann_index_sink

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    seed = df.where(F.col("vec_id") % 4 == 0)
    root = str(tmp_path / "store")
    v0 = similarity.init_ann_store(
        similarity.ivf_assign_buckets(seed, cents, "embedding", "vec_id"), root, cents
    )
    # tombstone enough of the seed that the debt ratio stays above the
    # default 0.2 bar even after the sink appends the next 125-row batch:
    # 70 / (125 - 70 + 125 + 70) = 0.28
    ids = [r["vec_id"] for r in seed.select("vec_id").limit(70).collect()]
    similarity.remove_from_ann_index(spark, v0, ids)

    verdicts: list = []
    sink = ann_index_sink(
        root, "embedding", "vec_id",
        maintenance_thresholds={},
        verdict_sink=lambda v, b: verdicts.append((b, v["action"])),
    )
    sink(df.where(F.col("vec_id") % 4 == 1), 0)
    assert verdicts and verdicts[0] == (0, "compact")
    cur = similarity.current_ann_store_version(spark, root)
    assert cur == root + "/v1"
    # compaction applied the tombstones physically; both slices live
    loaded, _, _ = similarity.load_ann_index(spark, cur)
    want = seed.where(~F.col("vec_id").isin(ids)).count() + df.where(
        F.col("vec_id") % 4 == 1
    ).count()
    assert loaded.count() == want


def test_cli_index_compact_store_mode(spark, tmp_path, capsys):
    from dqx_spark import cli

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(80)
    root = str(tmp_path / "store")
    similarity.init_lsh_store(df, root, "embedding", "vec_id", layout="flat")
    rc = cli.main(["index-compact", "--store", "--kind", "lsh", "--input", root])
    assert rc == 0
    import json

    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["new_version"] == root + "/v1"
    assert similarity.current_ann_store_version(spark, root) == root + "/v1"
    # --store with --output refuses; no --store without --output refuses
    assert cli.main(["index-compact", "--store", "--kind", "lsh",
                     "--input", root, "--output", "/tmp/x"]) == 2
    assert cli.main(["index-compact", "--kind", "lsh", "--input", root]) == 2
