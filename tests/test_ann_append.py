"""Incremental ANN index maintenance (r10): append_to_ann_index must be
bit-equal to a one-shot build over the union (same sidecar centroids/books
⇒ same assignments/codes ⇒ identical searches), and compact_ann_index must
shrink per-bucket file counts without changing a single result."""

import os

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def _bucket_files(path: str) -> dict[str, int]:
    out = {}
    for name in os.listdir(path):
        if name.startswith("ivf_bucket="):
            out[name] = sum(
                1 for f in os.listdir(os.path.join(path, name)) if f.endswith(".parquet")
            )
    return out


def _build(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    indexed = similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id")
    books = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16, seed=42,
        max_iter=25, n_init=4, sample_order_by="vec_id", residual_centroids=cents,
    )
    enc = similarity.pq_encode(indexed, books, "vec", "id", residual_centroids=cents)
    return df, cents, books, enc


def _search(frame, cents, books, qv):
    return [
        (r["id"], r["rank"], r["dist"])
        for r in similarity.ivfpq_topk(
            frame, cents, books, qv, k=10, n_probe=6, rerank_r=50
        ).collect()
    ]


def test_append_bit_equal_to_one_shot_build_then_compact(spark, tmp_path):
    """Save 80% of the corpus, onboard the other 20% via append: loaded rows
    == one-shot encode of the whole corpus, and every search is bit-equal.
    Then compact into a new path: fewer files per bucket, same results."""
    df, cents, books, enc = _build(spark)
    path = str(tmp_path / "idx")
    old = df.where(F.col("vec_id") % 5 != 0)
    new = df.where(F.col("vec_id") % 5 == 0)
    old_indexed = similarity.ivf_assign_buckets(old, cents, "embedding", "vec_id")
    old_enc = similarity.pq_encode(old_indexed, books, "vec", "id", residual_centroids=cents)
    similarity.save_ann_index(old_enc, path, cents, books)
    before = _bucket_files(path)

    similarity.append_to_ann_index(new, path, "embedding", "vec_id")
    after = _bucket_files(path)
    # append adds files; it must not rewrite the 80% slice
    assert sum(after.values()) > sum(before.values())
    for b, n in before.items():
        assert after[b] >= n

    loaded, cents2, books2 = similarity.load_ann_index(spark, path)
    key = lambda r: r["id"]
    whole = sorted(
        ((r["id"], list(r["vec"]), list(r["pq_code"]), r["ivf_bucket"]) for r in enc.collect()),
    )
    got = sorted(
        ((r["id"], list(r["vec"]), list(r["pq_code"]), r["ivf_bucket"]) for r in loaded.collect()),
    )
    assert got == whole

    qv = [float(x) for x in df.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    assert _search(loaded, cents2, books2, qv) == _search(enc, cents, books, qv)

    dst = str(tmp_path / "idx_v2")
    similarity.compact_ann_index(spark, path, dst)
    compacted, cents3, books3 = similarity.load_ann_index(spark, dst)
    assert _search(compacted, cents3, books3, qv) == _search(enc, cents, books, qv)
    cfiles = _bucket_files(dst)
    assert set(cfiles) == set(after)
    assert sum(cfiles.values()) <= sum(after.values())
    assert all(n == 1 for n in cfiles.values())  # tiny buckets -> one run each
    # re-running onto the same dst needs explicit overwrite; in-place rejected
    with pytest.raises(Exception):
        similarity.compact_ann_index(spark, path, dst)
    with pytest.raises(ValueError, match="src == dst"):
        similarity.compact_ann_index(spark, path, path)
    similarity.compact_ann_index(spark, path, dst, mode="overwrite")


def test_append_raw_mode_and_pure_ivf(spark, tmp_path):
    """A raw-tagged (residual_trained=False) index appends through the raw
    encode leg — exercising the r10 pq_encode bucket pass-through — and a
    pure-IVF index (no codebooks) appends assignment-only."""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    books_raw = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16, seed=42,
        max_iter=25, n_init=4, sample_order_by="vec_id",
    )
    assert books_raw.residual_trained is False
    indexed = similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id")
    enc_raw = similarity.pq_encode(indexed, books_raw, "vec", "id")
    assert "ivf_bucket" in enc_raw.columns  # r10 pass-through

    old, new = df.where(F.col("vec_id") % 4 != 0), df.where(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "raw_idx")
    old_idx = similarity.ivf_assign_buckets(old, cents, "embedding", "vec_id")
    similarity.save_ann_index(
        similarity.pq_encode(old_idx, books_raw, "vec", "id"), path, cents, books_raw
    )
    similarity.append_to_ann_index(new, path, "embedding", "vec_id")
    loaded, c2, b2 = similarity.load_ann_index(spark, path)
    assert b2.residual_trained is False
    qv = [float(x) for x in df.where(F.col("vec_id") == 3).collect()[0]["embedding"]]
    mem = similarity.ivfpq_topk(
        enc_raw, cents, books_raw, qv, k=10, n_probe=6, rerank_r=50, residual=False
    ).collect()
    disk = similarity.ivfpq_topk(
        loaded, c2, b2, qv, k=10, n_probe=6, rerank_r=50, residual=False
    ).collect()
    assert [(r["id"], r["rank"], r["dist"]) for r in disk] == [
        (r["id"], r["rank"], r["dist"]) for r in mem
    ]

    # pure IVF: no codebooks in the sidecar, append is assignment-only
    path2 = str(tmp_path / "ivf_idx")
    similarity.save_ann_index(old_idx, path2, cents, None)
    similarity.append_to_ann_index(new, path2, "embedding", "vec_id")
    loaded2, c3, b3 = similarity.load_ann_index(spark, path2)
    assert b3 is None
    mem2 = similarity.ivf_topk(indexed, cents, qv, k=10, n_probe=6).collect()
    disk2 = similarity.ivf_topk(loaded2, c3, qv, k=10, n_probe=6).collect()
    assert [(r["id"], r["rank"]) for r in disk2] == [(r["id"], r["rank"]) for r in mem2]


def test_append_guards(spark, tmp_path):
    """encode_residual: required for untagged books, rejected when it
    contradicts the tag or the index has no books; type-mismatched batches
    fail loudly BEFORE writing; skip_existing_ids drops already-indexed
    ids so a replayed batch is a no-op."""
    df, cents, books, enc = _build(spark)
    path = str(tmp_path / "idx")
    similarity.save_ann_index(enc, path, cents, books)
    batch = df.where(F.col("vec_id") < 8)

    with pytest.raises(ValueError, match="contradicts the sidecar"):
        similarity.append_to_ann_index(batch, path, "embedding", "vec_id", encode_residual=False)
    # matching flag is tolerated (harmless restatement)
    similarity.append_to_ann_index(
        batch.where(F.lit(False)), path, "embedding", "vec_id", encode_residual=True
    )

    # untagged plain-list books: ambiguous without the flag
    plain_path = str(tmp_path / "plain_idx")
    similarity.save_ann_index(enc, plain_path, cents, [list(b) for b in books])
    with pytest.raises(ValueError, match="encode_residual explicitly"):
        similarity.append_to_ann_index(batch, plain_path, "embedding", "vec_id")
    similarity.append_to_ann_index(
        batch.where(F.lit(False)), plain_path, "embedding", "vec_id", encode_residual=True
    )

    # pure IVF index: the flag is meaningless
    ivf_path = str(tmp_path / "ivf_idx")
    similarity.save_ann_index(
        similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id"), ivf_path, cents, None
    )
    with pytest.raises(ValueError, match="no codebooks"):
        similarity.append_to_ann_index(batch, ivf_path, "embedding", "vec_id", encode_residual=True)

    # a string-id batch onto a long-id index must fail before the write
    bad = batch.select(F.col("vec_id").cast("string").alias("vec_id"), "embedding")
    with pytest.raises(ValueError, match="types disagree"):
        similarity.append_to_ann_index(bad, path, "embedding", "vec_id")

    # replayed batch with skip_existing_ids: nothing appended
    before = _bucket_files(path)
    similarity.append_to_ann_index(
        batch, path, "embedding", "vec_id", skip_existing_ids=True
    )
    loaded, _, _ = similarity.load_ann_index(spark, path)
    n_all = df.count()
    assert loaded.count() == n_all
    assert loaded.select("id").distinct().count() == n_all


def test_pq_encode_without_bucket_unchanged(spark):
    """The r10 pass-through only fires when the input carries ivf_bucket:
    standalone-PQ callers see the exact pre-r10 schema."""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(32)
    books = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=8, num_centroids=8, seed=1,
        max_iter=5, n_init=1, sample_order_by="vec_id",
    )
    enc = similarity.pq_encode(df, books, "embedding", "vec_id")
    assert enc.columns == ["id", "vec", "pq_code"]


def test_append_to_lsh_index_parity_recovery_and_compact(spark, tmp_path):
    """r10: the sign-LSH append member — save 75%, append 25%: joins over
    the loaded melt are bit-equal to the in-memory join over the whole
    corpus.  A crash-recovery replay (skip_existing_ids after a simulated
    half-onboard) leaves only duplicate melt rows, which change nothing
    (candidate distinct) and are dropped by compact_lsh_index."""
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "lsh")
    old = df.where(F.col("vec_id") % 4 != 0)
    new = df.where(F.col("vec_id") % 4 == 0)
    # layout pinned: the crash simulation below hand-writes a PARTITIONED
    # melt fragment, and auto (r11) would pick flat at this scale — the
    # flat append leg is gate-certified via the entry's lsh_disk_q* rows
    similarity.save_lsh_index(old, path, "embedding", "vec_id", layout="bucketed")
    similarity.append_to_lsh_index(new, path, "embedding", "vec_id")

    queries = df.where(F.col("vec_id").isin(0, 7, 13)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    mem = similarity.ann_lsh_topk_join(
        queries, df, "embedding", "vec_id", "embedding", "qid", k=10
    ).collect()
    want = sorted((r["query_id"], r["id"], r["rank"]) for r in mem)

    def got(p):
        disk = similarity.ann_lsh_topk_join(
            queries, None, "", "", "embedding", "qid", k=10,
            corpus_index=similarity.load_lsh_index(spark, p),
        ).collect()
        return sorted((r["query_id"], r["id"], r["rank"]) for r in disk)

    assert got(path) == want

    # replayed batch with the guard: nothing new lands in vecs
    idx = similarity.load_lsh_index(spark, path)
    n_vecs = idx.vecs.count()
    n_melt = idx.melt.count()
    similarity.append_to_lsh_index(new, path, "embedding", "vec_id", skip_existing_ids=True)
    idx2 = similarity.load_lsh_index(spark, path)
    assert idx2.vecs.count() == n_vecs
    assert idx2.melt.count() == n_melt

    # simulated crash: melt rows landed, floats didn't.  Searches degrade
    # to 'batch absent', never to wrong neighbors; the skip_existing
    # re-run reprocesses the batch (duplicating melt rows harmlessly)
    crash_batch = spark.createDataFrame(
        [(990001, [float(x) for x in range(64)])], "vec_id long, embedding array<double>"
    )
    melt_only = similarity._lsh_melt(
        crash_batch.select(F.col("vec_id").alias("id"),
                           F.col("embedding").cast("array<double>").alias("vec")),
        "vec", ["id"], idx2.num_planes, idx2.num_tables, idx2.seed,
    )
    melt_only.repartition("t", "b").write.partitionBy("t", "b").mode("append").parquet(
        path + "/melt"
    )
    assert got(path) == want  # orphan melt rows change nothing
    similarity.append_to_lsh_index(crash_batch, path, "embedding", "vec_id",
                                   skip_existing_ids=True)
    idx3 = similarity.load_lsh_index(spark, path)
    dup = idx3.melt.groupBy("id", "t", "b").count().where("count > 1")
    assert dup.count() > 0  # recovery really left duplicates
    base = got(path)

    dst = str(tmp_path / "lsh_v2")
    similarity.compact_lsh_index(spark, path, dst)
    idx4 = similarity.load_lsh_index(spark, dst)
    assert idx4.melt.groupBy("id", "t", "b").count().where("count > 1").count() == 0
    assert got(dst) == base  # compaction changes nothing
    assert idx4.meta == idx3.meta

    # schema guard: string ids onto a long-id index fail before writing
    bad = new.select(F.col("vec_id").cast("string").alias("vec_id"), "embedding")
    with pytest.raises(ValueError, match="disagrees"):
        similarity.append_to_lsh_index(bad, path, "embedding", "vec_id")


def test_remove_from_ann_index_tombstones(spark, tmp_path):
    """r10: tombstone deletion — removed vectors vanish from searches
    immediately (bit-equal to an index built without them), compaction
    applies the delete physically and clears the tombstones, and a
    re-append after compaction genuinely re-onboards."""
    df, cents, books, enc = _build(spark)
    path = str(tmp_path / "idx")
    similarity.save_ann_index(enc, path, cents, books)
    qv = [float(x) for x in df.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    loaded0, c0, b0 = similarity.load_ann_index(spark, path)
    base = _search(loaded0, c0, b0, qv)
    victims = [r[0] for r in base[:3]]  # remove three of the top hits

    similarity.remove_from_ann_index(spark, path, victims)
    loaded1, c1, b1 = similarity.load_ann_index(spark, path)
    got = _search(loaded1, c1, b1, qv)
    want = _search(enc.where(~F.col("id").isin(victims)), cents, books, qv)
    assert got == want
    assert not {v for v in victims} & {r[0] for r in got}

    # physical apply: compacted copy is smaller, has no tombstones, same results
    import os
    dst = str(tmp_path / "idx_v2")
    similarity.compact_ann_index(spark, path, dst)
    assert not os.path.exists(os.path.join(dst, "_tombstones"))
    loaded2, c2, b2 = similarity.load_ann_index(spark, dst)
    assert loaded2.count() == df.count() - 3
    assert _search(loaded2, c2, b2, qv) == want

    # removal wins over a post-removal append of the same id...
    similarity.append_to_ann_index(
        df.where(F.col("vec_id") == victims[0]), path, "embedding", "vec_id"
    )
    loaded3, c3, b3 = similarity.load_ann_index(spark, path)
    assert _search(loaded3, c3, b3, qv) == want
    # ...but re-onboarding works on the compacted copy
    similarity.append_to_ann_index(
        df.where(F.col("vec_id") == victims[0]), dst, "embedding", "vec_id"
    )
    loaded4, c4, b4 = similarity.load_ann_index(spark, dst)
    partial = _search(
        enc.where(~F.col("id").isin(victims[1:])), cents, books, qv
    )
    assert _search(loaded4, c4, b4, qv) == partial

    # LSH family through the same entry point
    lpath = str(tmp_path / "lsh")
    similarity.save_lsh_index(df, lpath, "embedding", "vec_id")
    queries = df.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("qid"), "embedding")
    similarity.remove_from_ann_index(spark, lpath, victims)
    got_l = sorted(
        (r["id"], r["rank"]) for r in similarity.ann_lsh_topk_join(
            queries, None, "", "", "embedding", "qid", k=10,
            corpus_index=similarity.load_lsh_index(spark, lpath),
        ).collect()
    )
    want_l = sorted(
        (r["id"], r["rank"]) for r in similarity.ann_lsh_topk_join(
            queries, df.where(~F.col("vec_id").isin(victims)), "embedding", "vec_id",
            "embedding", "qid", k=10,
        ).collect()
    )
    assert got_l == want_l
    ldst = str(tmp_path / "lsh_v2")
    similarity.compact_lsh_index(spark, lpath, ldst)
    assert not os.path.exists(os.path.join(ldst, "_tombstones"))
    lidx = similarity.load_lsh_index(spark, ldst)
    assert lidx.vecs.count() == df.count() - 3


def test_index_stats_reports_health(spark, tmp_path):
    """r10: the maintenance-decision numbers — live rows (tombstones
    excluded, debt reported separately), per-partition file accumulation
    growing with appends and collapsing after compaction, bucket skew."""
    from dqx_spark.pipeline import dedup_index as di

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=4, seed=1, max_iter=5, n_init=1,
        sample_order_by="vec_id",
    )
    path = str(tmp_path / "idx")
    similarity.save_ann_index(
        similarity.ivf_assign_buckets(df.where(F.col("vec_id") % 2 == 0), cents,
                                      "embedding", "vec_id"),
        path, cents, None,
    )
    s0 = similarity.ann_index_stats(spark, path)
    similarity.append_to_ann_index(df.where(F.col("vec_id") % 2 == 1), path,
                                   "embedding", "vec_id")
    s1 = similarity.ann_index_stats(spark, path)
    assert s1["rows"] == df.count()
    assert s1["data_files"] > s0["data_files"]
    assert s1["files_per_partition"] > s0["files_per_partition"]
    assert s1["method"] == "ivf" and s1["tombstoned"] == 0
    assert s1["rows_max"] >= s1["rows_median"] >= s1["rows_min"]
    assert s1["bucket_skew"] >= 1.0

    similarity.remove_from_ann_index(spark, path, [0, 1])
    s2 = similarity.ann_index_stats(spark, path)
    assert s2["tombstoned"] == 2 and s2["rows"] == df.count() - 2

    dst = str(tmp_path / "idx_v2")
    similarity.compact_ann_index(spark, path, dst)
    s3 = similarity.ann_index_stats(spark, dst)
    assert s3["tombstoned"] == 0 and s3["rows"] == df.count() - 2
    assert s3["files_per_partition"] <= s1["files_per_partition"]

    # lsh family
    lpath = str(tmp_path / "lsh")
    similarity.save_lsh_index(df, lpath, "embedding", "vec_id", num_planes=4, num_tables=4)
    sl = similarity.ann_index_stats(spark, lpath)
    assert sl["method"] == "lsh" and sl["rows"] == df.count() * 4  # one melt row per table

    # dedup sibling
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    dpath = str(tmp_path / "dd")
    di.save_dedup_index(docs, dpath, "doc_id", "text", method="minhash",
                        num_hashes=32, bands=8, shingle_k=3, partitions=8)
    ds = di.index_stats(di.load_dedup_index(spark, dpath))
    assert ds["method"] == "minhash" and ds["state_rows"] > 0
    assert ds["partitions_configured"] == 8 and "ledger_pairs" in ds
    di.remove_from_index(di.load_dedup_index(spark, dpath), [docs.collect()[0]["doc_id"]])
    ds2 = di.index_stats(di.load_dedup_index(spark, dpath))
    assert ds2["tombstoned"] == 1 and ds2["state_rows"] < ds["state_rows"]
