"""Incremental dedup against persisted state (r10): for each method the
ledger after save → probe → append equals a full corpus-at-once rerun on
the union, through a REAL disk round trip; plus the greedy view, the mode
guards, and the append-order safety."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import dedup, dedup_index as di


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog while rain falls on the plain in spain"
    rows = []
    for i in range(12):
        if i % 4 == 1:
            # near-dup of the previous doc: one token changed
            rows.append((i, rows[-1][1].replace("fox", "cat")))
        elif i % 4 == 2:
            # exact dup of doc i-2
            rows.append((i, rows[-2][1]))
        else:
            rows.append((i, f"{base} unique tail {i} with extra words number {i * 7}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairset(df, round_score=6):
    return sorted(
        (r["id_a"], r["id_b"], round(float(r["score"]), round_score)) for r in df.collect()
    )


def _split(df):
    return df.where(F.col("doc_id") % 2 == 0), df.where(F.col("doc_id") % 2 == 1)


def test_minhash_incremental_equals_full(spark, tmp_path):
    df = _docs(spark)
    old, new = _split(df)
    path = str(tmp_path / "idx")
    di.save_dedup_index(
        old, path, "doc_id", "text", method="minhash",
        num_hashes=32, bands=8, shingle_k=3, threshold=0.5, partitions=16,
    )
    idx = di.load_dedup_index(spark, path)
    new_pairs = di.dedup_pairs_against_index(new, idx, "doc_id", "text")
    di.append_to_index(new, idx, "doc_id", "text", new_pairs=new_pairs)
    ledger = di.load_dedup_index(spark, path).pairs

    full = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3, threshold=0.5
    ).withColumnRenamed("est_jaccard", "score")
    assert _pairset(ledger) == _pairset(full)
    assert len(_pairset(ledger)) > 0  # the fixture really has cross-split near-dups

    # kept-set == full-rerun components + min-id keeper
    kept = sorted(r["id"] for r in di.index_kept_ids(idx).where("kept").collect())
    groups = dedup.connected_components(full, df.select(F.col("doc_id").alias("id")))
    full_kept = sorted(
        r["id"] for r in groups.where(F.col("id") == F.col("group_id")).collect()
    )
    assert kept == full_kept


def test_exact_incremental_equals_full(spark, tmp_path):
    df = _docs(spark)
    old, new = _split(df)
    path = str(tmp_path / "idx")
    di.save_dedup_index(old, path, "doc_id", "text", method="exact", partitions=16)
    idx = di.load_dedup_index(spark, path)
    di.append_to_index(new, idx, "doc_id", "text")
    kept = sorted(r["id"] for r in di.index_kept_ids(idx).where("kept").collect())
    full_kept = sorted(
        r["doc_id"] for r in dedup.drop_exact_duplicates(df, "doc_id", "text").collect()
    )
    assert kept == full_kept
    # the id universe covers every onboarded doc, accepted or not
    assert idx.all_ids().count() == df.count()


def test_simhash_incremental_equals_full(spark, tmp_path):
    df = _docs(spark)
    old, new = _split(df)
    path = str(tmp_path / "idx")
    di.save_dedup_index(old, path, "doc_id", "text", method="simhash", max_hamming=3, partitions=16)
    idx = di.load_dedup_index(spark, path)
    di.append_to_index(new, idx, "doc_id", "text")
    ledger = di.load_dedup_index(spark, path).pairs
    full = dedup.simhash_duplicate_pairs(df, "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("double").alias("score")
    )
    assert _pairset(ledger) == _pairset(full)
    assert len(_pairset(ledger)) > 0


def test_greedy_view_flags(spark, tmp_path):
    df = _docs(spark)
    old, new = _split(df)
    path = str(tmp_path / "idx")
    di.save_dedup_index(old, path, "doc_id", "text", method="exact", partitions=8)
    idx = di.load_dedup_index(spark, path)
    out = di.dedup_against_index(new, idx, "doc_id", "text")
    rows = {r["doc_id"]: (r["matched_index"], r["kept"]) for r in out.collect()}
    assert set(rows) == {r["doc_id"] for r in new.collect()}  # every new row verdicted
    # a new exact copy of an old doc is matched and not kept
    old_texts = {r["text"] for r in old.collect()}
    for r in new.collect():
        if r["text"] in old_texts:
            assert rows[r["doc_id"]] == (True, False)
    # at least one genuinely new doc is kept
    assert any(kept for (_, kept) in rows.values())


def test_append_lazy_pairs_not_double_counted(spark, tmp_path):
    """Passing the LAZY pairs frame into append_to_index must score the
    batch against the PRE-append state: the write happens before the
    band/sig appends, so the plan cannot see the batch's own rows as
    'old' and re-discover within-batch pairs as cross pairs."""
    df = _docs(spark)
    old, new = _split(df)
    path = str(tmp_path / "idx")
    di.save_dedup_index(old, path, "doc_id", "text", method="minhash",
                        num_hashes=32, bands=8, shingle_k=3, partitions=16)
    idx = di.load_dedup_index(spark, path)
    lazy_pairs = di.dedup_pairs_against_index(new, idx, "doc_id", "text")  # NOT materialized
    di.append_to_index(new, idx, "doc_id", "text", new_pairs=lazy_pairs)
    ledger = di.load_dedup_index(spark, path).pairs.select("id_a", "id_b")
    assert ledger.count() == ledger.distinct().count()


def test_save_mode_guards(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="append_to_index"):
        di.save_dedup_index(df, path, "doc_id", "text", mode="append")
    di.save_dedup_index(df, path, "doc_id", "text", method="exact", partitions=8)
    with pytest.raises(Exception):  # noqa: B017 - Spark raises AnalysisException
        di.save_dedup_index(df, path, "doc_id", "text", method="exact",
                            partitions=8, mode="errorifexists")
    # no-ledger index refuses kept-set derivation with a pointed message
    p2 = str(tmp_path / "idx2")
    di.save_dedup_index(df, p2, "doc_id", "text", method="exact", partitions=8,
                        include_pairs=False)
    idx2 = di.load_dedup_index(spark, p2)
    with pytest.raises(ValueError, match="include_pairs"):
        _ = idx2.pairs


def test_disjoint_batch_zero_collisions(spark, tmp_path):
    """A batch with band probes but ZERO state collisions must return an
    empty pair frame (r10 review: the candidate-id pb list is empty there,
    and an empty isin() is not a valid In expression — _pruned prunes
    everything instead of crashing)."""
    old = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta tail {i}") for i in range(6)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"omicron sigma lambda kappa phi chi psi omega tail {i}") for i in range(4)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    di.save_dedup_index(old, path, "doc_id", "text", method="minhash",
                        num_hashes=32, bands=4, shingle_k=3, partitions=16)
    idx = di.load_dedup_index(spark, path)
    pairs = di.dedup_pairs_against_index(new, idx, "doc_id", "text")
    # within-batch pairs may exist in principle but these texts differ per
    # row too; the load-bearing assertion is "no crash + no cross pairs"
    old_ids = {r["doc_id"] for r in old.collect()}
    assert not any(
        r["id_a"] in old_ids or r["id_b"] in old_ids for r in pairs.collect()
    )


def test_compact_dedup_index_invariant_and_fewer_files(spark, tmp_path):
    """r10: compaction into a new path changes neither the probe results
    nor the kept-set, restores one file run per pb partition, and copies
    the sidecar verbatim; in-place and silent-overwrite are rejected."""
    import os

    df = _docs(spark)
    old, new = _split(df)
    src = str(tmp_path / "idx")
    di.save_dedup_index(
        old, src, "doc_id", "text", method="minhash",
        num_hashes=32, bands=8, shingle_k=3, threshold=0.5, partitions=8,
    )
    idx = di.load_dedup_index(spark, src)
    di.append_to_index(new, idx, "doc_id", "text")

    def n_files(sub):
        total = 0
        for root, _, files in os.walk(os.path.join(src if sub is None else dst, sub or "")):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    dst = str(tmp_path / "idx_v2")
    di.compact_dedup_index(spark, src, dst)
    cidx = di.load_dedup_index(spark, dst)
    assert cidx.meta == idx.meta

    kept_src = sorted(r["id"] for r in di.index_kept_ids(idx).where("kept").collect())
    kept_dst = sorted(r["id"] for r in di.index_kept_ids(cidx).where("kept").collect())
    assert kept_dst == kept_src

    probe = spark.createDataFrame([(100, old.collect()[0]["text"])], "doc_id long, text string")
    p_src = _pairset(di.dedup_pairs_against_index(probe, idx, "doc_id", "text"))
    p_dst = _pairset(di.dedup_pairs_against_index(probe, cidx, "doc_id", "text"))
    assert p_dst == p_src and len(p_dst) > 0

    # appended src holds >= 2 file runs per touched partition; compacted
    # dst collapses to at most one per partition
    def files_per_pb(base, sub):
        out = {}
        subdir = os.path.join(base, sub)
        for name in os.listdir(subdir):
            if name.startswith("pb="):
                out[name] = sum(
                    1 for f in os.listdir(os.path.join(subdir, name)) if f.endswith(".parquet")
                )
        return out
    src_files = files_per_pb(src, "bands")
    dst_files = files_per_pb(dst, "bands")
    assert sum(dst_files.values()) < sum(src_files.values())
    assert all(n == 1 for n in dst_files.values())

    with pytest.raises(Exception):
        di.compact_dedup_index(spark, src, dst)  # dst exists, no overwrite
    with pytest.raises(ValueError, match="src == dst"):
        di.compact_dedup_index(spark, src, src)
    di.compact_dedup_index(spark, src, dst, mode="overwrite")


def test_remove_from_index_reelects_keeper_and_compacts(spark, tmp_path):
    """r10: tombstoning a group KEEPER re-elects the min surviving id, the
    kept-set equals a full rerun on the surviving corpus, probes stop
    pairing against removed docs, and compaction applies the delete
    physically (no _tombstones in the compacted copy)."""
    import os

    df = _docs(spark)
    path = str(tmp_path / "idx")
    di.save_dedup_index(
        df, path, "doc_id", "text", method="minhash",
        num_hashes=32, bands=8, shingle_k=3, threshold=0.5, partitions=8,
    )
    idx = di.load_dedup_index(spark, path)
    kept0 = {r["id"] for r in di.index_kept_ids(idx).where("kept").collect()}
    # doc 0's group {0,1,2}: keeper is 0 — remove it
    assert 0 in kept0 and 1 not in kept0
    di.remove_from_index(idx, [0])

    survivors = df.where(F.col("doc_id") != 0)
    kept1 = {r["id"] for r in di.index_kept_ids(idx).where("kept").collect()}
    full = dedup.minhash_lsh_pairs(
        survivors, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3, threshold=0.5
    ).withColumnRenamed("est_jaccard", "score")
    groups = dedup.connected_components(full, survivors.select(F.col("doc_id").alias("id")))
    want = {r["id"] for r in groups.where(F.col("id") == F.col("group_id")).collect()}
    assert kept1 == want
    assert 0 not in kept1
    assert idx.all_ids().count() == df.count() - 1

    # probing with a near-copy of doc 0's text no longer pairs against 0
    probe = spark.createDataFrame(
        [(500, df.where(F.col("doc_id") == 0).collect()[0]["text"])], "doc_id long, text string"
    )
    pairs = di.dedup_pairs_against_index(probe, idx, "doc_id", "text")
    partners = {r["id_a"] for r in pairs.collect()} | {r["id_b"] for r in pairs.collect()}
    assert 0 not in partners and len(partners) > 0  # still finds 1 and 2

    dst = str(tmp_path / "idx_v2")
    di.compact_dedup_index(spark, path, dst)
    assert not os.path.exists(os.path.join(dst, "_tombstones"))
    cidx = di.load_dedup_index(spark, dst)
    assert cidx.tombstones is None
    assert cidx.all_ids().count() == df.count() - 1
    assert {r["id"] for r in di.index_kept_ids(cidx).where("kept").collect()} == want


def test_remove_exact_keeper_reelects_min_survivor(spark, tmp_path):
    """r11 (r10 ADVICE high): on an EXACT index the pair ledger is
    star-shaped, so kept-set derivation must come from the keys table —
    tombstoning a group's keeper (the star hub) must re-elect the min
    SURVIVING member, not promote every surviving duplicate to a
    singleton keeper."""
    df = _docs(spark)  # doc 0's exact-dup group under _docs is {0, 2} via i%4==2
    # build a 3-member exact group explicitly: 0, 2 share text; add 20 as a copy
    extra = spark.createDataFrame(
        [(20, df.where(F.col("doc_id") == 0).collect()[0]["text"])], "doc_id long, text string"
    )
    corpus = df.unionByName(extra)
    path = str(tmp_path / "idx")
    di.save_dedup_index(corpus, path, "doc_id", "text", method="exact", partitions=8)
    idx = di.load_dedup_index(spark, path)
    kept0 = {r["id"] for r in di.index_kept_ids(idx).where("kept").collect()}
    assert 0 in kept0 and 2 not in kept0 and 20 not in kept0

    di.remove_from_index(idx, [0])
    kept1 = {r["id"] for r in di.index_kept_ids(idx).where("kept").collect()}
    survivors = corpus.where(F.col("doc_id") != 0)
    want = {
        r["doc_id"]
        for r in dedup.drop_exact_duplicates(survivors, "doc_id", "text").collect()
    }
    assert kept1 == want
    # exactly one of the surviving copies {2, 20} is kept — the min
    assert 2 in kept1 and 20 not in kept1

    # removing a NON-keeper member leaves the keeper and drops the member
    di.remove_from_index(idx, [2])
    kept2 = {r["id"] for r in di.index_kept_ids(idx).where("kept").collect()}
    assert 20 in kept2 and 2 not in kept2 and 0 not in kept2


def test_batch_state_reuse_parity(spark, tmp_path):
    """r11 (VERDICT r10 #6): one batch_state frame handed to BOTH probe and
    append must leave the ledger and kept-set identical to the recompute
    path — per-doc state is a pure function of the document, so sharing
    the materialized signature pass is exact.  Covers all three methods
    (minhash ledger equality; exact/simhash kept-set equality)."""
    df = _docs(spark)
    old, new = _split(df)
    for method, kw in (
        ("minhash", dict(num_hashes=32, bands=8, shingle_k=3, threshold=0.5)),
        ("exact", {}),
        ("simhash", dict(max_hamming=3)),
    ):
        p_shared = str(tmp_path / f"{method}_shared")
        p_plain = str(tmp_path / f"{method}_plain")
        for p in (p_shared, p_plain):
            di.save_dedup_index(old, p, "doc_id", "text", method=method, partitions=16, **kw)
        idx_s = di.load_dedup_index(spark, p_shared)
        st = di.batch_state(new, idx_s, "doc_id", "text")
        pairs_s = di.dedup_pairs_against_index(new, idx_s, "doc_id", "text", state=st)
        di.append_to_index(new, idx_s, "doc_id", "text", new_pairs=pairs_s, state=st)
        idx_p = di.load_dedup_index(spark, p_plain)
        di.append_to_index(new, idx_p, "doc_id", "text")
        if method != "exact":  # the exact index keeps a star ledger, compare kept-sets below
            assert _pairset(di.load_dedup_index(spark, p_shared).pairs) == _pairset(
                di.load_dedup_index(spark, p_plain).pairs
            )
        kept = lambda i: sorted(  # noqa: E731
            r["id"] for r in di.index_kept_ids(i).where("kept").collect()
        )
        assert kept(di.load_dedup_index(spark, p_shared)) == kept(
            di.load_dedup_index(spark, p_plain)
        )


def test_prune_join_mode_parity(spark, tmp_path):
    """r11 (VERDICT r10 #6): prune='join' (pb rides the equi-join keys, no
    driver pb-collects) must produce the same pair set as prune='static'
    (collected isin pushdown) for every method — pb adds no selectivity to
    key-equality, it only changes HOW the state scan gets pruned."""
    df = _docs(spark)
    old, new = _split(df)
    for method, kw in (
        ("minhash", dict(num_hashes=32, bands=8, shingle_k=3, threshold=0.5)),
        ("exact", {}),
        ("simhash", dict(max_hamming=3)),
    ):
        p = str(tmp_path / method)
        di.save_dedup_index(old, p, "doc_id", "text", method=method, partitions=16, **kw)
        idx = di.load_dedup_index(spark, p)
        st = di.batch_state(new, idx, "doc_id", "text")
        a = _pairset(di.dedup_pairs_against_index(
            new, idx, "doc_id", "text", state=st, prune="static"))
        b = _pairset(di.dedup_pairs_against_index(
            new, idx, "doc_id", "text", state=st, prune="join"))
        c = _pairset(di.dedup_pairs_against_index(
            new, idx, "doc_id", "text", state=st, prune="join", broadcast_probes=True))
        # only minhash has cross-split pairs the probe can see in this
        # fixture (exact dups are even<->even i.e. old<->old; the one-token
        # simhash neighbors exceed max_hamming here) — the minhash leg is
        # the non-vacuous equality, the others certify the empty agreement
        assert a == b == c and (method != "minhash" or len(a) > 0)
    with pytest.raises(ValueError, match="prune"):
        di.dedup_pairs_against_index(new, idx, "doc_id", "text", prune="bogus")
