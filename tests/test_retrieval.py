"""BM25 retrieval + persisted inverted index (r12).

* formula correctness against a pure-Python BM25 twin (same Lucene idf,
  same sorted-fold summation order);
* persisted index: incremental (empty seed + N appends) == corpus-at-once
  BIT-EQUAL, across a mid-story store compaction;
* handle freshness + structural empty-layout fallbacks (the family
  contracts shared with the dedup/LSH indexes);
* streaming sink: real micro-batches, mid-stream compaction, plain-path
  guard;
* prefix-filtered exact Jaccard join == naive inverted-index join.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import dedup, retrieval, text_index as ti

DOCS = [
    (0, "spark shuffles data between stages"),
    (1, "spark broadcasts small tables to every executor"),
    (2, "the optimizer prunes partitions before the scan"),
    (3, "data data data everywhere and not a row to keep"),
    (4, "executor memory pressure spills the shuffle to disk"),
    (5, "Spark SPARK spark"),  # lowercase folding
    (6, ""),  # empty doc: dl 0, matches nothing
    (7, None),  # null text
]
QUERIES = [(1, "spark data"), (2, "partition scan optimizer"), (3, "zebra")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Pure-Python twin: same formula, same distinct-query-terms rule,
    same sorted-fold order."""
    toks = {i: (t or "").lower().split() for i, t in docs}
    dls = {i: len(ws) for i, ws in toks.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    dfc = {}
    tfs = {}
    for i, ws in toks.items():
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
        for w in ws:
            tfs[(i, w)] = tfs.get((i, w), 0) + 1
    out = {}
    for qid, qt in queries:
        terms = sorted(set(qt.lower().split()))
        for i in toks:
            contribs = []
            for w in terms:
                tf = tfs.get((i, w))
                if tf is None:
                    continue
                idf = math.log(1 + (n - dfc[w] + 0.5) / (dfc[w] + 0.5))
                contribs.append((w, idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))))
            if contribs:
                acc = 0.0
                for _, c in sorted(contribs):
                    acc += c
                out[(qid, i)] = (len(contribs), acc)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, "qid int, qtext string")


def test_bm25_scores_match_python_twin(spark, docs_df, queries_df):
    got = {
        (r["qid"], r["id"]): (r["n_matched"], r["score"])
        for r in retrieval.bm25_scores(docs_df, queries_df, "doc_id", "text").collect()
    }
    want = _py_bm25(DOCS, QUERIES)
    assert set(got) == set(want)
    for key, (nm, sc) in want.items():
        assert got[key][0] == nm
        # same fold order; only libm-vs-JVM ln ulps can differ
        assert got[key][1] == pytest.approx(sc, rel=1e-12)
    # the zebra query matches nothing; empty/null docs match nothing
    assert not any(q == 3 for q, _ in got)
    assert not any(i in (6, 7) for _, i in got)


def test_bm25_topk_rank_contract(spark, docs_df, queries_df):
    out = retrieval.bm25_topk(docs_df, queries_df, "doc_id", "text", k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # score descending, id ascending on ties
        for a, b in zip(rows, rows[1:]):
            assert (a["score"], -a["id"]) >= (b["score"], -b["id"])
    # doc 3 ("data data data") dominates 'spark data' for the data term but
    # doc 0/1/5 carry spark; top-1 for query 1 must be a real argmax
    scores = {
        (r["qid"], r["id"]): r["score"]
        for r in retrieval.bm25_scores(docs_df, queries_df, "doc_id", "text").collect()
    }
    top1 = by_q[1][0]
    assert top1["score"] == max(v for (q, _), v in scores.items() if q == 1)


def test_index_incremental_equals_at_once_across_compaction(spark, tmp_path, docs_df, queries_df):
    root = str(tmp_path / "store")
    ti.init_text_store(docs_df.limit(0), root, "doc_id", "text", partitions=8)
    cur = ti.current_text_store_version(spark, root)
    # 3 appends, compact after the second (partials merged mid-story)
    ti.append_to_text_index(cur, docs_df.where(F.col("doc_id") % 3 == 0))
    ti.append_to_text_index(cur, docs_df.where(F.col("doc_id") % 3 == 1))
    cur = ti.compact_text_store(spark, root)
    assert cur.endswith("/v1")
    ti.append_to_text_index(cur, docs_df.where(F.col("doc_id") % 3 == 2))

    idx = ti.load_text_index(spark, cur)
    got = sorted(
        tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=5, tie_rounding=6).collect()
    )
    want = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(
            docs_df, queries_df, "doc_id", "text", k=5, tie_rounding=6
        ).collect()
    )
    assert got == want, "incremental index must be BIT-equal to corpus-at-once"
    # exact-integer merge: stats partials sum to the corpus truth
    st = ti.text_index_stats(idx)
    assert st["n_docs"] == len(DOCS)
    assert st["appends_since_compact"] == 1  # compaction folded the first two


def test_index_prune_static_partition_filters(spark, tmp_path, docs_df, queries_df):
    path = str(tmp_path / "idx")
    ti.save_text_index(docs_df, path, "doc_id", "text", partitions=8)
    idx = ti.load_text_index(spark, path)
    plan = (
        ti.bm25_topk_index(idx, queries_df, k=3, prune="static")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    hits = re.findall(r"PartitionFilters: \[[^\]]*\bpb\b", plan)
    assert len(hits) >= 2, "postings AND terms scans must be partition-pruned"
    # prune='none' answers identically (one SQL execution, full melt scan)
    a = sorted(tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=3, prune="none").collect())
    b = sorted(tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=3, prune="static").collect())
    assert a == b
    with pytest.raises(ValueError, match="prune"):
        ti.bm25_topk_index(idx, queries_df, prune="bogus")


def test_index_handle_freshness_and_guards(spark, tmp_path, docs_df, queries_df):
    path = str(tmp_path / "idx")
    ti.save_text_index(docs_df.where("doc_id < 4"), path, "doc_id", "text", partitions=4)
    idx = ti.load_text_index(spark, path)
    assert not idx._stale
    ti.append_to_text_index(path, docs_df.where("doc_id >= 4"), handle=idx)
    assert idx._stale, "append through a handle must mark it stale"
    with pytest.raises(ValueError, match="handle is for"):
        ti.append_to_text_index(str(tmp_path / "other"), docs_df, handle=idx)
    # fresh load observes the append
    idx2 = ti.load_text_index(spark, path)
    assert ti.text_index_stats(idx2)["n_docs"] == len(DOCS)
    # not-an-index path refuses loudly
    with pytest.raises(ValueError, match="not a text index"):
        ti.load_text_index(spark, str(tmp_path / "nothing"))


def test_empty_seed_index_is_first_class(spark, tmp_path, docs_df, queries_df):
    path = str(tmp_path / "empty")
    ti.save_text_index(docs_df.limit(0), path, "doc_id", "text", partitions=4)
    idx = ti.load_text_index(spark, path)
    assert ti.bm25_topk_index(idx, queries_df, k=3).count() == 0
    st = ti.text_index_stats(idx)
    assert st["n_docs"] == 0 and st["rows"] == 0


def test_text_index_sink_micro_batches_and_mid_stream_compaction(spark, tmp_path, docs_df, queries_df):
    from dqx_spark.streaming import text_index_sink

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for b in range(3):
        docs_df.where(F.col("doc_id") % 3 == b).coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "store")
    ti.init_text_store(
        spark.createDataFrame([], "doc_id long, text string"), root, "doc_id", "text",
        partitions=8,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(text_index_sink(root, compact_every=2))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    cur = ti.current_text_store_version(spark, root)
    assert cur == root + "/v1", "compaction fired mid-stream after batch 2"
    idx = ti.load_text_index(spark, cur)
    got = sorted(
        tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=5, tie_rounding=6).collect()
    )
    want = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(
            docs_df, queries_df, "doc_id", "text", k=5, tie_rounding=6
        ).collect()
    )
    assert got == want, "streamed index must answer bit-equal to corpus-at-once"

    # plain index path + maintenance knobs refuses loudly
    plain = str(tmp_path / "plain")
    ti.save_text_index(docs_df.limit(0), plain, "doc_id", "text", partitions=4)
    sink = text_index_sink(plain, compact_every=1)
    with pytest.raises(ValueError, match="versioned store"):
        sink(docs_df, 0)


def test_prefix_jaccard_equals_naive(spark):
    # handcrafted corpus with a HOT shingle family (shared boilerplate) so
    # the prefix index and the doc-freq cap both have something to bite on
    boiler = "all rights reserved contact us terms of service apply"
    rows = []
    for i in range(30):
        if i % 6 == 0:
            rows.append((i, boiler + f" page {i // 6}"))
        elif i % 6 == 1:
            rows.append((i, boiler + f" page {i // 6} extra"))
        else:
            rows.append((i, f"unique document {i} about topic {i * 13} term {i * 7} filler {i * 29} more {i * 31} end {i * 37}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.3, 0.5, 0.8):
        for cap in (None, 5):
            a = sorted(
                tuple(r)
                for r in dedup.ngram_jaccard_pairs(
                    df, "doc_id", "text", k=3, threshold=thr, max_shingle_doc_freq=cap
                ).collect()
            )
            b = sorted(
                tuple(r)
                for r in dedup.prefix_jaccard_pairs(
                    df, "doc_id", "text", k=3, threshold=thr, max_shingle_doc_freq=cap
                ).collect()
            )
            assert a == b, f"thr={thr} cap={cap}: prefix filtering changed the answer"
            if cap is None:
                assert len(a) > 0, f"thr={thr}: fixture must produce duplicate pairs"


def test_prefix_index_is_smaller_than_full_postings(spark):
    """The scale claim: at t=0.8 the prefix index holds ~20-25% of the
    postings (p = |x| - ceil(0.8|x|) + 1)."""
    from dqx_spark.pipeline.text import exploded_shingle_hashes

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = exploded_shingle_hashes(df, "doc_id", "text", 5).count()
    # re-derive the prefix size the operator indexes
    from pyspark.sql import Window as W

    sh = exploded_shingle_hashes(df, "doc_id", "text", 5).withColumnRenamed("h", "shingle")
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    w = W.partitionBy("id").orderBy(F.col("df_").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("id")))
    )
    thr = 0.8
    plen = F.col("sz") - F.ceil(F.lit(thr) * F.col("sz") - F.lit(1e-9)) + F.lit(1)
    prefix = ranked.where(F.col("pos") <= plen).count()
    assert prefix < 0.3 * full, (prefix, full)


def test_atomic_append_crash_and_replay_semantics(spark, tmp_path, docs_df, queries_df, monkeypatch):
    """The commit-marker contract (r12): a crash BEFORE the marker leaves
    nothing visible; a retry under the same txn_id clears its own
    leftovers and applies ONCE; a replay of a committed txn is skipped;
    and the skip survives a compaction (marker ledger carried forward)."""
    path = str(tmp_path / "idx")
    ti.save_text_index(docs_df.where("doc_id < 4"), path, "doc_id", "text", partitions=4)
    before = sorted(
        tuple(r)
        for r in ti.bm25_topk_index(
            ti.load_text_index(spark, path), queries_df, k=5, tie_rounding=6
        ).collect()
    )

    batch = docs_df.where("doc_id >= 4")
    # crash mid-append: marker create blows up AFTER the data writes
    real_mark = ti._mark_committed

    def boom(spark_, root, txn):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(ti, "_mark_committed", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ti.append_to_text_index(path, batch, txn_id="b7")
    monkeypatch.setattr(ti, "_mark_committed", real_mark)

    # the crashed append is INVISIBLE: same answers, same stats
    idx = ti.load_text_index(spark, path)
    assert (
        sorted(tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=5, tie_rounding=6).collect())
        == before
    )
    assert ti.text_index_stats(idx)["n_docs"] == 4

    # retry under the SAME txn applies exactly once (leftovers cleared)
    assert ti.append_to_text_index(path, batch, txn_id="b7") is True
    idx = ti.load_text_index(spark, path)
    assert ti.text_index_stats(idx)["n_docs"] == len(DOCS)
    after = sorted(
        tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=5, tie_rounding=6).collect()
    )
    want = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(
            docs_df, queries_df, "doc_id", "text", k=5, tie_rounding=6
        ).collect()
    )
    assert after == want, "retry must not double-count the crashed attempt's rows"

    # replay of a committed txn: skipped, state unchanged
    assert ti.append_to_text_index(path, batch, txn_id="b7") is False
    assert ti.text_index_stats(ti.load_text_index(spark, path))["n_docs"] == len(DOCS)

    # the skip survives compaction: marker ledger carried forward
    dst = str(tmp_path / "idx_v2")
    ti.compact_text_index(spark, path, dst)
    assert "b7" in ti.load_text_index(spark, dst).commits
    assert ti.append_to_text_index(dst, batch, txn_id="b7") is False
    got = sorted(
        tuple(r)
        for r in ti.bm25_topk_index(
            ti.load_text_index(spark, dst), queries_df, k=5, tie_rounding=6
        ).collect()
    )
    assert got == want

    # malformed txn ids refuse loudly (they become directory names)
    with pytest.raises(ValueError, match="txn_id"):
        ti.append_to_text_index(path, batch, txn_id="../escape")


def test_sink_replay_is_exactly_once(spark, tmp_path, docs_df, queries_df):
    """Calling the sink body twice with the SAME batch_id (the foreachBatch
    replay shape) applies the batch once — including across a mid-stream
    compaction between original and replay."""
    from dqx_spark.streaming import text_index_sink

    root = str(tmp_path / "store")
    ti.init_text_store(docs_df.limit(0), root, "doc_id", "text", partitions=4)
    sink = text_index_sink(root, compact_every=2)
    b0 = docs_df.where(F.col("doc_id") % 3 == 0)
    b1 = docs_df.where(F.col("doc_id") % 3 == 1)
    b2 = docs_df.where(F.col("doc_id") % 3 == 2)
    sink(b0, 0)
    sink(b1, 1)  # compact_every=2 -> pointer flips to v1 here
    assert ti.current_text_store_version(spark, root) == root + "/v1"
    sink(b0, 0)  # replay AFTER the compaction: marker carried into v1
    sink(b2, 2)
    sink(b2, 2)  # immediate replay
    idx = ti.load_text_index(spark, ti.current_text_store_version(spark, root))
    got = sorted(
        tuple(r) for r in ti.bm25_topk_index(idx, queries_df, k=5, tie_rounding=6).collect()
    )
    want = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(
            docs_df, queries_df, "doc_id", "text", k=5, tie_rounding=6
        ).collect()
    )
    assert got == want
    assert ti.text_index_stats(idx)["n_docs"] == len(DOCS)


PHRASE_DOCS = [
    (0, "the quick brown fox jumps"),
    (1, "quick brown"),  # phrase == whole doc
    (2, "a quick brown brown fox"),  # repeated token inside
    (3, "brown quick"),  # reversed: must NOT match "quick brown"
    (4, "table table table"),  # overlapping repeated-term matches
    (5, "table x table"),  # has both tokens but NOT adjacent
    (6, "Quick BROWN"),  # case folding
    (7, ""),
    (8, None),
]
PHRASES = [
    (1, "quick brown"),
    (2, "table table"),
    (3, "brown fox jumps"),
    (4, ""),  # empty phrase matches NOTHING
    (5, "quick brown fox jumps extra"),  # longer than any match
]
PHRASE_WANT = sorted(
    [(1, 0), (1, 1), (1, 2), (1, 6), (2, 4), (3, 0)]
)


def test_phrase_match_scan_semantics(spark):
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    ph = spark.createDataFrame(PHRASES, "pid int, phrase string")
    got = sorted((r["pid"], r["id"]) for r in retrieval.phrase_match(docs, ph, "doc_id", "text").collect())
    assert got == PHRASE_WANT


def test_phrase_match_index_equals_scan(spark, tmp_path):
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    ph = spark.createDataFrame(PHRASES, "pid int, phrase string")
    path = str(tmp_path / "pidx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=4, positions=True)
    idx = ti.load_text_index(spark, path)
    got = sorted((r["pid"], r["id"]) for r in ti.phrase_match_index(idx, ph).collect())
    assert got == PHRASE_WANT
    # prune='none' answers identically
    got2 = sorted(
        (r["pid"], r["id"]) for r in ti.phrase_match_index(idx, ph, prune="none").collect()
    )
    assert got2 == PHRASE_WANT
    # positional postings don't perturb BM25 through the same index
    q = spark.createDataFrame([(1, "quick brown"), (2, "table")], "qid int, qtext string")
    a = sorted(tuple(r) for r in ti.bm25_topk_index(idx, q, k=5, tie_rounding=6).collect())
    b = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(docs, q, "doc_id", "text", k=5, tie_rounding=6).collect()
    )
    assert a == b
    # non-positional index refuses the phrase probe loudly
    np = str(tmp_path / "np")
    ti.save_text_index(docs, np, "doc_id", "text", partitions=4)
    with pytest.raises(ValueError, match="positions=True"):
        ti.phrase_match_index(ti.load_text_index(spark, np), ph)


def test_bm25_require_all_terms(spark, docs_df, queries_df):
    """Conjunctive mode keeps exactly the docs whose n_matched equals the
    query's distinct term count, across scan and index paths."""
    scored = retrieval.bm25_scores(docs_df, queries_df, "doc_id", "text").collect()
    want = sorted(
        (r["qid"], r["id"])
        for r in scored
        if r["n_matched"] == {1: 2, 2: 3, 3: 1}[r["qid"]]
    )
    got = sorted(
        (r["qid"], r["id"])
        for r in retrieval.bm25_scores(
            docs_df, queries_df, "doc_id", "text", require_all_terms=True
        ).collect()
    )
    assert got == want and len(got) > 0
    topk = retrieval.bm25_topk(
        docs_df, queries_df, "doc_id", "text", k=5, require_all_terms=True
    ).collect()
    assert sorted((r["qid"], r["id"]) for r in topk) == want


def test_store_gc_retention_policy(spark, tmp_path, docs_df):
    """gc keeps current + keep-1 rollback targets, deletes older versions
    AND crashed partials below current, never touches anything above."""
    import os

    from dqx_spark.pipeline import _store

    root = str(tmp_path / "store")
    ti.init_text_store(docs_df, root, "doc_id", "text", partitions=4)
    for _ in range(3):  # v1, v2, v3
        ti.compact_text_store(spark, root)
    # crashed partial BELOW current (skipped number lands between versions)
    os.makedirs(root + "/v2_junk", exist_ok=True)  # not vN-shaped: ignored
    cur = ti.current_text_store_version(spark, root)
    assert cur == root + "/v3"
    # a partial ABOVE current (in-flight compaction): must survive
    os.makedirs(root + "/v9/postings", exist_ok=True)

    deleted = ti.gc_text_store(spark, root, keep=2)
    assert sorted(deleted) == [root + "/v0", root + "/v1"]
    assert os.path.isdir(root + "/v2") and os.path.isdir(root + "/v3")
    assert os.path.isdir(root + "/v9"), "in-flight partial above current survives"
    # store still answers after gc
    idx = ti.load_text_index(spark, ti.current_text_store_version(spark, root))
    assert ti.text_index_stats(idx)["n_docs"] == len(DOCS)
    # keep=1 leaves only current
    deleted2 = ti.gc_text_store(spark, root, keep=1)
    assert deleted2 == [root + "/v2"]
    with pytest.raises(ValueError, match="keep"):
        _store.gc_versions(spark, root, "_text_meta", keep=0)


def test_phrase_decontaminate_scan_and_index_paths(spark, tmp_path):
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    ph = spark.createDataFrame(PHRASES, "pid int, phrase string")
    matched_ids = {i for _, i in PHRASE_WANT}
    want = sorted(i for i, _ in PHRASE_DOCS if i not in matched_ids)
    got = sorted(
        r["doc_id"]
        for r in retrieval.phrase_decontaminate(docs, ph, "doc_id", "text").collect()
    )
    assert got == want
    path = str(tmp_path / "pidx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=4, positions=True)
    idx = ti.load_text_index(spark, path)
    got2 = sorted(
        r["doc_id"]
        for r in retrieval.phrase_decontaminate(
            docs, ph, "doc_id", "text", index=idx
        ).collect()
    )
    assert got2 == want


def test_review_fixes_guards_and_single_tokenization(spark, tmp_path):
    """r12 self-review regressions: reserved txn ids refuse; compaction
    onto a non-empty destination refuses (appends would double counts)
    unless mode='overwrite'; non-long doc ids are normalized before the
    write (the read schema hardcodes id long); the per-transaction
    tokenize+groupBy subplan executes ONCE for its two consumers
    (postings write + terms aggregation), counted via an accumulator."""
    from pyspark.sql.types import StringType

    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    path = str(tmp_path / "idx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=4)

    for bad in ("init", "compacted"):
        with pytest.raises(ValueError, match="reserved"):
            ti.append_to_text_index(path, docs, txn_id=bad)

    dst = str(tmp_path / "dst")
    ti.compact_text_index(spark, path, dst)
    with pytest.raises(ValueError, match="already exists"):
        ti.compact_text_index(spark, path, dst)
    ti.compact_text_index(spark, path, dst, mode="overwrite")  # retry path
    assert ti.text_index_stats(ti.load_text_index(spark, dst))["n_docs"] == len(PHRASE_DOCS)

    # int32 ids: readable after the long normalization
    docs32 = spark.createDataFrame([(i, t) for i, t in PHRASE_DOCS], "doc_id int, text string")
    p32 = str(tmp_path / "i32")
    ti.save_text_index(docs32, p32, "doc_id", "text", partitions=4)
    q = spark.createDataFrame([(1, "quick brown")], "qid int, qtext string")
    out = ti.bm25_topk_index(ti.load_text_index(spark, p32), q, k=3).collect()
    assert len(out) > 0 and all(isinstance(r["id"], int) for r in out)

    # one tokenization per transaction: accumulator on the upstream text
    acc = spark.sparkContext.accumulator(0)

    def bump(t):
        acc.add(1)
        return t

    bump_udf = F.udf(bump, StringType())
    upstream = docs.select("doc_id", bump_udf("text").alias("text"))
    ponce = str(tmp_path / "once")
    ti.save_text_index(upstream, ponce, "doc_id", "text", partitions=4)
    n = docs.count()
    # budget 3n: the cache-filling postings pass evaluates the tokenize
    # expression TWICE per row (size(toks) in the Project + explode input
    # in the Generate — documented in doc_term_frequencies), plus the
    # stats agg over the SOURCE (zero-token docs have no postings rows).
    # WITHOUT the shared persisted tf the terms agg re-runs the double
    # tokenization too (measured 5n) — that is the regression this pins.
    assert acc.value <= 3 * n, (
        f"upstream executed {acc.value / n:.1f}x per save - the tf subplan "
        "must be shared by the postings write and the terms aggregation"
    )


def test_phrase_decontaminate_lowercase_mismatch_refuses(spark, tmp_path):
    docs = spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")
    ph = spark.createDataFrame(PHRASES, "pid int, phrase string")
    path = str(tmp_path / "pidx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=4, positions=True)
    idx = ti.load_text_index(spark, path)
    with pytest.raises(ValueError, match="lowercase mismatch"):
        retrieval.phrase_decontaminate(docs, ph, "doc_id", "text", lowercase=False, index=idx)


def test_phrase_duplicate_pid_rows_match_scan_semantics(spark, tmp_path):
    """A pid carrying SEVERAL phrases matches each phrase independently
    (no cross-phrase term conflation), duplicated rows collapse, and both
    paths return one row per (pid, id) — r12 second-review regression."""
    docs = spark.createDataFrame(
        [(0, "quick fox"), (1, "brown dog"), (2, "quick dog"), (3, "quick fox and brown dog")],
        "doc_id long, text string",
    )
    ph = spark.createDataFrame(
        [(1, "quick fox"), (1, "brown dog"), (1, "brown dog"), (2, "quick dog")],
        "pid int, phrase string",
    )
    # doc 2 'quick dog' holds quick (i=0 of phrase A) and dog (i=1 of
    # phrase B): conflated term sets would emit a bogus (1, 2)
    want = sorted([(1, 0), (1, 1), (1, 3), (2, 2)])
    got_scan = sorted(
        (r["pid"], r["id"]) for r in retrieval.phrase_match(docs, ph, "doc_id", "text").collect()
    )
    assert got_scan == want
    path = str(tmp_path / "idx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=4, positions=True)
    got_idx = sorted(
        (r["pid"], r["id"])
        for r in ti.phrase_match_index(ti.load_text_index(spark, path), ph).collect()
    )
    assert got_idx == want


def test_compact_src_eq_dst_refuses(spark, tmp_path, docs_df):
    path = str(tmp_path / "idx")
    ti.save_text_index(docs_df, path, "doc_id", "text", partitions=4)
    with pytest.raises(ValueError, match="must differ"):
        ti.compact_text_index(spark, path, path, mode="overwrite")
    assert ti.load_text_index(spark, path).commits, "the guard must fire BEFORE any delete"
