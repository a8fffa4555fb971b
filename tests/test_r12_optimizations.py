"""r12 optimization-round regression pins (non-engine ones).

1. text_index write layout: one data file per (c, pb) subdir — the save
   repartitions on the bucket key before the partitioned write, so probes
   never pay tasks×buckets tiny-file opens (measured at sf0.1: ~700
   sub-30KB postings files -> 45; bm25_index_probe 3.60 s -> 1.21 s,
   phrase_index_probe 3.25 s -> 0.94 s, outputs identical).
2. bm25_topk single-window top-k: the rank filter must plan a
   WindowGroupLimit (map-side partial top-k) and only ONE exchange-backed
   window pass — the pre-r12 salted pre-stage's extra Exchange + Sorts are
   gone while results stay identical (pinned by comparing against an
   explicitly salted replica of the old body).
"""

from __future__ import annotations

import glob
import os
import re

import pyspark.sql.functions as F
from pyspark.sql import Window

from dqx_spark.pipeline import retrieval
from dqx_spark.pipeline import text_index as ti


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_text_index_one_file_per_bucket(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha{i % 5} beta{i % 11} gamma common word{i % 3}") for i in range(500)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=8, positions=True)
    for sub in ("postings", "terms"):
        dirs = glob.glob(os.path.join(path, sub, "c=*", "pb=*"))
        assert dirs, f"no bucket dirs under {sub}"
        for d in dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, f"{d} holds {len(files)} files; want exactly 1"


def test_append_keeps_one_file_per_bucket(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha{i % 5} beta{i % 11}") for i in range(200)], "doc_id long, text string"
    )
    more = spark.createDataFrame(
        [(i, f"alpha{i % 5} delta{i % 7}") for i in range(1000, 1200)], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    ti.save_text_index(docs, path, "doc_id", "text", partitions=8)
    ti.append_to_text_index(path, more, txn_id="b1")
    for d in glob.glob(os.path.join(path, "postings", "c=*", "pb=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} holds {len(files)} files; want exactly 1 per txn"


def test_bm25_topk_single_window_with_group_limit(spark):
    docs = spark.createDataFrame(
        [(i, f"term{i % 7} filler{i} word{i % 3} common text") for i in range(300)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "term1 common"), (2, "word2")], "qid int, qtext string")
    out = retrieval.bm25_topk(docs, q, "doc_id", "text", k=5)
    p = _plan(out)
    assert "WindowGroupLimit" in p
    # exactly one logical window pass over qid: the salted pre-stage is gone
    assert len(re.findall(r"\bWindow\b(?!GroupLimit)", p)) == 1, p


def test_bigram_prefix_counts_derived_exactly(spark):
    """r12: c(w1·) is derived from the bigram TYPE table (Σ_w2 c(w1,w2))
    instead of re-aggregating the instance stream — exact integer equality
    pinned here; the per-doc float score may differ from the pre-r12 body
    only by summation-order ulps (measured max 1.2e-15 relative), which the
    gate's round(…, 6) absorbs (verified at all three SFs)."""
    from dqx_spark.pipeline.text import tokens
    from dqx_spark.pipeline import corpus

    docs = spark.createDataFrame(
        [(i, f"a{i % 3} b{i % 5} a{i % 3} c common") for i in range(200)],
        "doc_id long, text string",
    )
    toks = docs.select(F.col("doc_id").alias("id"), tokens(F.lower(F.col("text"))).alias("__t"))
    sz = F.size("__t")
    pairs = F.when(sz >= 2, F.transform(F.sequence(F.lit(1), sz - 1),
        lambda i: F.struct(F.element_at(F.col("__t"), i).alias("w1"),
                           F.element_at(F.col("__t"), i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = toks.select(F.explode(pairs).alias("p")).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    want = {r["w1"]: r["c"] for r in bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c")).collect()}
    got = {
        r["w1"]: r["c"]
        for r in bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
        .groupBy("w1").agg(F.sum("cb").alias("c")).collect()
    }
    assert got == want
    # integer outputs of the full operator are unchanged
    out = corpus.bigram_lm_scores(docs, "doc_id", "text")
    assert out.where(F.col("n_bigrams") <= 0).count() == 0


def test_nb_label_totals_and_vocab_derived_exactly(spark):
    """r12: per-label token totals and vocabulary size derive from the
    (label, w) type table — Σ_w c(w,label) equals the instance count and
    distinct w over cw equals distinct w over occurrences."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared", "en" if i % 2 else "de") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    from dqx_spark.pipeline.text import tokens

    occ = docs.select(F.col("lang").alias("label"), F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    cw = occ.groupBy("label", "w").agg(F.count(F.lit(1)).alias("cw"))
    want_ct = {r["label"]: r["c"] for r in occ.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()}
    got_ct = {r["label"]: r["c"] for r in cw.groupBy("label").agg(F.sum("cw").alias("c")).collect()}
    assert got_ct == want_ct
    assert cw.select(F.count_distinct("w")).first()[0] == occ.select(F.count_distinct("w")).first()[0]
    # the full operator still predicts both classes deterministically
    from dqx_spark.pipeline import corpus

    out = corpus.nb_classifier_scores(docs, "doc_id", "text", "lang")
    assert out.count() == 100 and out.where(F.col("predicted").isNull()).count() == 0


def test_bm25_topk_equals_old_salted_body(spark):
    """The removed salted two-stage pre-selection was a superset filter —
    replicate it here and pin output identity against the new body."""
    docs = spark.createDataFrame(
        [(i, f"term{i % 7} filler{i} word{i % 3} common text") for i in range(300)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "term1 common"), (2, "word2 common")], "qid int, qtext string")
    k = 5
    new = sorted(tuple(r) for r in retrieval.bm25_topk(docs, q, "doc_id", "text", k=k).collect())

    scored = retrieval.bm25_scores(docs, q, "doc_id", "text")
    order = [F.col("score").desc(), F.col("id").asc()]
    salted = Window.partitionBy("qid", F.pmod(F.xxhash64(F.col("id")), F.lit(32))).orderBy(*order)
    surv = scored.withColumn("__r", F.row_number().over(salted)).where(F.col("__r") <= k).drop("__r")
    w = Window.partitionBy("qid").orderBy(*order)
    old = sorted(
        tuple(r)
        for r in surv.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "id", "n_matched", "score")
        .collect()
    )
    assert new == old
