"""Tests for deterministic splitting, mixture sampling, and benchmark
decontamination (pipeline/mixing.py)."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import mixing


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"document number {i} with some distinctive words token{i} alpha beta gamma delta epsilon")
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_hash_split_is_deterministic_and_partitioning_invariant(docs):
    a = mixing.hash_split(docs, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    b = mixing.hash_split(docs.repartition(7), "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    ma = {r["id"]: r["split"] for r in a.select("id", "split").collect()}
    mb = {r["id"]: r["split"] for r in b.select("id", "split").collect()}
    assert ma == mb
    counts = a.groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in counts}
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > 100  # roughly 80% of 200


def test_hash_split_appends_stable(docs):
    """New rows must not move existing rows between splits."""
    first = mixing.hash_split(docs.where(F.col("id") < 100), "id")
    full = mixing.hash_split(docs, "id")
    m_first = {r["id"]: r["split"] for r in first.collect()}
    m_full = {r["id"]: r["split"] for r in full.where(F.col("id") < 100).collect()}
    assert m_first == m_full


def test_hash_split_validates_fractions(docs):
    with pytest.raises(ValueError, match="sum to 1.0"):
        mixing.hash_split(docs, "id", {"a": 0.5, "b": 0.1})


def test_deterministic_sample_subset_monotone(docs):
    """A smaller fraction's sample is a subset of a larger fraction's."""
    small = {r["id"] for r in mixing.deterministic_sample(docs, "id", 0.2).select("id").collect()}
    big = {r["id"] for r in mixing.deterministic_sample(docs, "id", 0.6).select("id").collect()}
    assert small <= big
    assert 0 < len(small) < len(big) < 200
    with pytest.raises(ValueError, match="fraction"):
        mixing.deterministic_sample(docs, "id", 1.5)


def test_source_mix_rates_and_isolation(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, src string")
    mixed = mixing.source_mix(df, "id", "src", {"a": 0.25})
    out = mixed.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in out}
    assert by["b"] == 200  # default rate 1.0 keeps everything
    assert 20 < by["a"] < 80  # ~25% of 200
    # retuning source a must not change which b-rows are kept
    mixed2 = mixing.source_mix(df, "id", "src", {"a": 0.9})
    b1 = {r["id"] for r in mixed.where(F.col("src") == "b").select("id").collect()}
    b2 = {r["id"] for r in mixed2.where(F.col("src") == "b").select("id").collect()}
    assert b1 == b2


def test_ngram_contamination_flags_eval_overlap(spark):
    eval_rows = [(100, "the secret benchmark question about quantum gravity and turtles all the way down")]
    corpus_rows = [
        (0, "the secret benchmark question about quantum gravity and turtles all the way down"),  # full copy
        (1, "completely unrelated text about spark shuffle partitions and broadcast joins here today"),
        (2, "short text"),  # < n tokens -> zero n-grams
    ]
    docs = spark.createDataFrame(corpus_rows, "id long, text string")
    ev = spark.createDataFrame(eval_rows, "id long, text string")
    out = {r["id"]: r for r in mixing.ngram_contamination(docs, ev, "id", "text", n=8).collect()}
    assert out[0]["contamination"] == 1.0
    assert out[1]["contamination"] == 0.0 and out[1]["total_ngrams"] > 0
    assert out[2]["total_ngrams"] == 0 and out[2]["contamination"] == 0.0

    kept = mixing.decontaminate(docs, ev, "id", "text", threshold=0.5, n=8)
    assert {r["id"] for r in kept.select("id").collect()} == {1, 2}
    assert kept.columns == docs.columns


def test_bucket_matches_duckdb():
    """The Spark bucket expression must agree with the documented DuckDB
    twin — that is the whole point of using md5."""
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    ids = ["0", "1", "42", "99999", "hello"]
    sdf = spark.createDataFrame([(i,) for i in ids], "id string")
    got = {
        r["id"]: r["b"]
        for r in sdf.select("id", mixing.hash_bucket("id", 1_000_000).alias("b")).collect()
    }
    for i in ids:
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{i}'), 1, 15))::UBIGINT % 1000000"
        ).fetchone()[0]
        assert got[i] == want, i


def test_top_k_per_group(spark):
    rows = [
        ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 30.0),
        ("b", 5, 5.0),
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    out = mixing.top_k_per_group(df, ["src"], "score", k=2, tiebreak_cols=["id"], rank_col="rank")
    got = {(r["src"], r["id"]): r["rank"] for r in out.collect()}
    # ties on score=30 break by id asc: id=2 wins rank 1, id=4 rank 2
    assert got == {("a", 2): 1, ("a", 4): 2, ("b", 5): 1}
    no_rank = mixing.top_k_per_group(df, ["src"], "score", k=1, tiebreak_cols=["id"])
    assert no_rank.columns == df.columns
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        mixing.top_k_per_group(df, ["src"], "score", k=0)


def test_sample_n_per_group(spark):
    from dqx_spark.pipeline import mixing

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)], "doc_id long, source string"
    )
    out = mixing.sample_n_per_group(df, ["source"], "doc_id", n=5)
    counts = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {"a": 5, "b": 5}
    # deterministic across invocations
    first = sorted(r.doc_id for r in out.collect())
    again = sorted(r.doc_id for r in mixing.sample_n_per_group(df, ["source"], "doc_id", n=5).collect())
    assert first == again
    # different salt -> (almost surely) different draw; n > group size -> whole group
    salted = sorted(r.doc_id for r in mixing.sample_n_per_group(df, ["source"], "doc_id", n=5, salt="x").collect())
    assert salted != first
    full = mixing.sample_n_per_group(df.where("source = 'b'"), ["source"], "doc_id", n=100)
    assert full.count() == 20


def test_quantile_bins(spark):
    from dqx_spark.pipeline import mixing

    df = spark.createDataFrame([(i, float(i)) for i in range(100)] + [(100, None)], "id long, v double")
    out = {r.id: r.bin for r in mixing.quantile_bins(df, "v", num_bins=4).collect()}
    assert out[0] == 0 and out[99] == 3 and out[100] is None
    counts = [sum(1 for b in out.values() if b == k) for k in range(4)]
    assert all(20 <= c <= 30 for c in counts)  # roughly balanced quartiles
    # approx mode still bins everything into range
    approx = {r.id: r.bin for r in mixing.quantile_bins(df, "v", num_bins=4, approx=True).collect()}
    assert all(b is None or 0 <= b <= 3 for b in approx.values())


@pytest.fixture(scope="module")
def sourced(spark):
    rows = [(i, "src_a" if i < 60 else "src_b", 100) for i in range(100)]
    rows.append((100, "src_c", None))  # null tokens count as 0
    return spark.createDataFrame(rows, "id long, source string, n_tok int")


def test_source_token_stats(sourced):
    stats = {r["source"]: r for r in mixing.source_token_stats(sourced, "source", "n_tok").collect()}
    assert stats["src_a"]["n_docs"] == 60 and stats["src_a"]["total_tokens"] == 6000
    assert stats["src_b"]["total_tokens"] == 4000
    assert stats["src_c"]["total_tokens"] == 0 and stats["src_c"]["token_share"] == 0.0
    assert abs(stats["src_a"]["token_share"] - 0.6) < 1e-12
    assert abs(sum(s["token_share"] for s in stats.values()) - 1.0) < 1e-12


def test_sample_to_token_budget_exact(sourced):
    out = mixing.sample_to_token_budget(
        sourced, "id", "source", "n_tok", {"src_a": 1000}, default_budget=None
    )
    rows = {r["id"]: r["in_budget"] for r in out.collect()}
    kept_a = [i for i in range(60) if rows[i]]
    # 100 tokens per doc, 1000 budget: exactly 10 docs make the cut
    assert len(kept_a) == 10
    # unlimited default: every src_b/src_c row kept
    assert all(rows[i] for i in range(60, 101))
    # deterministic + partitioning-invariant + overshoot-by-at-most-one-doc
    again = {
        r["id"]: r["in_budget"]
        for r in mixing.sample_to_token_budget(
            sourced.repartition(7), "id", "source", "n_tok", {"src_a": 1000}, default_budget=None
        ).collect()
    }
    assert rows == again
    # budget that lands mid-document: prefix < budget keeps the crossing doc
    mid = mixing.sample_to_token_budget(sourced, "id", "source", "n_tok", {"src_a": 950}, default_budget=0)
    kept_mid = [r["id"] for r in mid.collect() if r["in_budget"]]
    assert len(kept_mid) == 10 and set(kept_mid) <= set(range(60))


def test_sample_to_token_budget_approx(sourced):
    out = mixing.sample_to_token_budget(
        sourced, "id", "source", "n_tok", {"src_a": 3000}, default_budget=None, approx=True
    )
    rows = out.collect()
    kept_a = [r for r in rows if r["source"] == "src_a" and r["in_budget"]]
    # rate = 3000/6000 = 0.5 -> hash keeps ~half (md5-uniform; wide tolerance)
    assert 15 <= len(kept_a) <= 45
    assert all(r["in_budget"] for r in rows if r["source"] != "src_a")
    # approx keep-set is a hash threshold: monotone in the budget
    smaller = {
        r["id"]
        for r in mixing.sample_to_token_budget(
            sourced, "id", "source", "n_tok", {"src_a": 1500}, default_budget=None, approx=True
        ).collect()
        if r["in_budget"] and r["source"] == "src_a"
    }
    assert smaller <= {r["id"] for r in kept_a}
    # zero budget keeps nothing; validation rejects negatives
    zero = mixing.sample_to_token_budget(sourced, "id", "source", "n_tok", {"src_a": 0}, default_budget=0, approx=True)
    assert not [r for r in zero.collect() if r["in_budget"]]
    with pytest.raises(ValueError):
        mixing.sample_to_token_budget(sourced, "id", "source", "n_tok", {"src_a": -1})


def test_temperature_mix(spark):
    """r7: temperature sampling — τ=1 keeps all; τ<1 flattens toward
    small sources (big sources downsample hardest); rates from the shared
    pure-python derivation; null sources always kept."""
    import pytest

    from dqx_spark.pipeline import mixing

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    rows.append((2000, None))
    df = spark.createDataFrame(rows, "doc_id long, source string")

    rates = mixing.temperature_rates({"big": 900, "small": 100}, 0.5)
    assert rates["small"] == 1.0  # smallest source keeps everything
    assert 0 < rates["big"] < 1.0
    # after sampling, expected proportions ∝ p^τ: big/small = (0.9/0.1)^0.5 = 3
    assert abs(rates["big"] * 900 / (rates["small"] * 100) - 3.0) < 1e-9

    kept = mixing.temperature_mix(df, "doc_id", "source", temperature=0.5)
    by_src = {r["source"]: r["count"] for r in kept.groupBy("source").count().collect()}
    assert by_src["small"] == 100  # rate 1.0: deterministic, all kept
    assert by_src[None] == 1  # null source never dropped
    assert 0 < by_src["big"] < 900  # downsampled
    # τ=1 is the identity
    assert mixing.temperature_mix(df, "doc_id", "source", temperature=1.0).count() == 1001
    with pytest.raises(ValueError, match="temperature"):
        mixing.temperature_mix(df, "doc_id", "source", temperature=1.5)


def test_unimax_budgets():
    """r8: UniMax waterfilling — capped sources keep full capacity,
    surplus spreads uniformly over the rest, sum never exceeds budget."""
    # capacities 100 / 500 / 1000; budget 900 -> fair 300: tiny capped at
    # 100, its unused 200 splits between the other two (400 each)
    b = mixing.unimax_budgets({"tiny": 100, "mid": 500, "big": 1000}, 900)
    assert b["tiny"] == 100
    assert b["mid"] == 400 and b["big"] == 400
    assert sum(b.values()) <= 900
    # budget above total capacity: everyone capped
    b2 = mixing.unimax_budgets({"a": 10, "b": 20}, 1000)
    assert b2 == {"a": 10, "b": 20}
    # max_epochs scales capacity; epochs<1 tightens the cap
    b3 = mixing.unimax_budgets({"a": 100, "b": 1000}, 600, max_epochs=0.5)
    assert b3["a"] == 50 and b3["b"] == 500
    # uniform split when nothing caps
    b4 = mixing.unimax_budgets({"a": 1000, "b": 1000, "c": 1000}, 900)
    assert sorted(b4.values()) == [300, 300, 300]
    # integer flooring: remainder rolls forward, undershoot < n sources
    b5 = mixing.unimax_budgets({"a": 1000, "b": 1000, "c": 1000}, 1000)
    assert sum(b5.values()) in (999, 1000) and max(b5.values()) - min(b5.values()) <= 1
    with pytest.raises(ValueError, match="total_budget"):
        mixing.unimax_budgets({"a": 1}, -1)
    with pytest.raises(ValueError, match="max_epochs"):
        mixing.unimax_budgets({"a": 1}, 10, max_epochs=0)


def test_unimax_mix(spark):
    """r8: end-to-end UniMax selection — per-source kept token mass lands
    on the waterfilled budget (±1 doc, exact mode), nulls kept,
    deterministic under repartition."""
    rows = (
        [(i, "big", 10) for i in range(300)]          # 3000 tokens
        + [(1000 + i, "small", 10) for i in range(50)]  # 500 tokens
    )
    rows.append((2000, None, 10))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")

    budgets = mixing.unimax_budgets({"big": 3000, "small": 500}, 2000)
    assert budgets == {"small": 500, "big": 1500}

    out = mixing.unimax_mix(df, "doc_id", "source", "n_tok", total_budget=2000)
    kept = {(r["doc_id"], r["source"]) for r in out.collect() if r["in_umax"]}
    kept_small = [d for d, s in kept if s == "small"]
    kept_big = [d for d, s in kept if s == "big"]
    assert len(kept_small) == 50            # capped source keeps everything
    assert len(kept_big) == 150             # 1500 budget / 10 tokens per doc
    assert (2000, None) in kept             # null source never dropped
    again = {
        (r["doc_id"], r["source"])
        for r in mixing.unimax_mix(
            df.repartition(7), "doc_id", "source", "n_tok", total_budget=2000
        ).collect()
        if r["in_umax"]
    }
    assert again == kept
    # approx path: same budgets realized as scan-local rate thresholds
    ap = mixing.unimax_mix(df, "doc_id", "source", "n_tok", total_budget=2000, approx=True)
    ap_rows = ap.collect()
    assert all(r["in_umax"] for r in ap_rows if r["source"] == "small")  # rate 1.0
    n_big = sum(1 for r in ap_rows if r["source"] == "big" and r["in_umax"])
    assert 75 <= n_big <= 225  # rate 0.5, md5-uniform with wide tolerance


def test_deterministic_shuffle(spark):
    """r8: reproducible global training order — stable across reruns and
    partitionings, permuted by salt, append-stable (old rows keep their
    relative order when new rows arrive)."""
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    order1 = [r["id"] for r in mixing.deterministic_shuffle(df, "id").collect()]
    order2 = [r["id"] for r in mixing.deterministic_shuffle(df.repartition(7), "id").collect()]
    assert order1 == order2
    assert sorted(order1) == list(range(200))
    assert order1 != list(range(200))  # actually shuffled
    salted = [r["id"] for r in mixing.deterministic_shuffle(df, "id", salt="ep2").collect()]
    assert salted != order1 and sorted(salted) == list(range(200))
    # append stability: the original rows keep their relative order
    bigger = spark.createDataFrame([(i,) for i in range(300)], "id long")
    order3 = [r["id"] for r in mixing.deterministic_shuffle(bigger, "id").collect()]
    assert [i for i in order3 if i < 200] == order1


def test_shuffle_positions_match_brute_force(spark):
    """r9: the two-level (prefix-bucket + per-bucket rank + offsets)
    assignment reproduces the exact global (md5(salt||id), id) order —
    and matches deterministic_shuffle's row order."""
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    got = {
        r["id"]: r["shuffle_pos"]
        for r in mixing.shuffle_positions(df, "id", salt="s", prefix_chars=2).collect()
    }
    exp_order = sorted(range(500), key=lambda i: (hashlib.md5(f"s{i}".encode()).hexdigest(), i))
    assert got == {doc: p for p, doc in enumerate(exp_order)}
    assert sorted(got.values()) == list(range(500))  # a permutation
    # agrees with deterministic_shuffle's row order under the same salt
    order = [r["id"] for r in mixing.deterministic_shuffle(df, "id", salt="s").collect()]
    assert order == exp_order
    # partitioning-invariant
    again = {
        r["id"]: r["shuffle_pos"]
        for r in mixing.shuffle_positions(df.repartition(7), "id", salt="s").collect()
    }
    assert again == got


def test_shuffle_positions_validates_prefix(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        mixing.shuffle_positions(df, "id", prefix_chars=0)
    with pytest.raises(ValueError):
        mixing.shuffle_positions(df, "id", prefix_chars=9)


def test_shuffle_positions_null_ids_survive(spark):
    """r9 review: NULL ids coalesce into the key instead of silently
    vanishing in the offsets equi-join — output is always row-complete
    and a 0-based permutation."""
    df = spark.createDataFrame([(None,), (1,), (2,), (3,)], "id string")
    got = mixing.shuffle_positions(df, "id")
    rows = [(r["id"], r["shuffle_pos"]) for r in got.collect()]
    assert len(rows) == 4
    assert sorted(p for _, p in rows) == [0, 1, 2, 3]
    assert any(i is None for i, _ in rows)  # the NULL row is still here
    # deterministic_shuffle keeps the same count too
    assert mixing.deterministic_shuffle(df, "id").count() == 4


# ---------------------------------------------------------------------------
# DSIR (r11)
# ---------------------------------------------------------------------------
def _dsir_replay(text, ratios, buckets, bigrams=True):
    """Pure-python replay of dsir_feature_hashes + the sorted-fold weight —
    must match Spark's doubles BIT-FOR-BIT (md5 mode, same fold order)."""
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = text.lower().split()
    feats = [h60(t) % buckets for t in toks]
    if bigrams and len(toks) >= 2:
        feats += [h60(a + "\x1f" + b) % buckets for a, b in zip(toks, toks[1:])]
    acc = 0.0
    for v in sorted(ratios[b] for b in feats):
        acc += v
    return len(feats), acc


def test_dsir_weights_match_pure_python_replay(spark):
    from dqx_spark.pipeline import mixing as mx

    B = 64
    target = spark.createDataFrame(
        [(i, "science papers discuss experiments and results today") for i in range(5)],
        "doc_id long, text string",
    )
    raw_rows = [
        (0, "science papers discuss experiments carefully"),
        (1, "cats chase mice around the old barn"),
        (2, "experiments and results matter in science"),
        (3, ""),  # featureless -> logw 0, n 0
        (4, "mice avoid cats near the barn door"),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(target, "text", B, hash_name="md5").collect()}
    rc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(raw, "text", B, hash_name="md5").collect()}
    ratios = mx.dsir_log_ratios(tc, rc, B)
    got = {
        r["doc_id"]: (r["dsir_n_features"], r["dsir_logw"])
        for r in mx.dsir_weights(raw, "doc_id", "text", ratios, B, hash_name="md5").collect()
    }
    for i, text in raw_rows:
        n, lw = _dsir_replay(text, ratios, B)
        assert got[i][0] == n
        assert got[i][1] == lw, (i, got[i][1], lw)  # EXACT double equality
    # target-like docs outscore off-target docs
    assert min(got[0][1], got[2][1]) > max(got[1][1], got[4][1])


def test_dsir_resample_deterministic_and_target_biased(spark):
    from dqx_spark.pipeline import mixing as mx

    B = 128
    target = spark.createDataFrame(
        [(i, "neural networks learn representations from large data") for i in range(4)],
        "doc_id long, text string",
    )
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"neural networks learn data representations case {i}"))
        else:
            rows.append((i, f"gardening tips for tomatoes and roses plot {i}"))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(target, "text", B, hash_name="md5").collect()}
    rc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(raw, "text", B, hash_name="md5").collect()}
    ratios = mx.dsir_log_ratios(tc, rc, B)
    pick = lambda salt: sorted(  # noqa: E731
        r["doc_id"] for r in mx.dsir_resample(
            raw, "doc_id", "text", ratios, k=10, buckets=B, salt=salt, hash_name="md5"
        ).collect()
    )
    a, b_ = pick("e0"), pick("e0")
    assert a == b_ and len(a) == 10  # deterministic in (corpus, salt)
    assert pick("e1") != a  # the salt is the draw selector
    # importance resampling biases hard toward target-like (even ids)
    assert sum(1 for i in a if i % 2 == 0) >= 8
    # unigram-only path + xxhash64 hot path smoke
    uni = mx.dsir_weights(
        raw, "doc_id", "text",
        mx.dsir_log_ratios(
            {r["b"]: r["c"] for r in mx.dsir_bucket_counts(target, "text", B, bigrams=False).collect()},
            {r["b"]: r["c"] for r in mx.dsir_bucket_counts(raw, "text", B, bigrams=False).collect()},
            B,
        ),
        B, bigrams=False,
    )
    assert uni.where(F.col("dsir_logw").isNull()).count() == 0
