"""Mergeable sketches (r10): HLL registers / CMS counters re-derived by a
pure-Python md5 twin, merge == whole proven exactly, moments merge vs a
direct pass, and the knob-carrying persistence layout."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import sketches as SK

P = 8  # 256 registers — small enough to eyeball, error ~6.5%


def _md5h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _local_hll(values, p):
    regs = {}
    tail = 60 - p
    for v in values:
        h = _md5h60(v)
        reg = h >> tail
        w = h & ((1 << tail) - 1)
        rho = tail + 1 if w == 0 else tail - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_pure_python_twin(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    got = {r["reg"]: r["rho"] for r in SK.hll_sketch(df, "k", p=P, hash_name="md5").collect()}
    want = _local_hll([str(i) for i in range(1000)], P)
    assert got == want


def test_hll_estimate_accuracy_and_linear_counting(spark):
    for n, mode in ((5000, "md5"), (5000, "xxhash64")):
        df = spark.range(n).select(F.col("id").cast("string").alias("k"))
        est = SK.hll_estimate(SK.hll_sketch(df, "k", p=12, hash_name=mode), p=12)
        assert abs(est / n - 1.0) < 0.1, (mode, est)
    # tiny cardinality -> the linear-counting branch, near-exact
    small = spark.range(20).select(F.col("id").cast("string").alias("k"))
    est = SK.hll_estimate(SK.hll_sketch(small, "k", p=12), p=12)
    assert abs(est - 20) < 2


def test_hll_merge_equals_whole_and_is_idempotent(spark):
    df = spark.range(3000).select(F.col("id").cast("string").alias("k"))
    a = SK.hll_sketch(df.where(F.col("k").cast("long") % 2 == 0), "k", p=P, hash_name="md5")
    b = SK.hll_sketch(df.where(F.col("k").cast("long") % 2 == 1), "k", p=P, hash_name="md5")
    whole = {r["reg"]: r["rho"] for r in SK.hll_sketch(df, "k", p=P, hash_name="md5").collect()}
    merged = {r["reg"]: r["rho"] for r in SK.hll_merge(a, b).collect()}
    assert merged == whole
    twice = {r["reg"]: r["rho"] for r in SK.hll_merge(a, a, a).collect()}
    assert twice == {r["reg"]: r["rho"] for r in a.collect()}
    # duplicate values don't move registers: distinct-ness is the point
    dup = SK.hll_sketch(df.unionByName(df), "k", p=P, hash_name="md5")
    assert {r["reg"]: r["rho"] for r in dup.collect()} == whole


def test_hll_null_and_multicolumn_keys(spark):
    df = spark.createDataFrame(
        [(None, "x"), ("null", "x"), ("", "x"), ("a", None), ("a", "b")], "c1 string, c2 string"
    )
    est = SK.hll_estimate(SK.hll_sketch(df, ["c1", "c2"], p=12, hash_name="md5"), p=12)
    assert abs(est - 5) < 1  # NULL, 'null', and '' are three distinct keys


def _local_cms(values, depth, width):
    cnt = {}
    for v in values:
        h = _md5h60(v)
        h1, h2 = h % width, ((h >> 30) % width) | 1
        for d in range(depth):
            key = (d, (h1 + d * h2) % width)
            cnt[key] = cnt.get(key, 0) + 1
    return cnt


def test_cms_counters_exact_probe_and_merge(spark):
    vals = [str(i % 50) for i in range(2000)]  # value i appears 40x
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    sk = SK.cms_sketch(df, "k", depth=4, width=1024, hash_name="md5")
    got = {(r["d"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert got == _local_cms(vals, 4, 1024)

    items = spark.createDataFrame([(str(i),) for i in range(50)] + [("absent",)], "k string")
    probed = {r["k"]: r["est_count"] for r in
              SK.cms_probe(sk, items, "k", depth=4, width=1024, hash_name="md5").collect()}
    # 50 distinct into 1024 buckets: no full-row collision chain -> exact
    assert all(probed[str(i)] == 40 for i in range(50))
    assert probed["absent"] == 0

    halves = [df.where(F.col("k").cast("long") % 2 == i) for i in (0, 1)]
    merged = SK.cms_merge(*[SK.cms_sketch(h, "k", depth=4, width=1024, hash_name="md5") for h in halves])
    assert {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()} == got


def test_cms_overestimates_never_under(spark):
    # cram 500 distinct into width=16: collisions guaranteed, estimates
    # must still upper-bound the true counts
    vals = [str(i % 500) for i in range(1500)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    sk = SK.cms_sketch(df, "k", depth=3, width=16, hash_name="md5")
    items = spark.createDataFrame([(str(i),) for i in range(500)], "k string")
    probed = SK.cms_probe(sk, items, "k", depth=3, width=16, hash_name="md5")
    assert probed.where(F.col("est_count") < 3).count() == 0


def test_moments_merge_matches_direct_pass(spark):
    rng = random.Random(7)
    rows = [(i % 3, rng.gauss(100.0, 15.0)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, x double")
    states = [
        SK.moments_sketch(df.where(F.col("x") < 90), "x"),
        SK.moments_sketch(df.where((F.col("x") >= 90) & (F.col("x") < 110)), "x"),
        SK.moments_sketch(df.where(F.col("x") >= 110), "x"),
    ]
    m = SK.moments_merge(*states).collect()[0]
    d = df.agg(
        F.count("x").alias("n"), F.sum("x").alias("s"), F.min("x").alias("mn"),
        F.max("x").alias("mx"), F.var_pop("x").alias("v"), F.avg("x").alias("mean"),
    ).collect()[0]
    assert m["n"] == d["n"] and m["mn"] == d["mn"] and m["mx"] == d["mx"]
    assert abs(m["s"] / d["s"] - 1.0) < 1e-12
    assert abs(m["mean"] / d["mean"] - 1.0) < 1e-12
    assert abs(m["var_pop"] / d["v"] - 1.0) < 1e-9

    # grouped: per-g state merged across the same three splits
    gstates = [
        SK.moments_sketch(df.where(F.col("x") < 90), "x", by=["g"]),
        SK.moments_sketch(df.where((F.col("x") >= 90) & (F.col("x") < 110)), "x", by=["g"]),
        SK.moments_sketch(df.where(F.col("x") >= 110), "x", by=["g"]),
    ]
    gm = {r["g"]: r for r in SK.moments_merge(*gstates, by=["g"]).collect()}
    gd = {r["g"]: r for r in df.groupBy("g").agg(
        F.count("x").alias("n"), F.var_pop("x").alias("v")).collect()}
    for g in (0, 1, 2):
        assert gm[g]["n"] == gd[g]["n"]
        assert abs(gm[g]["var_pop"] / gd[g]["v"] - 1.0) < 1e-9


def test_save_load_sketch_knobs_and_guards(spark, tmp_path):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    sk = SK.hll_sketch(df, "k", p=12, hash_name="md5")
    path = str(tmp_path / "hll")
    SK.save_sketch(sk, path, "hll", {"cols": ["k"], "p": 12, "hash_name": "md5"})
    loaded, meta = SK.load_sketch(spark, path)
    assert meta == {"kind": "hll", "cols": ["k"], "hash_name": "md5", "p": 12}
    assert {r["reg"]: r["rho"] for r in loaded.collect()} == {
        r["reg"]: r["rho"] for r in sk.collect()
    }
    # per-batch append: the loaded union re-merges to the whole-corpus table
    df2 = spark.range(100, 200).select(F.col("id").cast("string").alias("k"))
    SK.save_sketch(SK.hll_sketch(df2, "k", p=12, hash_name="md5"), path, "hll",
                   {"cols": ["k"], "p": 12, "hash_name": "md5"}, mode="append")
    loaded2, _ = SK.load_sketch(spark, path)
    whole = SK.hll_sketch(df.unionByName(df2), "k", p=12, hash_name="md5")
    assert {r["reg"]: r["rho"] for r in SK.hll_merge(loaded2).collect()} == {
        r["reg"]: r["rho"] for r in whole.collect()
    }

    with pytest.raises(ValueError, match="needs knobs"):
        SK.save_sketch(sk, str(tmp_path / "x"), "hll", {"cols": ["k"], "p": 12})
    with pytest.raises(ValueError, match="kind must be"):
        SK.save_sketch(sk, str(tmp_path / "x"), "hyperloglog", {})
    mo = SK.moments_sketch(spark.range(10).select(F.col("id").cast("double").alias("x")), "x")
    with pytest.raises(ValueError, match="double-counts"):
        SK.save_sketch(mo, str(tmp_path / "m"), "moments", {"col": "x"}, mode="append")


def test_hll_param_and_hash_guards(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="p must be"):
        SK.hll_sketch(df, "k", p=3)
    with pytest.raises(ValueError, match="hash_name"):
        SK.hll_sketch(df, "k", hash_name="sha1")
    with pytest.raises(ValueError, match="depth"):
        SK.cms_sketch(df, "k", depth=0)


def test_probe_reserved_names_and_grouped_merge_guard(spark):
    """r10 review: probing with item columns that collide with the
    sketch-internal names is rejected, and moments_merge refuses to
    silently collapse grouped states whose group column isn't in by=."""
    df = spark.range(10).select(F.col("id").cast("string").alias("d"))
    sk = SK.cms_sketch(df, "d", depth=2, width=64, hash_name="md5")
    with pytest.raises(ValueError, match="collide"):
        SK.cms_probe(sk, df, "d", depth=2, width=64, hash_name="md5")

    g = spark.createDataFrame([(0, 1.0), (1, 2.0)], "g int, x double")
    st = SK.moments_sketch(g, "x", by=["g"])
    with pytest.raises(ValueError, match="group columns"):
        SK.moments_merge(st, st)
    assert SK.moments_merge(st, st, by=["g"]).count() == 2


def test_save_sketch_append_knob_mismatch_rejected(spark, tmp_path):
    """r10 review: appending rows hashed with different knobs under a
    rewritten sidecar is the silent-corruption case — rejected before the
    data write; the data already in the layout is untouched."""
    df = spark.range(50).select(F.col("id").cast("string").alias("k"))
    path = str(tmp_path / "hll")
    SK.save_sketch(SK.hll_sketch(df, "k", p=12, hash_name="md5"), path, "hll",
                   {"cols": ["k"], "p": 12, "hash_name": "md5"})
    before = SK.load_sketch(spark, path)[0].count()
    with pytest.raises(ValueError, match="disagree with the sidecar"):
        SK.save_sketch(SK.hll_sketch(df, "k", p=8, hash_name="md5"), path, "hll",
                       {"cols": ["k"], "p": 8, "hash_name": "md5"}, mode="append")
    loaded, meta = SK.load_sketch(spark, path)
    assert meta["p"] == 12 and loaded.count() == before


def test_save_sketch_append_refuses_orphan_data(spark, tmp_path):
    """r11 (r10 ADVICE): a crashed half-save leaves data without a sidecar
    (save_sketch writes data first, sidecar last).  An append onto that
    layout must RAISE — adopting orphan rows with unknown hashing knobs is
    the silent corruption the guard exists for — while an append onto a
    genuinely empty path is still accepted as the first batch."""
    df = spark.range(50).select(F.col("id").cast("string").alias("k"))
    sk = SK.hll_sketch(df, "k", p=12, hash_name="md5")
    knobs = {"cols": ["k"], "p": 12, "hash_name": "md5"}

    # first batch onto an empty path via append: accepted
    fresh = str(tmp_path / "fresh")
    SK.save_sketch(sk, fresh, "hll", knobs, mode="append")
    assert SK.load_sketch(spark, fresh)[1]["p"] == 12

    # simulate the crash: data present, sidecar gone
    half = str(tmp_path / "half")
    SK.save_sketch(sk, half, "hll", knobs)
    import shutil

    shutil.rmtree(half + "/_sketch_meta")
    with pytest.raises(ValueError, match="no readable _sketch_meta"):
        SK.save_sketch(sk, half, "hll", knobs, mode="append")
    # the orphan data was not touched by the refused append
    assert spark.read.parquet(half + "/data").count() > 0


def test_save_sketch_append_different_column_rejected(spark, tmp_path):
    """r11 (r10 ADVICE): hll/cms sidecars record the sketched column list,
    so appending a batch sketched over another column with the same
    hashing knobs is rejected instead of corrupting merged estimates."""
    df = spark.range(50).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 2).cast("string").alias("j")
    )
    path = str(tmp_path / "hll")
    SK.save_sketch(SK.hll_sketch(df, "k", p=12, hash_name="md5"), path, "hll",
                   {"cols": ["k"], "p": 12, "hash_name": "md5"})
    with pytest.raises(ValueError, match="disagree with the sidecar"):
        SK.save_sketch(SK.hll_sketch(df, "j", p=12, hash_name="md5"), path, "hll",
                       {"cols": ["j"], "p": 12, "hash_name": "md5"}, mode="append")


def test_histogram_sketch_counts_merge_and_quantiles(spark):
    """Binned counts match a pure-python replay (identical IEEE edge
    arithmetic), merge == whole, under/overflow clamp, and quantiles land
    within one bin width of exact."""
    import math

    vals = [(i * 0.17) % 100.0 for i in range(4000)] + [-5.0, 150.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, bins = 0.0, 100.0, 50
    sk = SK.histogram_sketch(df, "x", lo, hi, bins)
    got = {r["bin"]: r["cnt"] for r in sk.collect()}

    want = {}
    for v in vals:
        raw = math.floor((v - lo) / (hi - lo) * bins)
        b = -1 if raw < 0 else bins if raw >= bins else raw
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert got[-1] == 1 and got[bins] == 1  # clamped, not dropped

    halves = [df.where(F.col("x") < 50), df.where(F.col("x") >= 50)]
    merged = SK.histogram_merge(*[SK.histogram_sketch(h, "x", lo, hi, bins) for h in halves])
    assert {r["bin"]: r["cnt"] for r in merged.collect()} == got

    exact = sorted(vals)
    for q in (0.1, 0.5, 0.9):
        est = SK.histogram_quantile(sk, lo, hi, bins, q)
        true = exact[int(q * len(exact))]
        assert abs(est - true) <= (hi - lo) / bins + 1e-9, (q, est, true)
    assert SK.histogram_quantile(sk, lo, hi, bins, [0.0, 1.0]) == [lo, hi]

    with pytest.raises(ValueError, match="hi > lo"):
        SK.histogram_sketch(df, "x", 5.0, 5.0)
    with pytest.raises(ValueError, match="empty"):
        SK.histogram_quantile_local({}, 0, 1, 4, 0.5)
    with pytest.raises(ValueError, match="q must be"):
        SK.histogram_quantile_local({0: 1}, 0, 1, 4, 1.5)
    # persistence knobs
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        SK.save_sketch(sk, td + "/h", "hist", {"col": "x", "lo": lo, "hi": hi, "bins": bins})
        loaded, meta = SK.load_sketch(spark, td + "/h")
        assert meta["bins"] == bins and meta["lo"] == lo
        assert {r["bin"]: r["cnt"] for r in loaded.collect()} == got


# ---------------------------------------------------------------------------
# KMV bottom-k (r11)
# ---------------------------------------------------------------------------
def test_kmv_hashes_match_pure_python_twin(spark):
    """The sketch must hold EXACTLY the k smallest distinct md5-60 hashes —
    bit-for-bit re-derivable by sorting locally (the DuckDB-twin class)."""
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    # duplicate every value: distinct-ness must hold
    df = df.unionByName(df)
    got = sorted(r["h"] for r in SK.kmv_sketch(df, "k", k=64, hash_name="md5").collect())
    want = sorted({_md5h60(str(i)) for i in range(500)})[:64]
    assert got == want


def test_kmv_estimate_and_exact_small(spark):
    for mode in ("md5", "xxhash64"):
        df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
        est = SK.kmv_estimate(SK.kmv_sketch(df, "k", k=512, hash_name=mode), k=512)
        assert abs(est / 20000 - 1.0) < 0.15, (mode, est)
    # fewer distincts than k -> the sketch is the whole space, exact count
    small = spark.range(30).select(F.col("id").cast("string").alias("k"))
    assert SK.kmv_estimate(SK.kmv_sketch(small, "k", k=64), k=64) == 30.0
    with pytest.raises(ValueError, match="k must be"):
        SK.kmv_sketch(small, "k", k=4)


def test_kmv_merge_equals_whole_and_is_idempotent(spark):
    df = spark.range(3000).select(F.col("id").cast("string").alias("k"))
    a = SK.kmv_sketch(df.where(F.col("k").cast("long") % 2 == 0), "k", k=128, hash_name="md5")
    b = SK.kmv_sketch(df.where(F.col("k").cast("long") % 2 == 1), "k", k=128, hash_name="md5")
    whole = sorted(r["h"] for r in SK.kmv_sketch(df, "k", k=128, hash_name="md5").collect())
    merged = sorted(r["h"] for r in SK.kmv_merge(a, b, k=128).collect())
    assert merged == whole
    twice = sorted(r["h"] for r in SK.kmv_merge(a, a, a, k=128).collect())
    assert twice == sorted(r["h"] for r in a.collect())


def test_kmv_overlap_report(spark):
    """Two corpora with known 50% overlap: exact columns verified against a
    local bottom-k replay, estimates within tolerance of the true values."""
    # A = [0, 2000), B = [1000, 3000): |A|=|B|=2000, inter=1000, union=3000
    a_df = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    b_df = spark.range(1000, 3000).select(F.col("id").cast("string").alias("k"))
    k = 256
    sa = SK.kmv_sketch(a_df, "k", k=k, hash_name="md5")
    sb = SK.kmv_sketch(b_df, "k", k=k, hash_name="md5")
    row = SK.kmv_overlap(sa, sb, k=k).collect()[0]
    # exact columns replayed locally
    ha = sorted({_md5h60(str(i)) for i in range(0, 2000)})[:k]
    hb = sorted({_md5h60(str(i)) for i in range(1000, 3000)})[:k]
    hu = sorted(set(ha) | set(hb))[:k]
    n_both = sum(1 for h in hu if h in set(ha) and h in set(hb))
    assert row["n_a"] == k and row["n_b"] == k and row["n_union"] == k
    assert row["n_both"] == n_both
    # estimator sanity vs ground truth
    assert abs(row["est_distinct_a"] / 2000 - 1) < 0.2
    assert abs(row["est_union"] / 3000 - 1) < 0.2
    assert abs(row["est_jaccard"] - 1000 / 3000) < 0.12
    assert abs(row["est_intersection"] / 1000 - 1) < 0.45
    # est matches the shared pure-python estimator exactly on the same rows
    assert row["est_distinct_a"] == pytest.approx(SK.kmv_estimate_local(ha, k))


def test_kmv_persistence_append_and_guards(spark, tmp_path):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    halves = [df.where(F.col("k").cast("long") % 2 == i) for i in (0, 1)]
    path = str(tmp_path / "kmv")
    knobs = {"cols": ["k"], "k": 128, "hash_name": "md5"}
    SK.save_sketch(SK.kmv_sketch(halves[0], "k", k=128, hash_name="md5"), path, "kmv", knobs)
    SK.save_sketch(SK.kmv_sketch(halves[1], "k", k=128, hash_name="md5"), path, "kmv", knobs,
                   mode="append")
    loaded, meta = SK.load_sketch(spark, path)
    assert meta == {"kind": "kmv", **knobs}
    merged = sorted(r["h"] for r in SK.kmv_merge(loaded, k=128).collect())
    whole = sorted(r["h"] for r in SK.kmv_sketch(df, "k", k=128, hash_name="md5").collect())
    assert merged == whole
    with pytest.raises(ValueError, match="knobs"):
        SK.save_sketch(SK.kmv_sketch(df, "k", k=64, hash_name="md5"), path, "kmv",
                       {"cols": ["k"], "k": 64, "hash_name": "md5"}, mode="append")


# ---------------------------------------------------------------------------
# uniform row-sample sketch (r11)
# ---------------------------------------------------------------------------
def test_sample_sketch_matches_pure_python_twin_and_merges(spark):
    df = spark.range(2000).select(
        F.col("id").alias("rid"), (F.col("id") * 3 % 1000).cast("double").alias("v")
    )
    got = {r["h"]: r["v"] for r in SK.sample_sketch(df, "rid", "v", k=128, hash_name="md5").collect()}
    want_h = sorted(_md5h60(str(i)) for i in range(2000))[:128]
    assert sorted(got) == want_h
    # carried values belong to the right rows
    by_h = {_md5h60(str(i)): float(i * 3 % 1000) for i in range(2000)}
    assert all(got[h] == by_h[h] for h in got)
    # merge == whole, idempotent under replays
    halves = [df.where(F.col("rid") % 2 == i) for i in (0, 1)]
    parts = [SK.sample_sketch(h, "rid", "v", k=128, hash_name="md5") for h in halves]
    merged = {r["h"] for r in SK.sample_merge(*parts, parts[0], k=128).collect()}
    assert sorted(merged) == want_h
    # salt changes the sample; k<16 rejected
    salted = {r["h"] for r in SK.sample_sketch(df, "rid", "v", k=128, salt="e1", hash_name="md5").collect()}
    assert salted != set(want_h)
    with pytest.raises(ValueError, match="k must be"):
        SK.sample_sketch(df, "rid", "v", k=4)


def test_sample_quantile_accuracy_and_exactness(spark):
    import duckdb

    # v uniform on [0, 10000): sample median ~ 5000 at 1/sqrt(512) error
    df = spark.range(10000).select(F.col("id").alias("rid"), F.col("id").cast("double").alias("v"))
    sk = SK.sample_sketch(df, "rid", "v", k=512, hash_name="md5")
    med = SK.sample_quantile(sk, "v", 0.5)
    assert abs(med / 5000 - 1.0) < 0.15
    # nearest-rank == DuckDB quantile_disc over the SAME sample (exactness:
    # the estimate is an actual data value both engines pick identically)
    vals = [r["v"] for r in sk.collect()]
    for q in (0.1, 0.5, 0.9):
        want = duckdb.sql(
            f"SELECT quantile_disc(v, {q}) FROM (SELECT unnest({vals!r}) AS v)"
        ).fetchone()[0]
        assert SK.sample_quantile_local(vals, q) == want, q


def test_sample_sketch_persistence(spark, tmp_path):
    df = spark.range(1000).select(F.col("id").alias("rid"), F.col("id").cast("double").alias("v"))
    halves = [df.where(F.col("rid") % 2 == i) for i in (0, 1)]
    path = str(tmp_path / "smp")
    knobs = {"id_col": "rid", "cols": ["v"], "k": 64, "salt": "", "hash_name": "md5"}
    for i, h in enumerate(halves):
        SK.save_sketch(SK.sample_sketch(h, "rid", "v", k=64, hash_name="md5"), path, "sample",
                       knobs, mode="append" if i else "overwrite")
    loaded, meta = SK.load_sketch(spark, path)
    assert meta == {"kind": "sample", **knobs}
    merged = sorted(r["h"] for r in SK.sample_merge(loaded, k=64).collect())
    whole = sorted(r["h"] for r in SK.sample_sketch(df, "rid", "v", k=64, hash_name="md5").collect())
    assert merged == whole
