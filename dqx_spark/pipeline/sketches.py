"""Mergeable sketches for incremental corpus statistics.

At 100 TB a dashboard cannot re-scan the corpus to refresh a distinct
count or a frequency table: the production pattern is one bounded-size
MERGEABLE summary per ingested batch, combined associatively at read
time (per-batch sketch << per-batch rescan).  This module provides the
three workhorses as plain slim DataFrames — so they persist, prune, and
union like any other table — plus the exact merge algebra:

- :func:`hll_sketch` — HyperLogLog register table for distinct counts
  (Flajolet, Fusy, Gandouet & Meunier 2007, "HyperLogLog: the analysis of
  a near-optimal cardinality estimation algorithm").  ``2^p`` registers
  regardless of data size; merge = element-wise max.
- :func:`cms_sketch` — count-min frequency table (Cormode & Muthukrishnan
  2005, "An improved data stream summary: the count-min sketch")
  with Kirsch–Mitzenmacher double hashing (the same derivation as
  ``mixing._bloom_positions``).  ``depth × width`` counters; merge =
  element-wise sum; probes only ever OVER-estimate.
- :func:`moments_sketch` — (n, sum, min, max, M2) running-moments state
  with Chan, Golub & LeVeque (1983) parallel-variance merging — the
  mergeable core of the profiler's summary stats.

Spark already exposes one-shot ``approx_count_distinct`` (HLL++) and
``count_min_sketch``, but their binary sketch blobs are opaque to SQL and
to DuckDB; these table-shaped sketches keep every intermediate an
inspectable, oracle-checkable DataFrame and make cross-batch persistence
a plain parquet write (:func:`save_sketch` / :func:`load_sketch` add the
sidecar that records the hashing knobs, which must match at merge/probe
time — the ``save_ann_index`` family discipline).

Streaming ingestion composes directly: ``foreachBatch`` sketches each
micro-batch and :func:`save_sketch`-appends its rows; the read side
re-merges the accumulated layout, bit-equal to a whole-corpus sketch
(register max is associative and batch-partitioning-independent —
pinned by tests/test_streaming_ops.py over three real micro-batches).

Hashing: ``hash_name='xxhash64'`` (JVM, fast) is the default;
``'md5'`` routes through :func:`dqx_spark.pipeline.text.portable_hash60`
so DuckDB re-derives every register and counter bit-for-bit — the
conformance mode the correctness gate certifies (same convention as
MinHash/SimHash/Bloom).

Reference parity note: the reference profiler computes one-shot summary
stats (profiler.py); cross-batch mergeable state has no reference
counterpart — this is part of the beyond-reference scale surface.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqx_spark.pipeline.text import portable_hash60

__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "hll_estimate_local",
    "cms_sketch",
    "cms_merge",
    "cms_probe",
    "moments_sketch",
    "moments_merge",
    "histogram_sketch",
    "histogram_merge",
    "histogram_quantile",
    "histogram_quantile_local",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_estimate_local",
    "kmv_overlap",
    "sample_sketch",
    "sample_merge",
    "sample_quantile",
    "sample_quantile_local",
    "save_sketch",
    "load_sketch",
]

_HASH_BITS = 60  # portable_hash60 yields [0, 2^60); xxhash64 is pmod-folded to match


def _key_col(cols: list[str]) -> Column:
    """The hashed key: each column cast to string (NULL → ``chr(0)`` so a
    null is distinct from the string 'null' and from empty), joined by the
    unit separator.  DuckDB twin: ``coalesce(c::VARCHAR, chr(0))`` joined
    with ``chr(31)`` — both casts print integers and short doubles
    identically (the only value classes the gate hashes)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return parts[0] if len(parts) == 1 else F.concat_ws("\x1f", *parts)


def _hash60(key: Column, hash_name: str) -> Column:
    if hash_name == "md5":
        return portable_hash60(key)
    if hash_name == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(1 << _HASH_BITS))
    raise ValueError(f"hash_name must be 'xxhash64' or 'md5', got {hash_name!r}")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def hll_sketch(df: DataFrame, cols: list[str] | str, p: int = 12, hash_name: str = "xxhash64") -> DataFrame:
    """Sparse HLL register table ``(reg int, rho int)`` over the distinct
    values of ``cols``: register = top ``p`` hash bits, ``rho`` = leading
    zeros of the remaining ``60-p`` bits + 1 (via ``length(bin(w))`` —
    exact integer bit-length, no float log), register value = max rho.
    Absent registers mean rho 0.  ONE map-side-combinable aggregation with
    ≤ ``2^p`` output rows whatever the input size; merge with
    :func:`hll_merge`, estimate with :func:`hll_estimate`.  Standard error
    ≈ ``1.04/sqrt(2^p)`` (~1.6 % at the default p=12, 4096 registers)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18] (16..262144 registers), got {p}")
    cols = [cols] if isinstance(cols, str) else list(cols)
    h = _hash60(_key_col(cols), hash_name)
    tail_bits = _HASH_BITS - p
    w = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    # bin() renders without leading zeros on BOTH engines (bin(0) = '0'),
    # so bit_length(w) = length(bin(w)) for w > 0 and the w = 0 case is
    # the explicit all-zeros branch
    rho = F.when(w == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(
            F.shiftright(h, tail_bits).cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise register max — associative and idempotent, so batches
    can merge in any order, any grouping, and re-merging a batch is a
    no-op.  All inputs must share ``p`` and ``hash_name`` (the sidecar
    from :func:`save_sketch` records them; mixing differently-keyed
    sketches silently under-counts, which is why :func:`load_sketch`
    surfaces the knobs)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_estimate_local(registers: dict[int, int], p: int) -> float:
    """The HLL estimator over a register dict (missing = 0) — pure Python,
    shared verbatim by tests and twins.  Raw estimate
    ``alpha_m * m^2 / Σ 2^-rho`` with the small-range linear-counting
    correction (``m * ln(m / V)`` when E ≤ 2.5m and V empty registers
    remain); the 2^60 hash space makes the large-range correction moot."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    denom = sum(2.0 ** -float(registers.get(i, 0)) for i in range(m))
    est = alpha * m * m / denom
    zeros = m - sum(1 for v in registers.values() if v > 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / float(zeros))
    return est


def hll_estimate(sketch: DataFrame, p: int) -> float:
    """Driver-side estimate from a register table: collects ≤ ``2^p`` rows
    (a BOUNDED collect — 4096 at the default p), then
    :func:`hll_estimate_local`."""
    regs = {int(r["reg"]): int(r["rho"]) for r in sketch.collect()}
    return hll_estimate_local(regs, p)


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------
def _cms_bucket(h: Column, d: int, width: int) -> Column:
    """Row-``d`` counter index via Kirsch–Mitzenmacher double hashing —
    ``(h1 + d*h2) mod width`` with ``h2`` forced odd, the same two-derived-
    hashes construction (and citation) as ``mixing._bloom_positions``."""
    h1 = h % width
    h2 = (F.shiftright(h, 30) % width).bitwiseOR(F.lit(1))
    return (h1 + F.lit(d) * h2) % width


def cms_sketch(
    df: DataFrame, cols: list[str] | str, depth: int = 4, width: int = 1024,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """Sparse count-min table ``(d int, bucket int, cnt long)``: item
    frequencies folded into ``depth`` rows of ``width`` counters.  The
    scan fans each row out ``depth`` ways on a slim (d, bucket) projection,
    but partial aggregation collapses every partition to ≤ depth×width
    rows before the shuffle — the network cost is the SKETCH size, not the
    data size.  Merge = counter-wise sum (:func:`cms_merge`); probe =
    min over rows (:func:`cms_probe`), an upper bound that equals the true
    count when no collision lands in all ``depth`` rows (error ≤
    ``2·N/width`` with prob. ``1 - 2^-depth`` over the hash choice)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got depth={depth}, width={width}")
    cols = [cols] if isinstance(cols, str) else list(cols)
    h = _hash60(_key_col(cols), hash_name)
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"), _cms_bucket(h, d, width).cast("int").alias("bucket"))
        for d in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum — associative/commutative but NOT idempotent
    (unlike :func:`hll_merge`, re-merging the same batch double-counts:
    keep batch lineage in the layout, e.g. one subdir per batch)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_probe(
    sketch: DataFrame, items: DataFrame, cols: list[str] | str,
    depth: int = 4, width: int = 1024, hash_name: str = "xxhash64",
) -> DataFrame:
    """Estimated count per item row: the min over the ``depth`` counters
    each item hashes to.  The items fan out ``depth`` ways and the SKETCH
    side (≤ depth×width rows) is broadcast — probing a watchlist costs a
    watchlist-sized scan, never a corpus rescan.  Missing counters are 0
    (an item no batch ever saw).  ``depth``/``width``/``hash_name`` must
    be the sketch's own (from the :func:`load_sketch` sidecar)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    reserved = {"d", "bucket", "cnt", "est_count"} & set(cols)
    if reserved:
        raise ValueError(
            f"item columns {sorted(reserved)} collide with the sketch-internal "
            "names (d/bucket/cnt/est_count) - alias them first"
        )
    h = _hash60(_key_col(cols), hash_name)
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"), _cms_bucket(h, d, width).cast("int").alias("bucket"))
        for d in range(depth)
    ])
    melted = items.select(*cols, F.explode(pairs).alias("p")).select(
        *cols, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    )
    joined = melted.join(F.broadcast(sketch), on=["d", "bucket"], how="left")
    return joined.groupBy(*cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


# ---------------------------------------------------------------------------
# moments
# ---------------------------------------------------------------------------
def moments_sketch(df: DataFrame, col: str, by: list[str] | None = None) -> DataFrame:
    """Mergeable running-moments state ``(n, s, mn, mx, m2)`` — count, sum,
    min, max, and the centered second moment ``M2 = Σ(x - mean)^2``
    (``var_pop · n``), optionally per ``by`` group.  One aggregation; nulls
    excluded like every SQL aggregate."""
    c = F.col(col).cast("double")
    keys = [F.col(k) for k in (by or [])]
    return df.groupBy(*keys).agg(
        F.count(c).alias("n"),
        F.sum(c).alias("s"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
        (F.var_pop(c) * F.count(c)).alias("m2"),
    )


def moments_merge(*states: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Combine moments states with the Chan–Golub–LeVeque update,
    generalized to k inputs in one aggregation:
    ``M2 = Σ M2_i + Σ n_i·mean_i² − n·mean²`` (the pairwise
    ``delta²·n_a·n_b/n`` telescoped).  Emits the state columns plus the
    derived ``mean`` / ``var_pop`` / ``stddev_pop`` so a dashboard reads
    the merge output directly.  Exact in real arithmetic; in IEEE doubles
    it matches a direct pass to ~1e-9 relative on non-degenerate data
    (asserted far-threshold in tests and the gate — never compared
    bit-for-bit, the PSI discipline)."""
    keys = by or []
    state_cols = {"n", "s", "mn", "mx", "m2"}
    for st in states:
        extra = set(st.columns) - state_cols - set(keys)
        if extra:
            raise ValueError(
                f"state carries group columns {sorted(extra)} not named in by= - "
                "merging would silently collapse the groups into one state"
            )
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    g = out.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        (
            F.sum("m2")
            + F.sum(F.when(F.col("n") > 0, F.col("s") * F.col("s") / F.col("n")).otherwise(F.lit(0.0)))
            - F.when(F.sum("n") > 0, F.sum("s") * F.sum("s") / F.sum("n")).otherwise(F.lit(0.0))
        ).alias("m2"),
    )
    mean = F.when(F.col("n") > 0, F.col("s") / F.col("n"))
    var = F.when(F.col("n") > 0, F.col("m2") / F.col("n"))
    return g.select(
        *keys, "n", "s", "mn", "mx", "m2",
        mean.alias("mean"), var.alias("var_pop"), F.sqrt(var).alias("stddev_pop"),
    )


# ---------------------------------------------------------------------------
# histogram (quantiles)
# ---------------------------------------------------------------------------
def histogram_sketch(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 128
) -> DataFrame:
    """Fixed-edge binned counts ``(bin int, cnt long)`` — the mergeable
    quantile leg of incremental profiling (moments give mean/variance,
    this gives percentiles).  ``bin = floor((x - lo) / (hi - lo) * bins)``
    clamped into ``-1`` (underflow) and ``bins`` (overflow), so no value
    is ever silently dropped; counts are exact ints, merge = element-wise
    sum, and ONE identical arithmetic expression defines the edges on
    every engine (both IEEE doubles — the DuckDB twin reproduces every
    bin bit-for-bit).  ``lo``/``hi`` are EXPLICIT because merging only
    works across identical edges: derive them once (e.g. from a moments
    state, or domain knowledge) and freeze them in the
    :func:`save_sketch` sidecar.  Unlike ``percentile_approx`` — whose
    one-shot sketch blob can't be inspected, persisted as rows, or
    re-derived by an oracle — this trades adaptivity for a fixed
    ``(hi - lo) / bins`` resolution, the right trade when the domain is
    known (scores, ratios, prices) and batches arrive forever."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    if bins < 1:
        raise ValueError(f"need bins >= 1, got {bins}")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * F.lit(bins))
    b = (
        F.when(raw < 0, F.lit(-1))
        .when(raw >= bins, F.lit(bins))
        .otherwise(raw)
        .cast("int")
    )
    return (
        df.where(x.isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise count sum — NOT idempotent (the :func:`cms_merge`
    caveat); all inputs must share (lo, hi, bins), which the sidecar
    records."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantile_local(
    counts: dict[int, int], lo: float, hi: float, bins: int, q: float
) -> float:
    """Quantile from a binned-count dict by linear interpolation within
    the covering bin — pure Python, shared by tests/twins.  Underflow/
    overflow bins clamp to ``lo``/``hi`` (their true spread is unknown);
    exact answers need edges that cover the data.  Max error for covered
    data: one bin width."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    total = sum(counts.values())
    if total == 0:
        raise ValueError("empty histogram")
    width = (hi - lo) / bins
    target = q * total
    seen = 0.0
    for b in sorted(counts):
        c = counts[b]
        if seen + c >= target:
            if b < 0:
                return lo
            if b >= bins:
                return hi
            frac = (target - seen) / c if c else 0.0
            return lo + (b + frac) * width
        seen += c
    return hi


def histogram_quantile(
    sketch: DataFrame, lo: float, hi: float, bins: int, qs: list[float] | float
) -> list[float] | float:
    """Driver-side quantiles from a histogram table (bounded collect:
    ≤ bins + 2 rows)."""
    counts = {int(r["bin"]): int(r["cnt"]) for r in sketch.collect()}
    if isinstance(qs, (int, float)):
        return histogram_quantile_local(counts, lo, hi, bins, float(qs))
    return [histogram_quantile_local(counts, lo, hi, bins, float(q)) for q in qs]


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values)
# ---------------------------------------------------------------------------
def kmv_sketch(df: DataFrame, cols: list[str] | str, k: int = 1024, hash_name: str = "xxhash64") -> DataFrame:
    """Bottom-k sketch ``(h long)``: the ``k`` smallest DISTINCT 60-bit
    hashes of ``cols`` (Bar-Yossef et al. 2002; the unbiased ``(k−1)/U_k``
    estimator and bottom-k set operations follow Beyer et al. 2007).  The
    sketch IS a uniform sample of the distinct-value space, which is what
    HLL cannot give you: two corpora's sketches support overlap / Jaccard /
    union estimation (:func:`kmv_overlap`) because membership below both
    k-th minima is EXACT — the corpus-diff question ("how much of today's
    crawl is yesterday's?") answered from two ≤ k-row tables.

    Plan shape: project the hash → map-side partial DISTINCT → shuffle of
    per-partition distinct 8-byte hashes → ``TakeOrdered(k)``.  The
    distinct shuffle is the honest cost (same class as an exact
    count-distinct, far cheaper than shuffling rows); when only a
    cardinality is needed, :func:`hll_sketch` is the cheaper tool — KMV
    earns the shuffle when the SAMPLE itself is the product.  Merge =
    union → distinct → re-bottom-k (:func:`kmv_merge`): associative and
    idempotent, so per-batch sketches compose in any order and re-merging
    a batch is a no-op."""
    if k < 16:
        raise ValueError(f"k must be >= 16 for a usable estimator, got {k}")
    cols = [cols] if isinstance(cols, str) else list(cols)
    h = _hash60(_key_col(cols), hash_name)
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Bottom-k of the union of bottom-k sketches — exact, because any
    hash in the union's true bottom-k is in its own corpus's bottom-k.
    ``k`` must be the SAVE-time k (the sidecar records it); merging with a
    larger k silently under-fills and over-estimates."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate_local(hashes: list[int], k: int) -> float:
    """Distinct-count estimate from a sketch's hash list — pure Python,
    shared verbatim by tests and twins.  Fewer than ``k`` hashes means the
    sketch holds EVERY distinct hash (exact count); at ``k`` the unbiased
    estimator is ``(k−1) · 2^60 / h_(k)`` with ``h_(k)`` the largest
    retained hash (Beyer et al. 2007)."""
    n = len(hashes)
    if n < k:
        return float(n)
    return (k - 1) * float(1 << _HASH_BITS) / float(max(hashes))


def kmv_estimate(sketch: DataFrame, k: int) -> float:
    """Driver-side estimate — a BOUNDED collect of ≤ ``k`` longs."""
    return kmv_estimate_local([int(r["h"]) for r in sketch.collect()], k)


def kmv_overlap(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """One-row corpus-overlap report from two bottom-k sketches: exact
    sketch sizes + intersection count within the union's bottom-k, and the
    derived estimates — ``est_distinct_a/b``, ``est_jaccard`` (fraction of
    the union's bottom-k present in BOTH sketches — exact membership below
    both k-th minima makes this the standard bottom-k Jaccard estimator),
    ``est_union``, ``est_intersection`` (= jaccard × union).  One lazy
    plan over ≤ 3k rows — every aggregate is 1-row broadcast-crossJoined,
    nothing corpus-sized is touched."""
    merged = kmv_merge(sketch_a, sketch_b, k=k)
    flagged = (
        merged.join(sketch_a.select("h", F.lit(1).alias("in_a")), "h", "left")
        .join(sketch_b.select("h", F.lit(1).alias("in_b")), "h", "left")
    )
    space = float(1 << _HASH_BITS)

    def est(n_col, kth_col):
        return F.when(n_col < k, n_col.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(space) / kth_col.cast("double")
        )

    m = flagged.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.max("h").alias("kth_union"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0)).alias("n_both"),
    )
    a = sketch_a.agg(F.count(F.lit(1)).alias("n_a"), F.max("h").alias("kth_a"))
    b = sketch_b.agg(F.count(F.lit(1)).alias("n_b"), F.max("h").alias("kth_b"))
    est_union = est(F.col("n_union"), F.col("kth_union"))
    jac = F.col("n_both").cast("double") / F.col("n_union").cast("double")
    return (
        m.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            "n_a", "n_b", "n_union", "n_both",
            est(F.col("n_a"), F.col("kth_a")).alias("est_distinct_a"),
            est(F.col("n_b"), F.col("kth_b")).alias("est_distinct_b"),
            jac.alias("est_jaccard"),
            est_union.alias("est_union"),
            (jac * est_union).alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic uniform row sample (mergeable bottom-k by row-id hash)
# ---------------------------------------------------------------------------
def sample_sketch(
    df: DataFrame,
    id_col: str,
    cols: list[str] | str,
    k: int = 1024,
    salt: str = "",
    hash_name: str = "xxhash64",
) -> DataFrame:
    """``(h, *cols)`` — a UNIFORM row sample: the ``k`` rows whose salted
    row-id hash is smallest, carrying the requested value columns.  The
    KMV idea applied to ROWS instead of distinct values: because ``h`` is
    uniform per id, the retained rows are a uniform sample of the corpus,
    mergeable exactly (union → re-bottom-k; any row in the union's true
    bottom-k survives in its own batch's bottom-k) and idempotent
    (re-merging a batch re-keeps the same rows).  This is the quantile leg
    WITHOUT :func:`histogram_sketch`'s frozen-edges requirement — order
    statistics of the sample estimate any quantile at ~1/sqrt(k) error —
    and doubles as "show me an unbiased peek at the corpus", rerun- and
    partitioning-stable via ``salt``.  Plan: hash projection →
    ``TakeOrdered(k)`` (no distinct shuffle — ids are the caller's
    uniqueness contract, as everywhere in this module's family)."""
    if k < 16:
        raise ValueError(f"k must be >= 16 for usable order statistics, got {k}")
    cols = [cols] if isinstance(cols, str) else list(cols)
    h = _hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)) if salt
        else F.col(id_col).cast("string"),
        hash_name,
    )
    return df.select(h.alias("h"), *cols).orderBy("h").limit(k)


def sample_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Bottom-k of the union — ``dropDuplicates('h')`` first so re-merging
    a batch is a no-op (ids are unique, so equal hashes are replays, not
    distinct rows, modulo a 2^-60 collision)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.dropDuplicates(["h"]).orderBy("h").limit(k)


def sample_quantile_local(values: list, q: float):
    """Nearest-rank-lower order statistic of the sample — pure Python,
    shared by tests and twins; returns an ACTUAL data value (no
    interpolation), so two engines deriving the same sample return the
    identical value (DuckDB twin: ``quantile_disc``)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if not values:
        raise ValueError("empty sample")
    vs = sorted(values)
    idx = max(0, min(len(vs) - 1, int(math.ceil(q * len(vs))) - 1))
    return vs[idx]


def sample_quantile(sketch: DataFrame, col: str, qs: list[float] | float):
    """Driver-side quantiles from a sample sketch — bounded collect of
    ≤ k rows."""
    vals = [r[col] for r in sketch.select(col).collect() if r[col] is not None]
    if isinstance(qs, (int, float)):
        return sample_quantile_local(vals, float(qs))
    return [sample_quantile_local(vals, float(q)) for q in qs]


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------
_KINDS = {
    # r11 (r10 ADVICE): hll/cms/tokens record the sketched COLUMN(S) too —
    # appending a batch sketched over a different column with matching
    # hashing knobs would otherwise pass the mismatch guard and silently
    # corrupt merged estimates, the exact failure the guard exists for
    "hll": {"cols", "p", "hash_name"},
    "cms": {"cols", "depth", "width", "hash_name"},
    # bottom-k rows accumulate per batch; reads re-derive via kmv_merge
    # (distinct + re-bottom-k), so append is idempotent like hll
    "kmv": {"cols", "k", "hash_name"},
    # uniform row sample: accumulated batch bottom-ks re-merge at read
    # via sample_merge (dropDuplicates(h) makes replays no-ops)
    "sample": {"id_col", "cols", "k", "salt", "hash_name"},
    "moments": {"col"},
    "hist": {"col", "lo", "hi", "bins"},
    # (tok, c) unigram states from corpus.token_count_state — count-summed
    # like cms (append accumulates, re-merge at read; NOT idempotent)
    "tokens": {"col", "lowercase"},
}


def _path_missing(spark, sub: str) -> bool:
    """After a read over ``sub`` raised: is the failure attributable to
    the path genuinely not existing?  Probed via the Hadoop FS API, not
    exception-message text (r12, ADVICE r11 — substring matching is
    brittle across Spark versions/locales and can mis-route unrelated
    failures as 'nothing here yet')."""
    from dqx_spark.pipeline._fsutil import read_missing

    return read_missing(spark, sub)


def save_sketch(df: DataFrame, path: str, kind: str, knobs: dict, mode: str = "overwrite") -> None:
    """Persist a sketch table + a ``_sketch_meta`` sidecar recording its
    hashing knobs — merging or probing with DIFFERENT knobs silently
    corrupts estimates, so the knobs travel with the data and
    :func:`load_sketch` hands them back as the authority (the
    ``save_ann_index`` discipline).  Sketches are ≤ KBs; no partitioning.
    ``mode='append'`` is the legitimate cross-batch layout here (each
    batch appends its register/counter rows; reads re-merge), accepted
    for hll/cms — but NOT for moments, whose single-row state would be
    double-counted by a re-read that doesn't know the batch lineage."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {sorted(_KINDS)}, got {kind!r}")
    missing = _KINDS[kind] - set(knobs)
    if missing:
        raise ValueError(f"{kind} sidecar needs knobs {sorted(missing)}")
    if mode == "append" and kind == "moments":
        raise ValueError(
            "append on a moments sketch double-counts on the next moments_merge "
            "read - write each batch state to its own path and merge explicitly"
        )
    if mode == "append":
        # appending rows hashed with DIFFERENT knobs under a rewritten
        # sidecar is exactly the silent-corruption this family guards
        # against - verify against the existing sidecar (when one exists)
        # BEFORE touching the data
        try:
            _, existing = load_sketch(df.sparkSession, path)
        except Exception as e:  # noqa: BLE001
            if not _path_missing(df.sparkSession, path.rstrip("/") + "/_sketch_meta"):
                raise
            # The sidecar is missing — but load_sketch reads the sidecar
            # FIRST, so this alone cannot distinguish 'nothing here yet'
            # from 'data present, sidecar lost' (r10 ADVICE: a crashed
            # half-save — data is written before the sidecar — was being
            # adopted as first batch with unknown hashing knobs).  Probe
            # the data dir separately: only when NEITHER exists is this
            # the first batch.
            try:
                df.sparkSession.read.parquet(path.rstrip("/") + "/data")
            except Exception:  # noqa: BLE001
                if _path_missing(df.sparkSession, path.rstrip("/") + "/data"):
                    existing = None  # genuinely empty path: first batch
                else:
                    raise  # data dir present but unreadable: not ours to adopt
            else:
                raise ValueError(
                    f"{path!r} has sketch data but no readable _sketch_meta "
                    "sidecar (crashed half-save?) - appending would adopt rows "
                    "with unknown hashing knobs; rebuild at a fresh path or "
                    "delete the orphan data"
                ) from e
        if existing is not None:
            incoming = json.loads(
                json.dumps({"kind": kind, **{k: knobs[k] for k in sorted(knobs)}})
            )
            if existing != incoming:
                raise ValueError(
                    f"append knobs {incoming} disagree with the sidecar already at "
                    f"{path!r} ({existing}) - rows hashed with different knobs can "
                    "never merge; use a new path"
                )
    df.write.mode(mode).parquet(path.rstrip("/") + "/data")
    meta = {"kind": kind, **{k: knobs[k] for k in sorted(knobs)}}
    df.sparkSession.createDataFrame([(json.dumps(meta),)], "value string").coalesce(
        1
    ).write.mode("overwrite").text(path.rstrip("/") + "/_sketch_meta")


def load_sketch(spark, path: str) -> tuple[DataFrame, dict]:
    """Load ``(sketch_df, meta)``; ``meta['kind']`` plus the knobs recorded
    at save time.  For hll/cms layouts that accumulated appended batches,
    pass the frame through :func:`hll_merge` / :func:`cms_merge` (a 1-input
    merge re-normalizes the union)."""
    meta = json.loads(
        spark.read.text(path.rstrip("/") + "/_sketch_meta").collect()[0]["value"]
    )
    if meta.get("kind") not in _KINDS:
        raise ValueError(f"{path!r} is not a sketch layout (kind={meta.get('kind')!r})")
    return spark.read.parquet(path.rstrip("/") + "/data"), meta
