"""Driver-local reference twins for the approximate-nearest-neighbor
operators: pure-Python re-derivations of ``similarity.ann_lsh_topk`` and
the centroid-based IVF path, bit-exact against the distributed Column
expressions.

Purpose: the gate's ``ann_topk`` correctness row.  Tree/bucket traversal
has no independent SQL twin, but DISTRIBUTED == LOCAL is still a real
parity statement — every float operation here replays the exact IEEE-754
double op sequence the Spark expressions execute (left-fold ``F.aggregate``
accumulation, same rounding at every step), so any divergence in the
distributed path (wrong fold order, a float32 leak, a bucket-arithmetic
bug) breaks the hash.  ``tests/test_pipeline.py`` pins twin == Spark.

The xxhash64 here re-implements the PUBLIC XXH64 algorithm exactly as
Spark evaluates the ``xxhash64()`` SQL function over INT columns
(seed-chained per column; see apache/spark
sql/catalyst/expressions/XXH64.java — public reference, re-derived not
copied).  Everything is driver-side over bounded inputs (an ANN query's
candidate set), never a substitute for the distributed path.
"""

from __future__ import annotations

import functools
import math

_MASK64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


def _hash_int(i: int, seed: int) -> int:
    """XXH64 of one 4-byte int, as Spark's XxHash64 hashes IntegerType."""
    h = (seed + _P5 + 4) & _MASK64
    h ^= ((i & 0xFFFFFFFF) * _P1) & _MASK64
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
    return _fmix(h)


def _hash_long(l: int, seed: int) -> int:
    """XXH64 of one 8-byte long, as Spark's XxHash64 hashes LongType."""
    h = (seed + _P5 + 8) & _MASK64
    h ^= (_rotl((l * _P2) & _MASK64, 31) * _P1) & _MASK64
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_ints(values: list[int], seed: int = 42) -> int:
    """Spark's ``F.xxhash64(int_col, int_col, ...)``: per-column XXH64 with
    the running hash as each column's seed, returned as a signed long."""
    h = seed
    for v in values:
        h = _to_signed(_hash_int(v, h & _MASK64))
    return h


def _pmod(a: int, n: int) -> int:
    return a % n if a % n >= 0 else a % n + n


@functools.lru_cache(maxsize=None)
def plane_component(plane: int, dim: int, seed: int) -> float:
    """Mirror of ``dedup._hyperplane_bucket``'s hash-derived plane value in
    [-1, 1): pmod(xxhash64(p, d, seed), 10000) / 5000 - 1.

    Cached: the value depends only on (plane, dim, seed) — tables × planes
    × dims distinct triples — while ``hyperplane_bucket`` is called once
    per row, so without the cache the oracle twin re-derived each
    component ~rows× over (measured ~5 s of pure XXH64 at 500 rows)."""
    return _pmod(xxhash64_ints([plane, dim, seed]), 10000) / 5000.0 - 1.0


def hyperplane_bucket(vec: list[float], num_planes: int, seed: int) -> int:
    """Sign-pattern bucket, replaying the Column expression's left-fold
    float accumulation exactly."""
    bucket = 0
    for p in range(num_planes):
        acc = 0.0
        for d, v in enumerate(vec):
            acc += v * plane_component(p, d, seed)
        bucket = bucket * 2 + (1 if acc >= 0 else 0)
    return bucket


def cosine(a: list[float], b: list[float]) -> float:
    """Mirror of ``dedup._cosine``: sequential left-fold dot and norms."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    na, nb = math.sqrt(na), math.sqrt(nb)
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def _topk(scored: list[tuple[int, float]], k: int) -> list[tuple[int, int]]:
    """(id, rank) by score desc, id asc — ``cosine_topk``'s tiebreak."""
    ordered = sorted(scored, key=lambda t: (-t[1], t[0]))[:k]
    return [(i, r + 1) for r, (i, _) in enumerate(ordered)]


def lsh_topk_local(
    rows: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    num_planes: int = 6,
    seed: int = 42,
    multiprobe: int = 1,
    num_tables: int = 16,
) -> list[tuple[int, int]]:
    """Local twin of ``similarity.ann_lsh_topk`` over materialized
    (id, vector) rows."""
    probe_sets = []
    for t in range(num_tables):
        qb = hyperplane_bucket(query, num_planes, seed + 1000 * t)
        probes = {qb}
        if multiprobe > 0:
            for bit in range(num_planes):
                probes.add(qb ^ (1 << bit))
        probe_sets.append(probes)
    scored = []
    for rid, vec in rows:
        for t, probes in enumerate(probe_sets):
            if hyperplane_bucket(vec, num_planes, seed + 1000 * t) in probes:
                scored.append((rid, cosine(vec, query)))
                break
    return _topk(scored, k)


def assign_bucket_local(vec: list[float], centroids: list[list[float]]) -> int:
    """Local twin of ``similarity.ivf_assign_buckets``: argmin squared
    Euclidean distance, first-wins tiebreak, left-fold accumulation."""
    best, best_d = 0, None
    for i, c in enumerate(centroids):
        acc = 0.0
        for x, y in zip(vec, c):
            acc += (x - y) * (x - y)
        if best_d is None or acc < best_d:
            best, best_d = i, acc
    return best


def _probe_candidates(
    rows: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    query: list[float],
    n_probe: int,
) -> list[tuple[int, list[float]]]:
    """Rows whose assigned cell is among the query's ``n_probe`` nearest —
    mirrors ``similarity._probe_cells`` + the ivf_bucket filter, shared by
    both local IVF search twins."""
    from dqx_spark.pipeline.similarity import _probe_cells

    probe = set(_probe_cells(centroids, query, n_probe))
    return [(rid, vec) for rid, vec in rows if assign_bucket_local(vec, centroids) in probe]


def ivf_topk_local(
    rows: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 5,
) -> list[tuple[int, int]]:
    """Local twin of ``similarity.ivf_topk`` over bucket-assigned rows."""
    scored = [
        (rid, cosine(vec, query))
        for rid, vec in _probe_candidates(rows, centroids, query, n_probe)
    ]
    return _topk(scored, k)


def pq_encode_local(vec: list[float], codebooks: list[list[list[float]]]) -> list[int]:
    """Local twin of ``similarity.pq_encode``: per-subspace first-wins
    strict-< argmin over left-fold squared distances (shared
    ``_fold_sq_dist``), replaying the Column expression's IEEE op order
    exactly — INCLUDING the ``inf`` init: the Spark fold starts at
    ``lit(inf)``, under which a NaN distance never wins (NaN < inf is
    false on both engines), so a None-sentinel init would diverge on NaN
    inputs."""
    from dqx_spark.pipeline.similarity import _fold_sq_dist

    m = len(codebooks[0][0])
    code = []
    for s, book in enumerate(codebooks):
        sub = vec[s * m : (s + 1) * m]
        best, best_d = 0, float("inf")
        for i, c in enumerate(book):
            acc = _fold_sq_dist(sub, c)
            if acc < best_d:
                best, best_d = i, acc
        code.append(best)
    return code


def pq_topk_local(
    rows: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    rerank_r: int | None = None,
) -> list[tuple[int, int]]:
    """Local twin of ``similarity.pq_topk`` over (id, vector) rows: same
    driver-computed LUT (shared ``_fold_sq_dist`` op order), same ascending
    fold over subspaces, same (dist asc, id asc) tiebreak; with
    ``rerank_r`` the ADC top-R are exact-reranked by the identical
    left-fold squared L2."""
    from dqx_spark.pipeline.similarity import _fold_sq_dist

    m = len(codebooks[0][0])
    lut = [[_fold_sq_dist(query[s * m : (s + 1) * m], c) for c in book] for s, book in enumerate(codebooks)]
    scored = []
    for rid, vec in rows:
        code = pq_encode_local(vec, codebooks)
        adc = 0.0
        for s, c in enumerate(code):
            adc += lut[s][c]
        scored.append((rid, adc))
    return _rank_and_rerank(scored, dict(rows), query, k, rerank_r)


def _rank_and_rerank(
    scored: list[tuple[int, float]],
    vec_of: dict[int, list[float]],
    query: list[float],
    k: int,
    rerank_r: int | None,
) -> list[tuple[int, int]]:
    """Local twin of ``similarity._adc_rank_and_rerank``: (dist asc, id asc)
    ordering with optional exact top-R rerank — the ONE rank/tiebreak
    convention, shared by ``pq_topk_local`` and ``ivfpq_topk_local`` so the
    parity-critical contract has a single copy."""
    from dqx_spark.pipeline.similarity import _fold_sq_dist

    if rerank_r is None:
        ordered = sorted(scored, key=lambda t: (t[1], t[0]))[:k]
        return [(i, r + 1) for r, (i, _) in enumerate(ordered)]
    cand = {i for i, _ in sorted(scored, key=lambda t: (t[1], t[0]))[: int(rerank_r)]}
    reranked = [(i, _fold_sq_dist(vec_of[i], query)) for i in cand]
    ordered = sorted(reranked, key=lambda t: (t[1], t[0]))[:k]
    return [(i, r + 1) for r, (i, _) in enumerate(ordered)]


def ivfpq_topk_local(
    rows: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    n_probe: int = 5,
    rerank_r: int | None = None,
    residual: bool = True,
) -> list[tuple[int, int]]:
    """Local twin of ``similarity.ivfpq_topk``: same centroid probe ranking
    as ``ivf_topk_local``, then the PQ ADC path over only the surviving
    rows.  ``residual=True`` (default, IVFADC) replays the r8 residual
    path: per-row residual against the assigned cell, residual codes, and
    the per-cell LUTs from the SHARED ``similarity.residual_luts`` — the
    codebooks must be residual-trained."""
    from dqx_spark.pipeline.similarity import _probe_cells, residual_luts

    if not residual:
        cand = _probe_candidates(rows, centroids, query, n_probe)
        return pq_topk_local(cand, codebooks, query, k=k, rerank_r=rerank_r)

    probe = _probe_cells(centroids, query, n_probe)
    probe_set = set(probe)
    luts = residual_luts(centroids, codebooks, query, probe)
    scored = []
    vec_of = {}
    for rid, vec in rows:
        b = assign_bucket_local(vec, centroids)
        if b not in probe_set:
            continue
        resid = [a - c for a, c in zip(vec, centroids[b])]
        code = pq_encode_local(resid, codebooks)
        adc = 0.0
        for s, cd in enumerate(code):
            adc += luts[b][s][cd]
        scored.append((rid, adc))
        vec_of[rid] = vec
    return _rank_and_rerank(scored, vec_of, query, k, rerank_r)
