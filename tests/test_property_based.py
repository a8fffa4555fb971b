"""Property-based invariants (hypothesis) + golden all-checks YAML corpus."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.engine import ExtraParams
from dqx_spark.serde import deserialize_checks, load_checks_from_file, serialize_checks, validate_checks

RUN_TS = "2024-06-01 00:00:00"
# DQX_HYPOTHESIS_EXAMPLES=100 for soak runs; 12 keeps CI fast
SETTINGS = settings(
    max_examples=int(os.environ.get("DQX_HYPOTHESIS_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _engine():
    return DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS, run_id_overwrite="prop"))


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.one_of(st.none(), st.sampled_from(["", "a", "b", "A", " "])),
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=rows_strategy)
def test_split_partition_invariant(spark, rows):
    """good + invalid == total, and good has zero errors — for ANY data."""
    df = spark.createDataFrame([(i, *r) for i, r in enumerate(rows)], "idx int, k int, v int, s string")
    engine = _engine()
    checked = engine.apply_checks(
        df,
        [
            DQRowRule(check_func=C.is_not_null, column="v"),
            DQRowRule(check_func=C.is_not_null_and_not_empty, column="s", criticality="warn"),
            DQDatasetRule(check_func=C.is_unique, columns=["k"]),
        ],
    )
    total = df.count()
    good = engine.get_valid(checked)
    errors = checked.where(F.col("_errors").isNotNull())
    assert checked.count() == total
    assert good.count() + errors.count() == total


@SETTINGS
@given(rows=rows_strategy)
def test_is_unique_matches_sql_semantics(spark, rows):
    """is_unique (ANSI nulls_distinct) == SQL window count over non-null keys."""
    df = spark.createDataFrame([(i, r[1]) for i, r in enumerate(rows)], "idx int, k int")
    engine = _engine()
    checked = engine.apply_checks(df, [DQDatasetRule(check_func=C.is_unique, columns=["k"])])
    flagged = {r["idx"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    df.createOrReplaceTempView("t_prop_unique")
    expected = {
        r["idx"]
        for r in df.sparkSession.sql(
            "SELECT idx FROM (SELECT idx, k, count(*) OVER (PARTITION BY k) c FROM t_prop_unique) "
            "WHERE k IS NOT NULL AND c > 1"
        ).collect()
    }
    assert flagged == expected


@SETTINGS
@given(
    crit=st.sampled_from(["error", "warn"]),
    filt=st.one_of(st.none(), st.just("v > 0")),
    meta=st.one_of(st.none(), st.dictionaries(st.sampled_from(["a", "b"]), st.text(max_size=5), max_size=2)),
)
def test_serde_round_trip_property(crit, filt, meta):
    rule = DQRowRule(
        check_func=C.is_not_null, column="v", criticality=crit, filter=filt, user_metadata=meta or None
    )
    dicts = serialize_checks([rule])
    assert not validate_checks(dicts).has_errors
    back = deserialize_checks(dicts)[0]
    assert back.fingerprint() == rule.fingerprint()
    assert back.criticality == crit and back.filter == filt


def test_all_checks_yaml_corpus(spark, lineitem):
    """The golden YAML corpus deserializes, validates, and runs end-to-end;
    only the expected checks fire on the fixture."""
    checks = load_checks_from_file(os.path.join(os.path.dirname(__file__), "resources", "all_checks.yaml"))
    assert not validate_checks(checks).has_errors
    engine = _engine()
    checked = engine.apply_checks_by_metadata(lineitem, checks)
    total = lineitem.count()
    assert checked.count() == total

    fired = (
        checked.select(F.explode(F.col("_errors")).alias("e"))
        .groupBy("e.name").count().collect()
    )
    by_name = {r["name"]: r["count"] for r in fired}
    # the only true error violations in the fixture are the duplicated keys
    assert set(by_name) == {"l_orderkey_l_linenumber_is_unique"}
    # custom message_expr + filter check lands in warnings with the rendered message
    sample = (
        checked.select(F.explode(F.col("_warnings")).alias("w"))
        .where(F.col("w.name") == "custom_named_check")
        .limit(1)
        .collect()
    )
    if sample:  # fires only when a filtered row also violates — may be empty
        assert sample[0]["w"]["message"].startswith("qty ")


asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=1000),   # ts seconds
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(left=asof_rows, right=asof_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Backward as-of join agrees with pandas.merge_asof for ANY inputs
    (distinct right timestamps per key — merge_asof's tie behavior for
    duplicate keys is unspecified, ours is max-payload)."""
    import pandas as pd

    from dqx_spark.pipeline import joins

    right = list({(k, t) for k, t in right})  # distinct (key, ts)
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        [(k, t, float(k * 10000 + t)) for k, t in right], "k long, ts long, v double"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        r["lid"]: r["v_right"]
        for r in joins.asof_join(ldf, rdf, on=["k"], left_ts="ts", right_cols=["v"]).collect()
    }
    lp = pd.DataFrame([(i, k, pd.Timestamp(t, unit="s")) for i, (k, t) in enumerate(left)],
                      columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame([(k, pd.Timestamp(t, unit="s"), float(k * 10000 + t)) for k, t in right],
                      columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.v) else float(r.v)) for r in merged.itertuples()}
    assert got == want


@SETTINGS
@given(points=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20),
       ivs=st.lists(st.tuples(st.integers(min_value=0, max_value=100),
                              st.integers(min_value=0, max_value=40)), min_size=0, max_size=10))
def test_range_join_matches_brute_force(spark, points, ivs):
    """Bucketed range join produces exactly the brute-force pair set."""
    from dqx_spark.pipeline import joins

    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pid long, v double"
    )
    idf = spark.createDataFrame(
        [(j, float(lo), float(lo + ln)) for j, (lo, ln) in enumerate(ivs)],
        "iid long, lo double, hi double",
    )
    got = {(r["pid"], r["iid"]) for r in joins.range_join(pdf, idf, "v", "lo", "hi").collect()}
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= p <= lo + ln
    }
    assert got == want


packing_rows = st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40)


@SETTINGS
@given(toks=packing_rows, max_tokens=st.sampled_from([64, 1024]))
def test_pack_greedy_matches_python_reference(spark, toks, max_tokens):
    from dqx_spark.pipeline import packing

    df = spark.createDataFrame(list(enumerate(toks)), "doc_id long, tc long")
    got = {
        r.id: r.bin
        for r in packing.pack_greedy(df, "doc_id", "tc", max_tokens, num_shards=1).collect()
    }
    bins, current, used = {}, 0, 0
    for i, t in enumerate(toks):
        if used > 0 and used + t > max_tokens:
            current += 1
            used = 0
        bins[i] = current
        used += t
    assert got == bins


@SETTINGS
@given(toks=packing_rows)
def test_pack_offsets_is_exact_cumsum(spark, toks):
    from dqx_spark.pipeline import packing

    df = spark.createDataFrame(list(enumerate(toks)), "doc_id long, tc long")
    out = sorted(packing.pack_offsets(df, "doc_id", "tc", 128, num_shards=1).collect(), key=lambda r: r.id)
    run = 0
    for r, t in zip(out, toks):
        assert r.offset == run
        assert r.first_seq == run // 128
        assert r.last_seq == max(run + t - 1, run) // 128
        run += t


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet=" abco\n", min_size=0, max_size=60), min_size=1, max_size=10
    ),
    chunk=st.sampled_from([(4, 0), (4, 1), (5, 3)]),
)
def test_chunking_reconstructs_tokens(spark, texts, chunk):
    """Concatenating each doc's non-overlapped chunk windows reproduces its
    exact whitespace-normalized token stream."""
    from dqx_spark.pipeline import text as T

    size, overlap = chunk
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    chunks = {}
    for r in T.chunk_by_tokens(df, "doc_id", "text", size, overlap).collect():
        chunks.setdefault(r.id, []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert i not in chunks
            continue
        got = []
        for c in sorted(chunks[i], key=lambda r: r.chunk_idx):
            win = c.chunk.split(" ") if c.chunk else []
            start = 0 if c.chunk_idx == 0 else overlap
            got.extend(win[start:])
        assert got == toks, (t, chunks[i])


@SETTINGS
@given(
    lefts=st.lists(st.tuples(st.floats(0, 100, allow_nan=False), st.floats(0, 30, allow_nan=False)), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.floats(0, 100, allow_nan=False), st.floats(0, 30, allow_nan=False)), min_size=0, max_size=25),
)
def test_interval_join_property(spark, lefts, rights):
    """Bucketed interval join == brute-force overlap for ANY interval sets
    (including degenerate zero-length and inverted-filtered intervals)."""
    from dqx_spark.pipeline import joins

    left = spark.createDataFrame(
        [(i, a, a + w) for i, (a, w) in enumerate(lefts)], "lid long, l_lo double, l_hi double"
    )
    right = spark.createDataFrame(
        [(j, b, b + w) for j, (b, w) in enumerate(rights)], "rid long, r_lo double, r_hi double"
    ) if rights else spark.createDataFrame([], "rid long, r_lo double, r_hi double")
    got = {
        (r.lid, r.rid)
        for r in joins.interval_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi").collect()
    }
    expect = {
        (i, j)
        for i, (a, w1) in enumerate(lefts)
        for j, (b, w2) in enumerate(rights)
        if a <= b + w2 and b <= a + w1
    }
    assert got == expect


# ---------------------------------------------------------------------------
# exact polygon intersection vs an independent shapely-free reference
# ---------------------------------------------------------------------------
def _seg_intersect_ref(a1, a2, b1, b2):
    """Independent reference: solve the 2x2 linear system for segment
    parameters (not the orientation test the operator uses)."""
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = a1, a2, b1, b2
    dx1, dy1 = x2 - x1, y2 - y1
    dx2, dy2 = x4 - x3, y4 - y3
    den = dx1 * dy2 - dy1 * dx2
    if den == 0:
        # parallel / collinear: check 1-D overlap on the carrying line
        cross = dx1 * (y3 - y1) - dy1 * (x3 - x1)
        if cross != 0:
            return False
        def within(p, q, r):  # r on segment pq (collinear assumed)
            return min(p[0], q[0]) <= r[0] <= max(p[0], q[0]) and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        return within(a1, a2, b1) or within(a1, a2, b2) or within(b1, b2, a1) or within(b1, b2, a2)
    t = ((x3 - x1) * dy2 - (y3 - y1) * dx2) / den
    u = ((x3 - x1) * dy1 - (y3 - y1) * dx1) / den
    return 0 <= t <= 1 and 0 <= u <= 1


def _point_in_ref(pt, ring):
    inside = False
    n = len(ring) - 1
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        if (y1 > pt[1]) != (y2 > pt[1]):
            xint = x1 + (x2 - x1) * (pt[1] - y1) / (y2 - y1)
            if pt[0] < xint:
                inside = not inside
    return inside


def _polys_intersect_ref(ra, rb):
    for i in range(len(ra) - 1):
        for j in range(len(rb) - 1):
            if _seg_intersect_ref(ra[i], ra[i + 1], rb[j], rb[j + 1]):
                return True
    return _point_in_ref(ra[0], rb) or _point_in_ref(rb[0], ra)


def _quad(cx, cy, w, h):
    """Convex quadrilateral (axis-aligned rect as a closed ring)."""
    return [(cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h), (cx, cy)]


def _diamond(cx, cy, r):
    return [(cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)]


def _wkt(ring):
    return "POLYGON((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"


poly_strategy = st.lists(
    st.tuples(
        st.booleans(),  # rect vs diamond
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    min_size=2,
    max_size=6,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(polys=poly_strategy)
def test_polygons_disjoint_matches_reference(spark, polys):
    rings = [
        _diamond(cx, cy, w) if is_diamond else _quad(cx, cy, w, h)
        for is_diamond, cx, cy, w, h in polys
    ]
    df = spark.createDataFrame(
        [(i, _wkt(r)) for i, r in enumerate(rings)], "id int, g string"
    )
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams
    import dqx_spark.functions as C

    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite="2024-06-01 00:00:00"))
    checked = engine.apply_checks(
        df, [DQDatasetRule(check_func=C.are_polygons_mutually_disjoint, column="g")]
    )
    got = {r["id"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    expected = {
        i
        for i in range(len(rings))
        if any(j != i and _polys_intersect_ref(rings[i], rings[j]) for j in range(len(rings)))
    }
    assert got == expected, f"rings={rings}"


@settings(max_examples=200, deadline=None)
@given(
    verts=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=3,
        max_size=8,
    ),
    px=st.floats(min_value=-60, max_value=60, allow_nan=False),
    py=st.floats(min_value=-60, max_value=60, allow_nan=False),
    cells=st.integers(min_value=4, max_value=512),
)
def test_grid_polyfill_agrees_with_ray_cast(verts, px, py, cells):
    """Driver-side property: for any simple-ish ring, classifying the
    query point through the polyfill (full cell -> in; boundary cell ->
    exact ray cast; else out) must equal the direct even-odd ray cast —
    the grid is a short-circuit, never a semantic change."""
    from dqx_spark.functions.geo_checks import _polyfill_grid, _pt_in_ring_py
    import math

    ring = verts + [verts[0]]
    xs, ys = [v[0] for v in ring], [v[1] for v in ring]
    if max(xs) - min(xs) < 1e-6 or max(ys) - min(ys) < 1e-6:
        return  # degenerate sliver: grid width collapses

    def _seg_dist2(px_, py_, ax, ay, bx, by):
        vx, vy = bx - ax, by - ay
        d2 = vx * vx + vy * vy
        t = 0.0 if d2 == 0 else max(0.0, min(1.0, ((px_ - ax) * vx + (py_ - ay) * vy) / d2))
        dx, dy = px_ - (ax + t * vx), py_ - (ay + t * vy)
        return dx * dx + dy * dy

    if min(_seg_dist2(px, py, *ring[i], *ring[i + 1]) for i in range(len(ring) - 1)) < 1e-12:
        return  # point on (or within float fuzz of) the boundary: even-odd
        # containment is ill-defined there, and the grid and direct paths
        # may legitimately disagree (found by hypothesis via a subnormal
        # vertex coordinate 2e-311 from the query point)
    full, boundary, cell = _polyfill_grid(ring, cells)
    cid = f"{math.floor(px / cell)}:{math.floor(py / cell)}"
    via_grid = cid in full or (cid in boundary and _pt_in_ring_py(px, py, ring))
    assert via_grid == _pt_in_ring_py(px, py, ring)


# --- dedup_paragraphs invariants ------------------------------------------

para_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha beta", "shared one", "gamma", "dup dup", "x", "  padded  "]),
        min_size=0,
        max_size=5,
    ),
    min_size=1,
    max_size=10,
)


@SETTINGS
@given(doc_paras=para_docs_strategy)
def test_dedup_paragraphs_global_uniqueness_and_idempotence(spark, doc_paras):
    """Invariants: (1) after dedup every surviving paragraph is globally
    unique across the corpus; (2) each distinct input paragraph survives
    exactly once (nothing is lost outright); (3) a second pass removes
    nothing (idempotence)."""
    from dqx_spark.pipeline import dedup

    rows = [(i, "\n\n".join(ps)) for i, ps in enumerate(doc_paras)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.dedup_paragraphs(df, "doc_id", "text").collect()

    survivors = []
    for r in out:
        survivors.extend(p for p in r.text_dedup.split("\n\n") if p != "")
    # (1)+(2): surviving multiset == distinct input paragraph set
    distinct_inputs = {p.strip() for ps in doc_paras for p in ps if p.strip() != ""}
    assert sorted(survivors) == sorted(distinct_inputs)

    # (3) idempotence on the deduped corpus
    df2 = spark.createDataFrame(
        [(r.doc_id, r.text_dedup) for r in out], "doc_id long, text string"
    )
    out2 = {r.doc_id: r for r in dedup.dedup_paragraphs(df2, "doc_id", "text").collect()}
    for r in out:
        assert out2[r.doc_id].removed_paragraph_count == 0
        assert out2[r.doc_id].text_dedup == r.text_dedup


# --- differential testing: random rule sets vs a pure-pandas evaluator ----

_DIFF_CHECKS = ["is_not_null", "is_in_range", "is_in_list", "regex_match", "is_not_greater_than", "is_not_null_and_not_empty"]


def _expected_fail(func: str, val, lo, hi, allowed, regex, limit) -> bool:
    """Independent Python re-implementation of each check's fail predicate
    (null always passes except the null checks — the package-wide
    convention)."""
    import re as _re

    if func == "is_not_null":
        return val is None
    if func == "is_not_null_and_not_empty":
        # trim_strings defaults False (reference check_funcs.py:169)
        return val is None or str(val) == ""
    if val is None:
        return False
    if func == "is_in_range":
        return not (lo <= val <= hi)
    if func == "is_in_list":
        return val not in allowed
    if func == "regex_match":
        return _re.search(regex, str(val)) is None
    if func == "is_not_greater_than":
        return val > limit
    raise AssertionError(func)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.sampled_from(["", " ", "a", "ab", "xyz", "A1"])),
        ),
        min_size=1,
        max_size=25,
    ),
    picks=st.lists(st.sampled_from(_DIFF_CHECKS), min_size=1, max_size=6),
    lo=st.integers(-20, 0),
    hi=st.integers(1, 20),
    limit=st.integers(-10, 10),
)
def test_random_row_rule_sets_match_python_reference(spark, rows, picks, lo, hi, limit):
    """Differential property: for ANY random combination of row checks and
    ANY random data, the set of fired check names per row equals an
    independent pure-Python evaluation — exercising rule assembly,
    array_compact, criticality routing, and each check's null semantics in
    one pass."""
    allowed = ["a", "ab"]
    regex = "a"
    # unique row ids via enumerate — the generated first element may repeat
    rows = [(i, num, s_) for i, (_, num, s_) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id long, num int, s string")
    rules, spec = [], []
    for i, func in enumerate(picks):
        col = "num" if func in ("is_in_range", "is_not_greater_than", "is_not_null") else "s"
        kwargs = {}
        if func == "is_in_range":
            kwargs = {"min_limit": lo, "max_limit": hi}
        elif func == "is_in_list":
            kwargs = {"allowed": allowed}
        elif func == "regex_match":
            kwargs = {"regex": regex}
        elif func == "is_not_greater_than":
            kwargs = {"limit": limit}
        name = f"r{i}_{func}"
        rules.append(
            DQRowRule(name=name, check_func=getattr(C, func), column=col, check_func_kwargs=kwargs)
        )
        spec.append((name, func, col))
    out = _engine().apply_checks(df, rules)
    got = {
        r["id"]: {e["name"] for e in (r["_errors"] or [])} for r in out.collect()
    }
    for rid, num, s in rows:
        expected = set()
        for name, func, col in spec:
            val = num if col == "num" else s
            if _expected_fail(func, val, lo, hi, allowed, regex, limit):
                expected.add(name)
        assert got[rid] == expected, f"row {rid} ({num!r},{s!r}): {got[rid]} != {expected}"


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_int8_quantization_error_bound(spark, vecs):
    """For ANY vectors: per-element dequantization error <= scale/2 (the
    round-off bound), zero vectors round-trip exactly, and scale is the
    absmax/127 by construction."""
    from dqx_spark.pipeline.similarity import dequantize_embeddings, quantize_embeddings

    df = spark.createDataFrame(list(enumerate(vecs)), "id long, v array<double>")
    out = quantize_embeddings(df, "v").select(
        "id", "v", "v_scale", dequantize_embeddings("v_q8", "v_scale").alias("back")
    )
    for r in out.collect():
        absmax = max(abs(x) for x in r.v)
        assert abs(r.v_scale - absmax / 127.0) <= 1e-12 * max(absmax, 1.0)
        for orig, back in zip(r.v, r.back):
            assert abs(orig - back) <= r.v_scale / 2 + 1e-9, (orig, back, r.v_scale)


# --- span dedup: differential vs a pure-Python reference -------------------
span_docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(doc_toks=span_docs_strategy, k=st.sampled_from([2, 3]))
def test_remove_duplicate_spans_matches_python_reference(spark, doc_toks, k):
    """Differential test on tiny alphabets (duplication-dense): the Spark
    plan reproduces a direct Python implementation of the keep-first +
    canonical-protection semantics, and every duplicated k-window survives
    contiguously somewhere."""
    from dqx_spark.pipeline import dedup

    rows = [(i, " ".join(ts)) for i, ts in enumerate(doc_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(df, "doc_id", "text", k=k).collect()
    }

    # python reference: same occurrence/winner/protection arithmetic
    occ = {}
    for i, ts in enumerate(doc_toks):
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    losing, winning = {}, {}
    for places in occ.values():
        if len(places) > 1:
            win = min(places)
            winning.setdefault(win[0], set()).add(win[1])
            for pl in places:
                if pl != win:
                    losing.setdefault(pl[0], set()).add(pl[1])
    for i, ts in enumerate(doc_toks):
        rm = {q for p in losing.get(i, ()) for q in range(p, p + k)}
        prot = {q for p in winning.get(i, ()) for q in range(p, p + k)}
        kept = [t for j, t in enumerate(ts) if j not in (rm - prot)]
        assert out[i]["text_dedup"] == " ".join(kept)
        assert out[i]["removed_token_count"] == len(ts) - len(kept)

    # every duplicated window survives contiguously in some output doc
    for win_toks, places in occ.items():
        if len(places) > 1:
            pat = " ".join(win_toks)
            assert any(pat in out[i]["text_dedup"] for i in range(len(doc_toks)))


# --- token-budget sampling: differential vs a pure-Python reference --------
budget_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),          # id
        st.sampled_from(["s1", "s2"]),                   # source
        st.one_of(st.none(), st.integers(min_value=0, max_value=40)),  # tokens
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@SETTINGS
@given(rows=budget_rows_strategy, budget=st.integers(min_value=0, max_value=120))
def test_sample_to_token_budget_exact_matches_python_reference(spark, rows, budget):
    """Differential: exact mode reproduces hash-ranked prefix-cumsum
    selection computed directly in Python with the same portable md5
    bucket, and the kept token total never overshoots by more than one
    document."""
    import hashlib

    from dqx_spark.pipeline import mixing

    df = spark.createDataFrame(rows, "id long, source string, n_tok int")
    out = {
        r["id"]: r["in_budget"]
        for r in mixing.sample_to_token_budget(
            df, "id", "source", "n_tok", {"s1": budget}, default_budget=None
        ).collect()
    }

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1_000_000

    expected, kept_tokens = {}, 0
    s1 = sorted((r for r in rows if r[1] == "s1"), key=lambda r: (bucket(r[0]), r[0]))
    acc = 0
    for rid, _, t in s1:
        expected[rid] = acc < budget
        if expected[rid]:
            acc += t or 0
            kept_tokens += t or 0
    for rid, src, _ in rows:
        if src != "s1":
            expected[rid] = True  # unlimited default budget
    assert out == expected
    max_doc = max((t or 0 for *_ , t in s1), default=0)
    assert kept_tokens <= budget + max_doc


@SETTINGS
@given(
    words=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=12,
    ),
    num_merges=st.integers(min_value=0, max_value=30),
)
def test_bpe_properties(words, num_merges):
    """r8: BPE invariants — every encoded word reassembles to the
    original + end marker; token count never exceeds chars + 1 and never
    falls below 1; training is deterministic; more merges never increase
    a trained word's token count."""
    from dqx_spark.pipeline import bpe

    merges = bpe.train_bpe_local(words, num_merges, min_pair_freq=1)
    assert merges == bpe.train_bpe_local(dict(words), num_merges, min_pair_freq=1)
    ranks = bpe.merge_ranks(merges)
    fewer = bpe.merge_ranks(merges[: len(merges) // 2])
    for w in words:
        toks = bpe.encode_word_local(w, ranks)
        assert "".join(toks) == w + bpe.END_OF_WORD
        assert 1 <= len(toks) <= len(w) + 1
        assert len(toks) <= len(bpe.encode_word_local(w, fewer))


@SETTINGS
@given(bits=st.lists(st.booleans(), min_size=1, max_size=64))
def test_pack_bits_signed64_roundtrip(bits):
    """r8: the shared bit packer is a bijection onto the signed-64 range
    — unpacking recovers every bit, MSB first."""
    from dqx_spark.pipeline.multimodal import _pack_bits_signed64

    h = _pack_bits_signed64(bits)
    assert -(1 << 63) <= h < 1 << 63
    u = h + (1 << 64) if h < 0 else h
    recovered = [bool((u >> (len(bits) - 1 - i)) & 1) for i in range(len(bits))]
    assert recovered == [bool(b) for b in bits]
    if len(bits) < 64:
        assert h >= 0  # sign wrap only at full width


@SETTINGS
@given(
    a=st.dictionaries(st.text(alphabet="pqrs", min_size=1, max_size=3),
                      st.integers(min_value=1, max_value=20), min_size=1, max_size=6),
    b=st.dictionaries(st.text(alphabet="pqrs", min_size=1, max_size=3),
                      st.integers(min_value=1, max_value=20), min_size=1, max_size=6),
)
def test_js_divergence_python_reference(a, b):
    """r8: the Spark JS matches an independent pure-python computation
    and respects the [0, ln 2] bounds + symmetry (spark-free check via
    the same arithmetic the oracle uses)."""
    import math

    def js(ca, cb):
        ta, tb = sum(ca.values()), sum(cb.values())
        vocab = set(ca) | set(cb)
        ka = kb = 0.0
        for t in vocab:
            pa, pb = ca.get(t, 0) / ta, cb.get(t, 0) / tb
            m = (pa + pb) / 2
            if pa > 0:
                ka += pa * math.log(pa / m)
            if pb > 0:
                kb += pb * math.log(pb / m)
        return (ka + kb) / 2

    v = js(a, b)
    assert -1e-15 <= v <= math.log(2) + 1e-15
    assert abs(v - js(b, a)) < 1e-12
    assert js(a, a) == 0.0


@SETTINGS
@given(
    ids=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40, unique=True),
    salt=st.text(alphabet="xyz", max_size=3),
)
def test_shuffle_positions_match_python_reference(spark, ids, salt):
    """r9: for ANY unique id set and salt, shuffle_positions is the exact
    0-based rank under the (md5(salt||id), id) order a pure-python
    reference computes — and a permutation of 0..n-1."""
    import hashlib

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    from dqx_spark.pipeline import mixing

    got = {
        r["id"]: r["shuffle_pos"]
        for r in mixing.shuffle_positions(df, "id", salt=salt, prefix_chars=2).collect()
    }
    order = sorted(ids, key=lambda i: (hashlib.md5(f"{salt}{i}".encode()).hexdigest(), i))
    assert got == {i: p for p, i in enumerate(order)}
    assert sorted(got.values()) == list(range(len(ids)))


# r10: sketch twins — for ARBITRARY strings (unicode, empties, nulls) the
# Spark md5-mode HLL registers and CMS counters must equal a pure-python
# replay of the documented hash math, and HLL must be insensitive to both
# duplication and batch partitioning (merge == whole).
sketch_strings = st.lists(
    st.one_of(st.none(), st.text(max_size=12)), min_size=1, max_size=25
)


@SETTINGS
@given(vals=sketch_strings, salt=st.integers(min_value=0, max_value=3))
def test_sketch_md5_twin_and_merge_invariants(spark, vals, salt):
    import hashlib

    from dqx_spark.pipeline import sketches as SK

    df = spark.createDataFrame([(v,) for v in vals], "k string")

    def h60(v):
        key = "\x00" if v is None else v
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    p, tail = 6, 54
    want = {}
    for v in vals:
        h = h60(v)
        w = h & ((1 << tail) - 1)
        rho = tail + 1 if w == 0 else tail - w.bit_length() + 1
        r = h >> tail
        want[r] = max(want.get(r, 0), rho)
    got = {r["reg"]: r["rho"] for r in SK.hll_sketch(df, "k", p=p, hash_name="md5").collect()}
    assert got == want

    # partition-independence: split by an arbitrary hash salt, merge == whole
    halves = [
        df.where(F.pmod(F.xxhash64("k", F.lit(salt)), F.lit(2)) == i).unionByName(
            df.where(F.col("k").isNull()) if i == 0 else df.where(F.lit(False))
        )
        for i in (0, 1)
    ]
    merged = {
        r["reg"]: r["rho"]
        for r in SK.hll_merge(
            *[SK.hll_sketch(h, "k", p=p, hash_name="md5") for h in halves]
        ).collect()
    }
    assert merged == got

    d, wdt = 2, 32
    cnt = {}
    for v in vals:
        h = h60(v)
        h1, h2 = h % wdt, ((h >> 30) % wdt) | 1
        for j in range(d):
            key = (j, (h1 + j * h2) % wdt)
            cnt[key] = cnt.get(key, 0) + 1
    got_cms = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_sketch(df, "k", depth=d, width=wdt, hash_name="md5").collect()
    }
    assert got_cms == cnt


@SETTINGS
@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=6)), min_size=1, max_size=40
    ),
    salt=st.integers(min_value=0, max_value=9),
    k=st.sampled_from([16, 24]),
)
def test_kmv_and_sample_merge_invariants(spark, vals, salt, k):
    """r11: for ANY value multiset and ANY partition split — the KMV
    sketch is exactly the k smallest distinct md5-60 hashes (pure-python
    twin), per-part sketches merge to the whole, and the row-sample sketch
    does the same over unique row ids."""
    import hashlib

    from dqx_spark.pipeline import sketches as SK

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    df = spark.createDataFrame(list(enumerate(vals)), "rid long, k string")
    kv = df.select("k")
    got = sorted(r["h"] for r in SK.kmv_sketch(kv, "k", k=k, hash_name="md5").collect())
    want = sorted({h60("\x00" if v is None else v) for v in vals})[:k]
    assert got == want
    halves = [df.where(F.pmod(F.xxhash64("rid", F.lit(salt)), F.lit(2)) == i) for i in (0, 1)]
    merged = sorted(
        r["h"]
        for r in SK.kmv_merge(
            *[SK.kmv_sketch(h.select("k"), "k", k=k, hash_name="md5") for h in halves], k=k
        ).collect()
    )
    assert merged == want
    # row sample: bottom-k by ROW id hash, merge == whole, values carried
    s_whole = {r["h"]: r["k"] for r in SK.sample_sketch(df, "rid", "k", k=k, hash_name="md5").collect()}
    assert sorted(s_whole) == sorted(h60(str(i)) for i in range(len(vals)))[:k]
    s_merged = {
        r["h"]: r["k"]
        for r in SK.sample_merge(
            *[SK.sample_sketch(h, "rid", "k", k=k, hash_name="md5") for h in halves], k=k
        ).collect()
    }
    assert s_merged == s_whole


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet=" abcdef", min_size=0, max_size=24), min_size=1, max_size=12
    ),
    tsel=st.integers(min_value=2, max_value=4),
)
def test_dsir_weight_exactness_property(spark, texts, tsel):
    """r11: the DSIR sorted-fold weight equals the pure-python replay
    BIT-FOR-BIT for arbitrary text — the exactness contract the gate twin
    relies on (float addition pinned to sorted order)."""
    from dqx_spark.pipeline import mixing as mx

    B = 32
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    target = df.where(F.col("doc_id") % tsel == 0)
    tc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(target, "text", B, hash_name="md5").collect()}
    rc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(df, "text", B, hash_name="md5").collect()}
    ratios = mx.dsir_log_ratios(tc, rc, B)
    got = {
        r["doc_id"]: (r["dsir_n_features"], r["dsir_logw"])
        for r in mx.dsir_weights(df, "doc_id", "text", ratios, B, hash_name="md5").collect()
    }
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for i, text in enumerate(texts):
        toks = text.lower().split()
        feats = [h60(t) % B for t in toks]
        feats += [h60(a + "\x1f" + b) % B for a, b in zip(toks, toks[1:])]
        acc = 0.0
        for v in sorted(ratios[b] for b in feats):
            acc += v
        assert got[i] == (len(feats), acc), (i, text, got[i], (len(feats), acc))


# ---------------------------------------------------------------------------
# r12: BM25 + prefix-filtered Jaccard properties
# ---------------------------------------------------------------------------
_doc_text = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=0, max_size=12,
).map(" ".join)


@SETTINGS
@given(
    docs=st.lists(_doc_text, min_size=1, max_size=20),
    cut1=st.integers(min_value=0, max_value=20),
    cut2=st.integers(min_value=0, max_value=20),
)
def test_bm25_index_merge_equals_at_once_any_split(spark, tmp_path_factory, docs, cut1, cut2):
    """Incremental == corpus-at-once over ARBITRARY batch splits: the
    store's df/stats partials are exact integer sums, so any 3-way split
    of the corpus (including empty batches) must answer BIT-equal to the
    one-shot scan path."""
    from dqx_spark.pipeline import retrieval, text_index as ti

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(1, "alpha beta"), (2, "theta")], "qid int, qtext string")
    lo, hi = sorted((min(cut1, len(rows)), min(cut2, len(rows))))
    path = str(tmp_path_factory.mktemp("bm25prop") / "idx")
    ti.save_text_index(df.limit(0), path, "doc_id", "text", partitions=4)
    for batch in (rows[:lo], rows[lo:hi], rows[hi:]):
        bdf = (
            spark.createDataFrame(batch, "doc_id long, text string")
            if batch
            else df.limit(0)
        )
        ti.append_to_text_index(path, bdf)
    idx = ti.load_text_index(spark, path)
    got = sorted(tuple(r) for r in ti.bm25_topk_index(idx, q, k=5, tie_rounding=6).collect())
    want = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(df, q, "doc_id", "text", k=5, tie_rounding=6).collect()
    )
    assert got == want


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=16,
    ),
    thr=st.sampled_from([0.3, 0.5, 0.75, 0.9]),
)
def test_prefix_jaccard_equals_naive_property(spark, docs, thr):
    """Prefix filtering is an OPTIMIZATION, never a semantics change:
    over arbitrary small-vocab corpora (maximal shingle sharing — the
    adversarial case for candidate pruning) the pair set, counts, sizes
    and jaccard values match the naive inverted-index join exactly."""
    from dqx_spark.pipeline import dedup

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    a = sorted(
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", k=2, threshold=thr, max_shingle_doc_freq=None
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in dedup.prefix_jaccard_pairs(
            df, "doc_id", "text", k=2, threshold=thr, max_shingle_doc_freq=None
        ).collect()
    )
    assert a == b
