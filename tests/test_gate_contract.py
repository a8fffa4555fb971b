"""Locks the driver-gate contract of __spark_entry__: the registry is
exactly the driver's 50-query correctness window, every oracle key has a
query, and the rows-only set stays the explicit, justified list.  A
future reorder or addition that silently pushes a query out of the
checked window fails here first, not in the round's CORRECTNESS file."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry

EXPECTED_ROWS_ONLY: set[str] = set(
    # EMPTY since r7: the last two rows-only members gained oracles —
    # ann_topk/anomaly_train_score pair an independent SQL re-derivation of
    # their deterministic parts (exact top-k, robust-z) with a driver-local
    # pure-numpy/pure-Python replay of the approximate parts embedded as
    # literals (distributed == local parity; twin-vs-Spark pinned in
    # tests/test_pipeline.py::test_ann_local_twin_matches_spark).
    # (dedup_minhash_lsh / dedup_simhash left this list in r4 via the
    # portable md5-60bit hash; multimodal_features left it via integer byte
    # projections of the pinned sha256-stub encoder.)
)


def test_window_is_exactly_50():
    # 50 through r11; the r12 build round grew the dict to 52 (crawl_day,
    # bm25_topk), silently pushing time_rollup/anomaly_train_score out of
    # the driver's 50-query verified window (VERDICT r12 #1).  r13 folds
    # the two r12 additions back as certified legs (bm25_topk → ann_topk,
    # crawl_day → dedup_minhash_lsh) so the registry is EXACTLY the
    # window again — any future addition must consolidate, not append.
    assert len(entry.queries()) == 50
    assert "time_rollup" in entry.queries()
    assert "anomaly_train_score" in entry.queries()


def test_every_query_has_oracle_or_is_whitelisted_rows_only():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs), "stale oracle keys would confuse the driver"
    assert set(qs) - set(oracles) == EXPECTED_ROWS_ONLY


def test_oracle_sql_strings_are_nonempty():
    for k, v in entry.oracle_sql().items():
        assert isinstance(v, str) and v.strip().upper().startswith(("SELECT", "WITH")), k


def test_batch_queries_lead_the_window():
    # the driver checks keys in order; keep the high-density batches first
    first = list(entry.queries())[:11]
    assert first == [
        "row_checks_documents",
        "row_checks_events",
        "row_checks_customer",
        "geo_row_checks",
        "row_checks_lineitem",
        "row_checks_orders",
        "dataset_checks_lineitem",
        "dataset_checks_orders",
        "dataset_checks_part",
        "compare_datasets_missing",
        "are_polygons_mutually_disjoint",
    ]


def test_bench_emit_line_is_parseable_and_bounded(tmp_path, capsys):
    """r6 regression guard for the r5 evidence defect (BENCH_r05 parsed:
    null): the printed bench line must stay a single self-contained JSON
    object under the tail-capture budget no matter how large the notes or
    slope sections grow — oversized optional sections are dropped, the
    queries dict never is, and the full record lands in the details file."""
    import json

    import bench

    queries = {f"query_{i:02d}": round(0.1 * i, 3) for i in range(20)}
    result = {
        "metric": "headline_total", "value": 12.3, "unit": "sec",
        "queries": queries, "sf": 0.1,
        "slope_scale": 10,
        "slope": {f"q{i}": {"t_1x": 0.5, "t_10x": 1.0, "slope": 2.0,
                            "t_forced_1x": 1.0, "t_forced_10x": 3.0, "slope_forced": 3.0}
                  for i in range(8)},
        "notes": {"huge": "x" * 5000},  # must never reach stdout
        "sf1": {"scale": 10, "organic": True, "lineitem_rows": 6000000,
                "documents_rows": 50000,
                "queries": {f"q{i}": 0.3 for i in range(8)},
                "pipeline_queries": {f"p{i}": 0.4 for i in range(5)},
                "pipeline_slope": {f"p{i}": 1.1 for i in range(5)},
                "total": 2.4},
    }
    details = tmp_path / "details.json"
    bench.emit(result, details_path=str(details))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1600
    parsed = json.loads(line)
    assert parsed["queries"] == queries          # never trimmed
    assert "notes" not in parsed                  # notes live only in details
    full = json.loads(details.read_text())
    assert full["notes"]["huge"].startswith("x") and full["slope"]["q0"]["slope_forced"] == 3.0
