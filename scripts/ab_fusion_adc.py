"""Interleaved in-process A/B for the r12 fused stats pass (engine-level
aggregate-rule fusion): the bench's all_dataset_checks composite (26 rules)
applied FUSED (HEAD behavior) vs UNFUSED (the pre-r12 per-rule path, forced
by stripping the ``_dq_fusion`` markers from a twin rule list — the
closures then take exactly the single-rule code path, which is the
unchanged pre-fusion body).

Runs both legs alternately in ONE session (same JVM, same page cache, same
box state), 5 reps each, and prints one JSON line with the runs + medians.
Commit the output to ``scripts/ab_fusion_adc_result.json``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

import dqx_spark.functions as C
from dqx_spark import DQDatasetRule, DQEngine
from dqx_spark.engine import ExtraParams

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _adc_rules():
    """The bench's all_dataset_checks rule list, verbatim (bench.py)."""
    return [
        DQDatasetRule(check_func=C.is_unique, columns=["l_orderkey", "l_linenumber"]),
        DQDatasetRule(check_func=C.is_unique, columns=["l_comment"]),
        DQDatasetRule(check_func=C.is_unique, columns=["l_partkey", "l_suppkey", "l_orderkey"],
                      check_func_kwargs={"nulls_distinct": False}),
        DQDatasetRule(check_func=C.is_unique, columns=["l_orderkey"], criticality="warn"),
        DQDatasetRule(check_func=C.foreign_key, columns=["l_orderkey"],
                      check_func_kwargs={"ref_columns": ["o_orderkey"], "ref_df_name": "orders"}),
        DQDatasetRule(check_func=C.foreign_key, columns=["l_partkey"],
                      check_func_kwargs={"ref_columns": ["p_partkey"], "ref_df_name": "part",
                                         "negate": True}, criticality="warn"),
        DQDatasetRule(check_func=C.sql_query, check_func_kwargs={
            "query": "SELECT l_orderkey, max(l_quantity) > 49 AS condition FROM {{ input }} GROUP BY l_orderkey",
            "merge_columns": ["l_orderkey"], "condition_column": "condition"}),
        DQDatasetRule(check_func=C.sql_query, check_func_kwargs={
            "query": "SELECT l_returnflag, count(*) < 3 AS condition FROM {{ input }} GROUP BY l_returnflag",
            "merge_columns": ["l_returnflag"], "condition_column": "condition"}),
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_linenumber",
                      check_func_kwargs={"limit": 4.0, "aggr_type": "avg", "abs_tolerance": 10.0}),
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_quantity",
                      check_func_kwargs={"limit": 26.0, "aggr_type": "avg", "rel_tolerance": 0.5,
                                         "group_by": ["l_returnflag"]}),
        DQDatasetRule(check_func=C.is_aggr_equal, column="l_orderkey",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "count_distinct",
                                         "abs_tolerance": 1e9}),
        DQDatasetRule(check_func=C.is_aggr_not_equal, column="l_extendedprice",
                      check_func_kwargs={"limit": -1.0, "aggr_type": "min"}),
        DQDatasetRule(check_func=C.is_aggr_not_equal, column="l_tax",
                      check_func_kwargs={"limit": -1.0, "aggr_type": "max",
                                         "group_by": ["l_linestatus"]}),
        DQDatasetRule(check_func=C.is_aggr_not_equal, column="l_discount",
                      check_func_kwargs={"limit": 99.0, "aggr_type": "stddev"}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 1e12, "aggr_type": "avg"}),
        DQDatasetRule(check_func=C.is_aggr_not_greater_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 1e9, "aggr_type": "sum",
                                         "group_by": ["l_returnflag"]}),
        DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_quantity",
                      check_func_kwargs={"limit": 0.0, "aggr_type": "min"}),
        DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_orderkey",
                      check_func_kwargs={"limit": 1.0, "aggr_type": "count",
                                         "group_by": ["l_linestatus"]}),
        DQDatasetRule(check_func=C.is_aggr_not_less_than, column="l_extendedprice",
                      check_func_kwargs={"limit": 0.0, "aggr_type": "median"}),
        DQDatasetRule(check_func=C.aggr_matches_dataset, column="l_orderkey",
                      check_func_kwargs={"ref_column": "o_orderkey", "aggr_type": "count_distinct",
                                         "ref_df_name": "orders", "abs_tolerance": 1e9}),
        DQDatasetRule(check_func=C.compare_datasets,
                      check_func_kwargs={"columns": ["l_orderkey", "l_linenumber"],
                                         "ref_columns": ["l_orderkey", "l_linenumber"],
                                         "ref_df_name": "li_ref"}),
        DQDatasetRule(check_func=C.has_no_outliers, column="l_extendedprice",
                      check_func_kwargs={"approx": True}),
        DQDatasetRule(check_func=C.has_no_aggr_outliers, column="l_quantity",
                      check_func_kwargs={"time_column": "l_shipdate", "aggr_type": "avg",
                                         "time_interval": "month", "sigma": 6.0}),
        DQDatasetRule(check_func=C.is_data_fresh_per_time_window,
                      column="l_shipdate",
                      check_func_kwargs={"window_minutes": 60 * 24 * 30,
                                         "min_records_per_window": 1}),
        DQDatasetRule(check_func=C.has_no_gaps_per_time_window,
                      column="l_shipdate",
                      check_func_kwargs={"window_minutes": 60 * 24 * 365}),
        DQDatasetRule(check_func=C.has_valid_schema,
                      check_func_kwargs={"expected_schema": "l_orderkey bigint, l_quantity double"}),
    ]


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_fusion_adc")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet("/tmp/dqx_bench_layout/sf0.1/lineitem.parquet")
    orders = spark.read.parquet("/tmp/dqx_bench_layout/sf0.1/orders.parquet")
    part = spark.read.parquet("/tmp/dqx_bench_layout/sf0.1/part.parquet")
    refs = {
        "orders": orders,
        "part": part,
        "li_ref": li.dropDuplicates(["l_orderkey", "l_linenumber"]).where(
            F.col("l_orderkey") % 50 != 0
        ),
    }
    li.select("l_orderkey").count()  # warm

    ep = ExtraParams(run_time_overwrite="2024-06-01 00:00:00", run_id_overwrite="ab")
    fused_rules = _adc_rules()
    unfused_rules = _adc_rules()
    for r in unfused_rules:
        try:
            _c, closure = r.invoke_cached()
        except Exception:
            continue
        if hasattr(closure, "_dq_fusion"):
            del closure._dq_fusion
    e_fused = DQEngine(extra_params=ep)
    e_unfused = DQEngine(extra_params=ep)

    def run(engine, rules) -> float:
        t0 = time.perf_counter()
        engine.apply_checks(li, rules, ref_dfs=refs).count()
        return round(time.perf_counter() - t0, 3)

    runs = {"fused": [], "unfused": []}
    # warmup rep (codegen/JIT), discarded
    run(e_fused, fused_rules)
    run(e_unfused, unfused_rules)
    for _ in range(5):
        runs["fused"].append(run(e_fused, fused_rules))
        runs["unfused"].append(run(e_unfused, unfused_rules))
    result = {
        "case": "all_dataset_checks fused stats pass (r12)",
        "legs": "HEAD fused vs same-code _dq_fusion-stripped (= pre-r12 per-rule path)",
        "runs": runs,
        "medians": {k: statistics.median(v) for k, v in runs.items()},
        "best": {k: min(v) for k, v in runs.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
