"""Reproducible A/B for the aggr_grouped 10x slope (VERDICT r10 #4: the
organic 10x slope moved 1.25 -> 2.68 round-over-round on a plan the builder
believes unchanged; the judge asked for a clean-room same-session A/B
against the r9 checkout body, like the js_divergence adjudication).

Both legs run the IDENTICAL bench case — the grouped aggregate dataset
check ``is_aggr_not_greater_than(sum(l_extendedprice) by l_returnflag)``
through ``DQEngine.apply_checks`` + count() — over the SAME pre-written
10x-scaled lineitem parquet (shifted-key unions, the slope-pass input
shape), under the bench Spark conf.  The only difference is which
checkout's ``dqx_spark`` is imported:

  A. HEAD (this repo)
  B. r9   (git worktree of 5e92477, "round 9: verdict/advice/...")

Each leg is a fresh subprocess (no module-cache contamination) that warms
up once and reports best/median of N timed runs; the orchestrator
interleaves legs (A B A B ...) so box drift lands on both equally.

Run:  python scripts/ab_aggr_grouped.py [process_reps] [runs_per_leg]
Prints one JSON line with per-leg timings + medians.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

R9_COMMIT = "5e92477"
R9_WORKTREE = "/tmp/dqx_ab_r9_worktree"
SCALED = "/tmp/dqx_ab_aggr_layout/lineitem_x10.parquet"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALE = 10


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_aggr_grouped")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _ensure_scaled(spark) -> None:
    """bench.py's read_scaled shape: SCALE shifted-key union copies of
    lineitem, re-laid out CPUS-way — written once, shared by both legs."""
    from pyspark.sql import functions as F

    if os.path.exists(SCALED):
        return
    base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    copies = []
    for i in range(SCALE):
        shift = i * 1_000_000_000
        copies.append(
            base.select(
                *[
                    (F.col(c) + F.lit(shift)).alias(c) if c == "l_orderkey" else F.col(c)
                    for c in base.columns
                ]
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(int(CPUS)).write.mode("overwrite").parquet(SCALED)


def leg(repo: str, runs: int) -> None:
    sys.path.insert(0, repo)
    spark = _spark()
    _ensure_scaled(spark)
    from pyspark.sql import functions as F  # noqa: F401

    import dqx_spark.functions as C
    from dqx_spark import DQDatasetRule, DQEngine
    from dqx_spark.engine import ExtraParams

    e = DQEngine(
        extra_params=ExtraParams(
            run_time_overwrite="2024-06-01 00:00:00", run_id_overwrite="bench"
        )
    )
    rule = [
        DQDatasetRule(
            check_func=C.is_aggr_not_greater_than,
            column="l_extendedprice",
            check_func_kwargs={
                "limit": 1e9, "aggr_type": "sum", "group_by": ["l_returnflag"]
            },
        )
    ]
    li = spark.read.parquet(SCALED)
    e.apply_checks(li, rule).count()  # warmup: JIT + page cache + plan cache
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        e.apply_checks(li, rule).count()
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"repo": repo, "times": ts}))


def main() -> None:
    process_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(R9_WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R9_WORKTREE, R9_COMMIT],
            cwd=here, check=True,
        )
    legs = {"head": here, "r9": R9_WORKTREE}
    out: dict[str, list[float]] = {k: [] for k in legs}
    for _ in range(process_reps):
        for name, repo in legs.items():
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", repo, str(runs)],
                capture_output=True, text=True, env=env, cwd=repo,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            out[name].extend(json.loads(line)["times"])
    print(json.dumps({
        "case": "aggr_grouped_10x",
        "commit_r9": R9_COMMIT,
        "runs": out,
        "medians": {k: round(statistics.median(v), 3) for k, v in out.items()},
        "best": {k: min(v) for k, v in out.items()},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        leg(sys.argv[2], int(sys.argv[3]))
    else:
        main()
