"""Reproducible A/B for the pq_topk drift watch (VERDICT r11 #1: the
bench's auto-generated ``pq_topk_drift_watch`` note claimed a "same-day A/B
recorded separately" that did not exist — this file IS that artifact, and
the note now asserts this file's presence instead of promising it).

Both legs run the IDENTICAL bench case — PQ codebooks trained + corpus
encoded OUTSIDE the timing (index build amortized, exactly as bench.py
does), then N timed runs of ``pq_topk(encoded, books, q, k=10,
rerank_r=50)`` + count() — over the SAME sf0.1 embeddings parquet under
the bench Spark conf.  The only difference is which checkout's
``dqx_spark`` is imported:

  A. HEAD (this repo)
  B. r9   (git worktree of 5e92477 — the vintage whose driver recording
           0.442 s anchors the 0.53 s watch threshold)

Each leg is a fresh subprocess (no module-cache contamination) that warms
up once and reports all timed runs; the orchestrator interleaves legs
(A B A B ...) so box drift lands on both equally.

Run:  python scripts/ab_pq_topk.py [process_reps] [runs_per_leg]
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
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_pq_topk")
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


def leg(repo: str, runs: int) -> None:
    sys.path.insert(0, repo)
    spark = _spark()
    from dqx_spark.pipeline import similarity as _sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # index build (train + encode) OUTSIDE the timing — bench.py parity
    books = _sim.pq_train_codebooks(
        emb, "embedding", dim=64, num_subvectors=16, sample_order_by="vec_id"
    )
    encoded = _sim.pq_encode(emb, books, "embedding", "vec_id").localCheckpoint()
    case = lambda: _sim.pq_topk(encoded, books, [0.1] * 64, k=10, rerank_r=50).count()
    case()  # warmup: JIT + page cache + plan cache
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        case()
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
        "case": "pq_topk",
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
