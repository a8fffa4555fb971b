"""Reproducible A/B for the clean_corpus round-over-round drift (VERDICT
r11 #2: judge quiet HEAD measured 2.81 s vs r10's recorded 1.94 s — a +45 %
move against a +23 % scan-canary shift, i.e. more than box.  corpus.py was
refactored in r11 (token-state family) and clean_corpus composes its paths,
so the suspect is code, not box — adjudicate with the same interleaved
checkout discipline as ab_aggr_grouped / ab_js_divergence).

Both legs run the IDENTICAL bench case — the composed
boilerplate-strip → Gopher filters → lang filter → exact dedup → split
pipeline ``clean_corpus(docs, ...).select("doc_id","split")`` + count() —
over the SAME sf0.1 documents parquet under the bench Spark conf.  The
only difference is which checkout's ``dqx_spark`` is imported:

  A. HEAD (this repo)
  B. r10  (git worktree of b619314, "round 10: verdict/advice/..." — the
           pre-refactor corpus.py body)

Each leg is a fresh subprocess (no module-cache contamination) that warms
up once and reports all timed runs; the orchestrator interleaves legs
(A B A B ...) so box drift lands on both equally.

Run:  python scripts/ab_clean_corpus.py [process_reps] [runs_per_leg]
Prints one JSON line with per-leg timings + medians.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

R10_COMMIT = "b619314"
R10_WORKTREE = "/tmp/dqx_ab_r10_worktree"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_clean_corpus")
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
    from dqx_spark.pipeline import corpus as _corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    case = lambda: _corpus.clean_corpus(
        docs, "doc_id", "text",
        languages=["en", "de", "fr", "es"], min_words=10,
        max_symbol_to_word_ratio=0.5, min_alpha_word_fraction=0.3,
        boilerplate_max_line_doc_freq=3,
    ).select("doc_id", "split").count()
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
    if not os.path.exists(R10_WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R10_WORKTREE, R10_COMMIT],
            cwd=here, check=True,
        )
    legs = {"head": here, "r10": R10_WORKTREE}
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
        "case": "clean_corpus",
        "commit_r10": R10_COMMIT,
        "runs": out,
        "medians": {k: round(statistics.median(v), 3) for k, v in out.items()},
        "best": {k: min(v) for k, v in out.items()},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        leg(sys.argv[2], int(sys.argv[3]))
    else:
        main()
