"""r13: RUNTIME attribution for dedup_prefix_pairs (the heaviest single
bench case by executor work — ~34 s task time for ~2.2 s wall at sf0.1).

The static plan can't answer the load-bearing question: the filtered
postings subtree (sh ⋈ freq) has THREE consumers (the rank window, and
both sides of the candidate-verify join) and the prefix/window chain is
referenced by BOTH sides of the candidate self-join — how many of those
replays does AQE exchange/stage reuse actually serve at runtime?  This
script runs the exact bench body through the DataFrame's own
QueryExecution and records the post-run adaptive plan (ReusedExchange
nodes) plus the status store's per-stage executor run time, the same
methodology as scripts/runtime_lm_nb.py (VERDICT r12 #4).

Writes plans/r13/dedup_prefix_pairs_runtime.txt.  Measurement-only.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from dqx_spark.pipeline import dedup as _dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13", "dedup_prefix_pairs_runtime.txt")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prefix_pairs_runtime_evidence")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # mirror bench.py exactly: a 1g-default driver heap inflates the
        # localCheckpoint block-store stage with GC time (measured 113 s vs
        # ~40 s at 16g), which would misattribute the case's cost
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lay = f"/tmp/dqx_bench_layout/sf{SF_DIR.rstrip('/').rsplit('sf', 1)[-1]}/documents.parquet"
    if os.path.exists(lay):
        docs = spark.read.parquet(lay)

    df = _dedup.prefix_jaccard_pairs(docs, "doc_id", "text", 5, 0.5)
    sc = spark.sparkContext
    sc.setJobGroup("ppj", "dedup_prefix_pairs runtime evidence")
    n = len(df.collect())
    sc.setJobGroup(None, None)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    final_plan = f"collected rows: {n}\n" + buf.getvalue()

    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    lines = []
    stage_ids: set[int] = set()
    for ji in range(jobs.size()):
        j = jobs.apply(ji)
        grp = j.jobGroup()
        if not (grp.isDefined() and grp.get() == "ppj"):
            continue
        sids = [j.stageIds().apply(k) for k in range(j.stageIds().size())]
        stage_ids.update(sids)
        lines.append(f"job {j.jobId()}: stages {sorted(sids)}")
    per_stage = []
    total_ms = 0
    executed = 0
    for sid in sorted(stage_ids):
        try:
            att = store.lastStageAttempt(sid)
        except Exception:  # noqa: BLE001 — submitted-but-skipped stage (reused output)
            per_stage.append(f"stage {sid}: SKIPPED (reused shuffle output)")
            continue
        executed += 1
        total_ms += att.executorRunTime()
        per_stage.append(
            f"stage {sid}: tasks={att.numCompleteTasks()} runtime_ms={att.executorRunTime()} "
            f"name={att.name()[:110]}"
        )

    reused = len(re.findall(r"ReusedExchange", final_plan))
    planned_scans = len(re.findall(r"^\(\d+\) Scan parquet", final_plan, re.M))
    hdr = [
        "dedup_prefix_pairs runtime evidence (post-execution adaptive plan + status store)",
        f"SF_DIR={SF_DIR} CPUS={CPUS}",
        f"jobs in group: {len(lines)}",
        f"stages submitted: {len(stage_ids)}, executed: {executed}, "
        f"skipped(reused): {len(stage_ids) - executed}",
        f"total executor run time: {total_ms} ms",
        f"final plan: ReusedExchange nodes = {reused}, planned parquet scans = {planned_scans}",
        "",
        *lines,
        "",
        *per_stage,
        "",
        "=== post-run adaptive plan (isFinalPlan should be true) ===",
        final_plan,
    ]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(hdr))
    print(f"wrote {OUT}")
    print("\n".join(hdr[:8]))


if __name__ == "__main__":
    main()
