"""VERDICT r12 #4: commit RUNTIME evidence for the lm_nb_scores AQE
stage-reuse claim.

The r12 change derived the bigram-prefix and NB label totals from the
bounded TYPE tables so the corpus-sized instance subtree appears
canonically identical under every consumer; the claim was that AQE/exchange
reuse then executes it ONCE at runtime — which a static `explain` cannot
show (the static plan even has MORE Exchange nodes).  This script runs the
exact bench body and records what actually executed:

* the POST-RUN adaptive plan (`isFinalPlan=true`) with its ReusedExchange
  count — the runtime dedup, node by node;
* the driver status store's job/stage/task counts and per-stage executor
  run time for the labeled run — the executed-stage evidence;
* the number of EXECUTED parquet-scan stages vs the 12 planned scans.

Writes plans/r13/lm_nb_scores_runtime.txt.  Measurement-only: no library
code is touched.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dqx_spark.pipeline import corpus as _corpus

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13", "lm_nb_scores_runtime.txt")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("lm_nb_runtime_evidence")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same re-layout discipline as bench.py so the scan shape matches
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lay = f"/tmp/dqx_bench_layout/sf{SF_DIR.rstrip('/').rsplit('sf', 1)[-1]}/documents.parquet"
    if os.path.exists(lay):
        docs = spark.read.parquet(lay)

    df = _corpus.bigram_lm_scores(docs, "doc_id", "text").join(
        _corpus.nb_classifier_scores(docs, "doc_id", "text", "lang"), "id"
    )
    sc = spark.sparkContext
    sc.setJobGroup("lmnb", "lm_nb_scores runtime evidence")
    # execute through the DataFrame's OWN QueryExecution (a write would plan
    # a separate execution and leave df's adaptive plan isFinalPlan=false) —
    # after this, explain() prints the executed final plan with the runtime
    # ReusedExchange / AQEShuffleRead decisions
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
        if not (grp.isDefined() and grp.get() == "lmnb"):
            continue
        sids = [j.stageIds().apply(k) for k in range(j.stageIds().size())]
        stage_ids.update(sids)
        lines.append(f"job {j.jobId()}: stages {sorted(sids)}")
    per_stage = []
    scan_stages = 0
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
        nm = att.name()
        if "parquet" in nm or "FileScan" in nm:
            scan_stages += 1
        per_stage.append(
            f"stage {sid}: tasks={att.numCompleteTasks()} runtime_ms={att.executorRunTime()} name={nm[:90]}"
        )

    reused = len(re.findall(r"ReusedExchange", final_plan))
    planned_scans = len(re.findall(r"^\(\d+\) Scan parquet", final_plan, re.M))
    hdr = [
        "lm_nb_scores runtime evidence (post-execution adaptive plan + status store)",
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
