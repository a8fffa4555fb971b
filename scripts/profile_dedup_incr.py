"""VERDICT r12 #6: attribute dedup_incr's flat ~1.6 s bench time.

The bench case is `dedup_pairs_against_index(batch, loaded_index, prune='join')
.agg(count)` over a 2% batch against a persisted minhash index (build
amortized outside the timing).  r11's one-execution probe halved it
(2.65 → 1.32 s) and it has been flat since; this script decomposes the
remaining cost into its serial pieces, min-of-5 each on a quiet box:

  a) full probe (the bench body, prune='join');
  b) full probe with a PRE-BUILT batch state (isolates the probe join
     from the batch signature pass);
  c) the batch signature pass alone (batch_state materialized);
  d) the index melt + sigs scans alone (the in-bench index read);
  e) prune='static' variant (driver pb-collect job, for the comparison);
  f) the 3-stage scheduling floor (same shape as bench.py's canary).

Writes scripts/profile_dedup_incr_result.json; measurement-only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dqx_spark.pipeline import dedup_index as _didx

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_dedup_incr")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    lay = f"/tmp/dqx_bench_layout/sf{SF_DIR.rstrip('/').rsplit('sf', 1)[-1]}/documents.parquet"
    docs = spark.read.parquet(lay if os.path.exists(lay) else f"{SF_DIR}/documents.parquet")

    path = "/tmp/dqx_profile_dedup_idx"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    _didx.save_dedup_index(docs.where(F.col("doc_id") % 50 != 0), path, "doc_id", "text",
                           method="minhash", include_pairs=False)
    idx = _didx.load_dedup_index(spark, path)
    batch = docs.where(F.col("doc_id") % 50 == 0)

    def timed(fn, runs=5):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    res = {}
    res["a_full_probe_join"] = timed(lambda: _didx.dedup_pairs_against_index(
        batch, idx, "doc_id", "text", prune="join").agg(F.count(F.lit(1)).alias("n")).collect())
    state = _didx.batch_state(batch, idx, "doc_id", "text")
    res["b_probe_with_prebuilt_state"] = timed(lambda: _didx.dedup_pairs_against_index(
        batch, idx, "doc_id", "text", state=state, prune="join")
        .agg(F.count(F.lit(1)).alias("n")).collect())
    res["c_batch_state_alone"] = timed(
        lambda: _didx.batch_state(batch, idx, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    res["d_index_scan_alone"] = timed(lambda: (
        idx.bands.write.format("noop").mode("overwrite").save(),
        idx.sigs.write.format("noop").mode("overwrite").save(),
    ))
    res["e_full_probe_static"] = timed(lambda: _didx.dedup_pairs_against_index(
        batch, idx, "doc_id", "text", prune="static").agg(F.count(F.lit(1)).alias("n")).collect())

    def _stage_noop():
        tiny = spark.range(1024).select((F.col("id") % 7).alias("k"))
        g = tiny.groupBy("k").count()
        return g.crossJoin(F.broadcast(g.groupBy().sum("count"))).count()

    res["f_stage_canary"] = timed(_stage_noop)
    res["batch_rows"] = batch.count()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile_dedup_incr_result.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
