"""r12 equivalence + timing A/B for the dsir_weights rewrite.

OLD body (r11): feature melt -> broadcast join against the ratio ROWS ->
per-doc groupBy (collect_list + sorted fold) -> corpus-sized join-back on
the id.  NEW body (r12): one scan-local projection — ratio ARRAY literal
indexed by bucket, per-doc sorted fold inline.

Checks, over the bench documents table at $SPARK_GRAFT_SF_DIR (both the
xxhash64 hot path and the md5 gate path):
  1. bit-exact equality of (dsir_n_features, dsir_logw) per doc_id —
     compared as raw doubles via struct-packed collect, no rounding;
  2. interleaved min-of-3 timing of the two bodies (agg-sink, noop-style).

Usage: python scripts/ab_dsir_weights.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqx_spark.pipeline import mixing as mx

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def dsir_weights_r11(
    df: DataFrame, id_col: str, text_col: str, log_ratios: dict[int, float],
    buckets: int = 1024, *, bigrams: bool = True, lowercase: bool = True,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """Verbatim r11 body (pre-rewrite), kept here as the A side."""
    spark = df.sparkSession
    ratio_df = spark.createDataFrame(
        [(int(b), float(v)) for b, v in log_ratios.items()], "b long, lr double"
    )
    melt = df.select(
        F.col(id_col).alias("__did"),
        F.explode_outer(
            mx.dsir_feature_hashes(
                text_col, buckets, bigrams=bigrams, lowercase=lowercase, hash_name=hash_name
            )
        ).alias("b"),
    )
    per_doc = (
        melt.join(F.broadcast(ratio_df), "b", "left")
        .groupBy("__did")
        .agg(
            F.count("lr").alias("dsir_n_features"),
            F.coalesce(
                F.aggregate(
                    F.array_sort(F.collect_list("lr")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                F.lit(0.0),
            ).alias("dsir_logw"),
        )
    )
    return df.join(
        per_doc.withColumnRenamed("__did", id_col), id_col, "left"
    ).fillna({"dsir_n_features": 0, "dsir_logw": 0.0})


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_dsir_weights")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        # bench-identical scan splits: the driver testdata is ONE row group,
        # which would run the r12 scan-local body on a single task (and hand
        # the r11 body free parallelism from its shuffles) — re-lay out
        # CPUS-way like bench.py so both bodies see the multi-split input
        # every real deployment has
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = "/tmp/ab_dsir_docs.parquet"
    if not os.path.exists(layout):
        (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .repartition(int(CPUS)).write.mode("overwrite").parquet(layout))
    docs = spark.read.parquet(layout).select("doc_id", "text")
    B = 1024

    result: dict = {"sf_dir": SF_DIR, "buckets": B}
    for hash_name in ("xxhash64", "md5"):
        tc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(
            docs.where(F.col("doc_id") % 3 == 0), "text", B, hash_name=hash_name).collect()}
        rc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(
            docs, "text", B, hash_name=hash_name).collect()}
        lr = mx.dsir_log_ratios(tc, rc, B)

        old = dsir_weights_r11(docs, "doc_id", "text", lr, B, hash_name=hash_name)
        new = mx.dsir_weights(docs, "doc_id", "text", lr, B, hash_name=hash_name)
        grab = lambda d: {  # noqa: E731
            r["doc_id"]: (r["dsir_n_features"], r["dsir_logw"])
            for r in d.select("doc_id", "dsir_n_features", "dsir_logw").collect()
        }
        a, b = grab(old), grab(new)
        assert set(a) == set(b), f"[{hash_name}] id sets differ: {len(a)} vs {len(b)}"
        diff = [i for i in a if a[i] != b[i]]  # tuple ==: exact ints, exact doubles
        assert not diff, f"[{hash_name}] {len(diff)} differing docs, first: " + str(
            [(i, a[i], b[i]) for i in diff[:3]]
        )
        result[f"equal_{hash_name}"] = f"bit-exact on {len(a)} docs"

    # interleaved timing, xxhash64 hot path, agg sink (forces every value)
    tc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(
        docs.where(F.col("doc_id") % 3 == 0), "text", B).collect()}
    rc = {r["b"]: r["c"] for r in mx.dsir_bucket_counts(docs, "text", B).collect()}
    lr = mx.dsir_log_ratios(tc, rc, B)
    sink = lambda d: d.agg(  # noqa: E731
        F.sum("dsir_logw").alias("s"), F.sum("dsir_n_features").alias("n")
    ).collect()
    times: dict[str, list[float]] = {"r11": [], "r12": []}
    for _ in range(3):
        for tag, body in (("r11", dsir_weights_r11), ("r12", mx.dsir_weights)):
            t0 = time.perf_counter()
            sink(body(docs, "doc_id", "text", lr, B))
            times[tag].append(round(time.perf_counter() - t0, 3))
    result["times_interleaved"] = times
    result["min_r11_s"] = min(times["r11"])
    result["min_r12_s"] = min(times["r12"])
    print(json.dumps(result, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ab_dsir_weights_result.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
