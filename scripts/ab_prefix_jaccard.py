"""A/B: prefix-filtered exact Jaccard (AllPairs/PPJoin) vs the naive
inverted-index self-join — WHERE each wins, measured.

Run: PYTHONPATH=. python scripts/ab_prefix_jaccard.py

Two corpora, same knobs (k=5, max_shingle_doc_freq=1000 — the default
skew cap both operators share):

1. **driver documents (sf0.1)** — small duplicate families, no shared
   boilerplate below the cap.  Candidates are tiny either way, so the
   prefix variant's extra stages (doc-freq join, per-doc rank window,
   candidate-then-verify join) are pure overhead: EXPECT naive to win.
2. **boilerplate corpus** — G groups of M docs sharing a group-specific
   boilerplate sentence plus unique content, M chosen UNDER the doc-freq
   cap (the cap can't help) but large enough that the naive join's
   candidate bound Σ C(df,2) explodes: every boilerplate shingle
   contributes C(M,2) candidate pairs × G groups.  The prefix variant
   sorts shingles rare-first per doc, so the (frequent) boilerplate
   shingles fall OUTSIDE the prefix and the quadratic term never forms:
   EXPECT prefix to win, increasingly with M.

The point of committing this: the bench's dedup_prefix_pairs case runs
on corpus 1 and READS SLOWER than dedup_ngram_pairs — that is the
honest small-candidate-regime number, not a regression; this script is
the recorded evidence for the regime where the operator earns its keep.
Both variants are gate-certified to produce identical pairs
(dedup_ngram_jaccard method='prefix'), so this is purely a plan choice.
"""

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from dqx_spark.pipeline import dedup  # noqa: E402


def timed(fn, runs: int = 5) -> float:
    best = float("inf")
    for _ in range(runs):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return round(best, 3)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for thr in (0.5, 0.8):
        out[f"driver_ngram_t{thr}"] = timed(
            lambda: dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 5, thr).count()
        )
        out[f"driver_prefix_t{thr}"] = timed(
            lambda: dedup.prefix_jaccard_pairs(docs, "doc_id", "text", 5, thr).count()
        )

    # boilerplate corpus: G groups x M docs; per-group boilerplate has
    # df=M (UNDER the 1000 cap), unique tail makes every doc distinct and
    # every cross-group pair a non-duplicate.
    G, M = 60, 400
    base = spark.range(G * M).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % G).alias("g"),
        (F.col("id")).alias("u"),
    )
    boiler = F.concat(
        F.lit("all rights reserved group "), F.col("g"),
        F.lit(" terms of service apply contact support for assistance today"),
    )
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}_"), ((F.col("u") * (31 + j)) % 99991).cast("string"))
            for j in range(12)
        ],
    )
    bp = base.select("doc_id", F.concat(boiler, F.lit(" "), uniq).alias("text"))
    bp.write.mode("overwrite").parquet("/tmp/dqx_ab_prefix_corpus")
    bp = spark.read.parquet("/tmp/dqx_ab_prefix_corpus")
    out["boiler_docs"] = bp.count()
    out["boiler_group_df"] = M
    for thr in (0.8,):
        out[f"boiler_ngram_t{thr}"] = timed(
            lambda: dedup.ngram_jaccard_pairs(bp, "doc_id", "text", 5, thr).count(), runs=3
        )
        out[f"boiler_prefix_t{thr}"] = timed(
            lambda: dedup.prefix_jaccard_pairs(bp, "doc_id", "text", 5, thr).count(), runs=3
        )
    out["boiler_speedup_t0.8"] = round(
        out["boiler_ngram_t0.8"] / out["boiler_prefix_t0.8"], 2
    )
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
