"""r13 A/B: bigram_lm_scores old (HEAD, r12 totals-derivation) vs new
(type-table join + explode_outer, WIP) — interleaved in ONE session so box
drift cannot fake a verdict.  The bench body is
bigram_lm_scores(docs).join(nb_classifier_scores(docs), 'id'); NB is
identical in both trees, so the delta isolates the LM change.

Writes scripts/ab_lm_nb_r13_result.json; measurement-only.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_old_corpus():
    """Materialize HEAD's corpus.py under a distinct module name."""
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", "HEAD:dqx_spark/pipeline/corpus.py"], text=True
    )
    path = "/tmp/ab_old_corpus_r13.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("ab_old_corpus_r13", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_lm_nb_r13")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dqx_spark.pipeline import corpus as new_corpus

    old_corpus = _load_old_corpus()
    lay = f"/tmp/dqx_bench_layout/sf{SF_DIR.rstrip('/').rsplit('sf', 1)[-1]}/documents.parquet"
    docs = spark.read.parquet(lay if os.path.exists(lay) else f"{SF_DIR}/documents.parquet")

    def body(mod):
        df = mod.bigram_lm_scores(docs, "doc_id", "text").join(
            mod.nb_classifier_scores(docs, "doc_id", "text", "lang"), "id"
        )
        df.write.format("noop").mode("overwrite").save()

    # warmup both once (codegen compile), then interleave
    body(old_corpus)
    body(new_corpus)
    reps = 7
    old_t, new_t = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); body(old_corpus); old_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); body(new_corpus); new_t.append(time.perf_counter() - t0)
    res = {
        "old_runs": [round(t, 3) for t in old_t],
        "new_runs": [round(t, 3) for t in new_t],
        "old_best": round(min(old_t), 3),
        "new_best": round(min(new_t), 3),
        "old_median": round(sorted(old_t)[reps // 2], 3),
        "new_median": round(sorted(new_t)[reps // 2], 3),
    }
    out = os.path.join(REPO, "scripts", "ab_lm_nb_r13_result.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
