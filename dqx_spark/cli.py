"""Command-line interface: profile, validate-checks, apply, e2e.

Parity with the reference CLI surface (cli.py:84-307 — ``profile``,
``apply_checks``, ``validate_checks``, ``e2e``), minus the Databricks
workspace/installer coupling.

    python -m dqx_spark.cli profile --input /data/t.parquet --output checks.yaml
    python -m dqx_spark.cli validate-checks --checks checks.yaml
    python -m dqx_spark.cli apply --input /data/t.parquet --checks checks.yaml \
        --output /out/good --quarantine /out/bad
    python -m dqx_spark.cli e2e --input /data/t.parquet --output /out/good
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(f"dqx_spark_{app}")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def cmd_profile(args) -> int:
    from dqx_spark.io import InputConfig, read_input_data
    from dqx_spark.profiler import DQProfiler, generate_rules, resolve_in_list_values
    from dqx_spark.serde import save_checks_to_file

    spark = _spark("profile")
    df = read_input_data(spark, InputConfig(location=args.input, format=args.format))
    profiler = DQProfiler({"sample_fraction": args.sample_fraction, "limit": args.limit})
    _, profiles = profiler.profile(df, columns=args.columns)
    resolve_in_list_values(df, profiles)
    rules = generate_rules(profiles)
    save_checks_to_file(rules, args.output)
    print(f"wrote {len(rules)} generated checks to {args.output}")
    return 0


def cmd_validate(args) -> int:
    from dqx_spark.serde import load_checks_from_file, validate_checks

    checks = load_checks_from_file(args.checks)
    status = validate_checks(checks)
    if status.has_errors:
        print(f"INVALID: {status}")
        return 1
    print(f"OK: {len(checks)} checks valid")
    return 0


def cmd_apply(args) -> int:
    from dqx_spark.engine import DQEngine
    from dqx_spark.io import InputConfig, OutputConfig, RunConfig
    from dqx_spark.workflow import apply_checks_and_save_in_table

    spark = _spark("apply")
    rc = RunConfig(
        name=args.run_name,
        input_config=InputConfig(location=args.input, format=args.format),
        output_config=OutputConfig(location=args.output, mode=args.mode),
        quarantine_config=OutputConfig(location=args.quarantine, mode=args.mode) if args.quarantine else None,
        metrics_config=OutputConfig(location=args.metrics, mode="append") if args.metrics else None,
        checks_location=args.checks,
    )
    metrics = apply_checks_and_save_in_table(spark, rc, engine=DQEngine(spark))
    if metrics:
        print(json.dumps({k: str(v) for k, v in metrics.items()}))
    return 0


def cmd_e2e(args) -> int:
    """profile -> generate -> apply in one run (reference e2e_workflow.py:10-69)."""
    from dqx_spark.engine import DQEngine
    from dqx_spark.io import InputConfig, OutputConfig, RunConfig, read_input_data
    from dqx_spark.profiler import DQProfiler, generate_rules, resolve_in_list_values
    from dqx_spark.workflow import apply_checks_and_save_in_table

    spark = _spark("e2e")
    df = read_input_data(spark, InputConfig(location=args.input, format=args.format))
    profiler = DQProfiler({"sample_fraction": args.sample_fraction, "limit": args.limit})
    _, profiles = profiler.profile(df)
    resolve_in_list_values(df, profiles)
    rules = generate_rules(profiles)
    print(f"generated {len(rules)} checks")
    rc = RunConfig(
        name=args.run_name,
        input_config=InputConfig(location=args.input, format=args.format),
        output_config=OutputConfig(location=args.output, mode=args.mode),
        quarantine_config=OutputConfig(location=args.quarantine, mode=args.mode) if args.quarantine else None,
        metrics_config=OutputConfig(location=args.metrics, mode="append") if args.metrics else None,
    )
    metrics = apply_checks_and_save_in_table(spark, rc, checks=rules, engine=DQEngine(spark))
    if metrics:
        print(json.dumps({k: str(v) for k, v in metrics.items()}))
    return 0


def cmd_clean(args) -> int:
    """Corpus cleaning pipeline: boilerplate strip -> quality filters ->
    language filter -> exact dedup -> split, written with bounded file
    sizes."""
    from dqx_spark.io import write_sized
    from dqx_spark.pipeline.corpus import clean_corpus

    from pyspark.sql import Observation, functions as F

    if args.eval_input is None and (
        args.fuzzy_contamination_threshold is not None or args.contamination_threshold is not None
    ):
        print("error: --contamination-threshold / --fuzzy-contamination-threshold require --eval-input",
              file=sys.stderr)
        return 2
    spark = _spark("clean")
    # observations at the source and output plan nodes both populate during
    # the single write action — no extra input re-scan or output read-back
    in_obs, out_obs = Observation("clean_in"), Observation("clean_out")
    df = spark.read.format(args.format).load(args.input).observe(in_obs, F.count(F.lit(1)).alias("n"))
    eval_df = spark.read.format(args.format).load(args.eval_input) if args.eval_input else None
    out = clean_corpus(
        df,
        args.id_col,
        args.text_col,
        languages=args.languages or None,
        min_words=args.min_words,
        boilerplate_max_line_doc_freq=args.boilerplate_doc_freq,
        near_dedup=args.near_dedup,
        eval_df=eval_df,
        contamination_threshold=0.1 if args.contamination_threshold is None else args.contamination_threshold,
        fuzzy_contamination_threshold=args.fuzzy_contamination_threshold,
        splits=None,
    ).observe(out_obs, F.count(F.lit(1)).alias("n"))
    write_sized(out, args.output, file_format=args.format, max_records_per_file=args.records_per_file)
    print(json.dumps({"input_rows": in_obs.get["n"], "kept_rows": out_obs.get["n"]}))
    return 0


def cmd_run(args) -> int:
    """Managed multi-table fan-out driven entirely by a run-config file —
    the reference's installed-workflow pattern (e2e_workflow.py) without
    the workspace coupling."""
    from dqx_spark.io import load_run_configs
    from dqx_spark.workflow import apply_checks_and_save_in_tables

    spark = _spark("run")
    rcs = load_run_configs(args.run_configs)
    if args.names:
        wanted = set(args.names)
        missing = wanted - {rc.name for rc in rcs}
        if missing:
            print(f"error: run configs not in {args.run_configs}: {sorted(missing)}", file=sys.stderr)
            return 2
        rcs = [rc for rc in rcs if rc.name in wanted]
    results = apply_checks_and_save_in_tables(spark, rcs, max_parallelism=args.max_parallelism)
    print(json.dumps({name: (m if isinstance(m, dict) else None) for name, m in results.items()}))
    return 0


def cmd_compact(args) -> int:
    """Small-files remedy: report the current physical layout, rewrite the
    dataset with bounded file sizes (optionally range-sorted on keys so
    parquet min/max stats prune downstream scans), report the new layout."""
    from pyspark.sql import functions as F

    from dqx_spark.io import parquet_layout, sort_for_locality, write_sized

    spark = _spark("compact")

    def stats(p):
        r = parquet_layout(spark, p).agg(
            F.count(F.lit(1)).alias("files"),
            F.sum("size_bytes").alias("bytes"),
            F.sum("num_rows").alias("rows"),
            F.sum((F.col("error").isNotNull()).cast("int")).alias("errors"),
        ).collect()[0]
        return {"files": r["files"], "bytes": r["bytes"], "rows": r["rows"], "errors": r["errors"]}

    before = stats(args.input)
    df = spark.read.parquet(args.input)
    if args.sort_by:
        df = sort_for_locality(df, args.sort_by)
    write_sized(df, args.output, max_records_per_file=args.records_per_file, mode="overwrite")
    after = stats(args.output)
    print(json.dumps({"before": before, "after": after}))
    return 0 if before["rows"] == after["rows"] else 1


def cmd_index_compact(args) -> int:
    """Maintenance pass for the persisted index families: rewrite an ANN
    (IVF/IVFADC) or dedup index grown by per-batch appends into a fresh
    versioned path with bounded file runs per partition, sidecar copied
    verbatim (results unchanged by construction — see the library
    functions' tests).  Always a NEW path: deploy by pointer flip.

    ``--store`` (r12) treats ``--input`` as a versioned STORE root
    (``init_dedup_store`` / ``init_ann_store`` / ``init_lsh_store``):
    compact the current version into the next and flip the pointer —
    no ``--output`` needed, and the ``index-maintenance`` exit codes
    gate it cleanly in a cron:

        dqx-spark index-maintenance --kind dedup --input ROOT \\
          || dqx-spark index-compact --store --kind dedup --input ROOT"""
    spark = _spark("index_compact")
    if args.store:
        if args.output:
            print("--store compacts in place (versioned pointer flip); drop --output",
                  file=sys.stderr)
            return 2
        if args.kind == "dedup":
            from dqx_spark.pipeline.dedup_index import compact_dedup_store

            dst = compact_dedup_store(spark, args.input,
                                      max_records_per_file=args.records_per_file)
        elif args.kind == "text":
            from dqx_spark.pipeline.text_index import compact_text_store

            dst = compact_text_store(spark, args.input,
                                     max_records_per_file=args.records_per_file)
        else:
            from dqx_spark.pipeline.similarity import compact_ann_store

            dst = compact_ann_store(spark, args.input,
                                    max_records_per_file=args.records_per_file)
        print(json.dumps({"kind": args.kind, "store": args.input, "new_version": dst}))
        return 0
    if not args.output:
        print("--output is required without --store", file=sys.stderr)
        return 2
    mode = "overwrite" if args.overwrite else "errorifexists"
    if args.kind == "ann":
        from dqx_spark.pipeline.similarity import compact_ann_index

        compact_ann_index(spark, args.input, args.output,
                          max_records_per_file=args.records_per_file, mode=mode)
    elif args.kind == "lsh":
        from dqx_spark.pipeline.similarity import compact_lsh_index

        compact_lsh_index(spark, args.input, args.output,
                          max_records_per_file=args.records_per_file, mode=mode)
    elif args.kind == "text":
        from dqx_spark.pipeline.text_index import compact_text_index

        compact_text_index(spark, args.input, args.output,
                           max_records_per_file=args.records_per_file, mode=mode)
    else:
        from dqx_spark.pipeline.dedup_index import compact_dedup_index

        compact_dedup_index(spark, args.input, args.output,
                            max_records_per_file=args.records_per_file, mode=mode)
    # integrity report: row parity between src and dst (for lsh, the vecs
    # table - the melt may legitimately SHRINK: compaction dedups the
    # harmless duplicate rows crash-recovery re-runs leave).  The src side
    # counts through the loaders so tombstoned rows - which compaction
    # correctly DROPS - don't read as a parity failure.
    if args.kind == "ann":
        from dqx_spark.pipeline.similarity import load_ann_index

        n_src = load_ann_index(spark, args.input)[0].count()
        n_dst = load_ann_index(spark, args.output)[0].count()
    elif args.kind == "lsh":
        from dqx_spark.pipeline.similarity import load_lsh_index

        n_src = load_lsh_index(spark, args.input).vecs.count()
        n_dst = load_lsh_index(spark, args.output).vecs.count()
    elif args.kind == "text":
        from dqx_spark.pipeline.text_index import load_text_index

        n_src = load_text_index(spark, args.input).postings.count()
        n_dst = load_text_index(spark, args.output).postings.count()
    else:
        from dqx_spark.pipeline.dedup_index import load_dedup_index

        n_src = load_dedup_index(spark, args.input).all_ids().count()
        n_dst = load_dedup_index(spark, args.output).all_ids().count()
    print(json.dumps({"kind": args.kind, "src": args.input, "dst": args.output,
                      "rows_src": n_src, "rows_dst": n_dst}))
    return 0 if n_src == n_dst else 1


def cmd_index_maintenance(args) -> int:
    """Health-check a persisted index and print the maintenance verdict
    (r12, VERDICT r11 #5): stats via ``ann_index_stats`` /
    ``index_stats``, policy via ``recommend_index_maintenance``.  Exit
    code 0 = ok, 2 = compact recommended, 3 = retrain recommended —
    scriptable as a nightly cron gate in front of ``index-compact``."""
    spark = _spark("index_maintenance")
    if args.kind in ("ann", "lsh"):
        from dqx_spark.pipeline.similarity import ann_index_stats

        stats = ann_index_stats(spark, args.input)
    elif args.kind == "text":
        # accept a plain index path or a versioned store root (resolved
        # structurally, like the streaming sinks do)
        from dqx_spark.pipeline import text_index as _ti

        path = args.input
        from dqx_spark.pipeline._fsutil import hadoop_path_exists

        if not hadoop_path_exists(spark, path.rstrip("/") + "/" + _ti._META_SUBDIR):
            path = _ti.current_text_store_version(spark, path)
        stats = _ti.text_index_stats(_ti.load_text_index(spark, path))
    else:
        from dqx_spark.pipeline.dedup_index import index_stats, load_dedup_index

        stats = index_stats(load_dedup_index(spark, args.input))
    from dqx_spark.pipeline.similarity import recommend_index_maintenance

    verdict = recommend_index_maintenance(
        stats,
        max_files_per_partition=args.max_files_per_partition,
        max_tombstone_ratio=args.max_tombstone_ratio,
        max_bucket_skew=args.max_bucket_skew,
    )
    print(json.dumps({"kind": args.kind, "path": args.input,
                      "stats": stats, **verdict}))
    return {"ok": 0, "compact": 2, "retrain": 3}[verdict["action"]]


def cmd_store_gc(args) -> int:
    """Delete superseded versions of a versioned index store (r12) —
    the retention pass the pointer-flip stores defer to the operator.
    Keeps the current version plus ``--keep - 1`` rollback targets;
    never touches versions newer than the pointer.  Run AFTER in-flight
    readers of old versions drained (the documented race)."""
    spark = _spark("store_gc")
    if args.kind in ("ann", "lsh"):
        from dqx_spark.pipeline.similarity import gc_ann_store as _gc
    elif args.kind == "text":
        from dqx_spark.pipeline.text_index import gc_text_store as _gc
    else:
        from dqx_spark.pipeline.dedup_index import gc_dedup_store as _gc
    deleted = _gc(spark, args.input, keep=args.keep)
    print(json.dumps({"kind": args.kind, "store": args.input,
                      "deleted": deleted, "kept": args.keep}))
    return 0


def cmd_sketch_build(args) -> int:
    """Build (or --append) one mergeable sketch over a parquet input —
    the per-batch cron step of incremental corpus statistics: each batch
    appends its register/counter rows, sketch-report re-merges at read.
    Knobs are frozen into the sidecar; appends with different knobs are
    rejected by save_sketch."""
    from dqx_spark.pipeline import corpus as CO
    from dqx_spark.pipeline import sketches as SK

    spark = _spark("sketch_build")
    df = spark.read.parquet(args.input)
    mode = "append" if args.append else "overwrite"
    if args.kind == "hll":
        sk = SK.hll_sketch(df, args.cols, p=args.p, hash_name=args.hash_name)
        knobs = {"cols": list(args.cols), "p": args.p, "hash_name": args.hash_name}
    elif args.kind == "cms":
        sk = SK.cms_sketch(df, args.cols, depth=args.depth, width=args.width,
                           hash_name=args.hash_name)
        knobs = {"cols": list(args.cols), "depth": args.depth, "width": args.width,
                 "hash_name": args.hash_name}
    elif args.kind == "kmv":
        sk = SK.kmv_sketch(df, args.cols, k=args.k, hash_name=args.hash_name)
        knobs = {"cols": list(args.cols), "k": args.k, "hash_name": args.hash_name}
    elif args.kind == "sample":
        if not args.id_col:
            print("error: sample needs --id-col (the uniqueness contract)", file=sys.stderr)
            return 2
        sk = SK.sample_sketch(df, args.id_col, args.cols, k=args.k,
                              salt=args.salt, hash_name=args.hash_name)
        knobs = {"id_col": args.id_col, "cols": list(args.cols), "k": args.k,
                 "salt": args.salt, "hash_name": args.hash_name}
    elif args.kind == "moments":
        sk = SK.moments_sketch(df, args.cols[0])
        knobs = {"col": args.cols[0]}
    elif args.kind == "hist":
        if args.lo is None or args.hi is None:
            print("error: hist needs --lo and --hi (frozen edges)", file=sys.stderr)
            return 2
        sk = SK.histogram_sketch(df, args.cols[0], args.lo, args.hi, bins=args.bins)
        knobs = {"col": args.cols[0], "lo": args.lo, "hi": args.hi, "bins": args.bins}
    else:  # tokens
        sk = CO.token_count_state(df, args.cols[0], lowercase=not args.no_lowercase)
        knobs = {"col": args.cols[0], "lowercase": not args.no_lowercase}
    SK.save_sketch(sk, args.output, args.kind, knobs, mode=mode)
    print(json.dumps({"kind": args.kind, "output": args.output, "mode": mode, **knobs}))
    return 0


def cmd_sketch_report(args) -> int:
    """Read a sketch layout, re-merge any appended batches, and print the
    estimate it exists for: hll → distinct estimate; cms → per---probe
    counts; moments → merged summary stats; hist → --quantiles; tokens →
    token/vocab totals (pairs of token layouts compare via
    token_distribution_divergence_from_states in code)."""
    from dqx_spark.pipeline import corpus as CO
    from dqx_spark.pipeline import sketches as SK
    from pyspark.sql import functions as F

    spark = _spark("sketch_report")
    df, meta = SK.load_sketch(spark, args.input)
    kind = meta["kind"]
    out = {"kind": kind, **{k: v for k, v in meta.items() if k != "kind"}}
    if kind == "hll":
        out["distinct_estimate"] = round(SK.hll_estimate(SK.hll_merge(df), meta["p"]), 1)
    elif kind == "cms":
        if not args.probe:
            print("error: cms report needs --probe VALUE [VALUE...]", file=sys.stderr)
            return 2
        items = spark.createDataFrame([(v,) for v in args.probe], "item string")
        merged = SK.cms_merge(df)
        probed = SK.cms_probe(merged, items, "item", depth=meta["depth"],
                              width=meta["width"], hash_name=meta["hash_name"])
        out["counts"] = {r["item"]: int(r["est_count"]) for r in probed.collect()}
    elif kind == "kmv":
        merged = SK.kmv_merge(df, k=meta["k"])
        out["distinct_estimate"] = round(SK.kmv_estimate(merged, meta["k"]), 1)
    elif kind == "sample":
        merged = SK.sample_merge(df, k=meta["k"])
        qs = args.quantiles or [0.5]
        out["quantiles"] = {
            str(q): SK.sample_quantile(merged, meta["cols"][0], float(q)) for q in qs
        }
    elif kind == "moments":
        row = SK.moments_merge(df).collect()[0]
        out.update({k: row[k] for k in ("n", "mn", "mx", "mean", "var_pop", "stddev_pop")})
    elif kind == "hist":
        qs = args.quantiles or [0.5]
        merged = SK.histogram_merge(df)
        vals = SK.histogram_quantile(merged, meta["lo"], meta["hi"], meta["bins"], qs)
        out["quantiles"] = dict(zip([str(q) for q in qs], [round(v, 6) for v in vals]))
    else:  # tokens
        row = CO.merge_token_counts(df).agg(
            F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
        ).collect()[0]
        out.update({"total_tokens": int(row["t"]), "vocab": int(row["v"])})
    print(json.dumps(out))
    return 0


def cmd_llm_generate(args) -> int:
    """Generate checks with an injected LLM provider, resolved from a
    'module:attribute' import path (no bundled runtime — see dqx_spark.llm)."""
    import importlib

    from dqx_spark.io import InputConfig, read_input_data
    from dqx_spark.llm import generate_rules_with_llm
    from dqx_spark.serde import save_checks_to_file

    mod_name, sep, attr = args.provider.partition(":")
    if not sep:
        raise SystemExit(f"--provider must be 'module:attribute', got {args.provider!r}")
    provider = getattr(importlib.import_module(mod_name), attr)

    spark = _spark("llm_generate")
    df = read_input_data(spark, InputConfig(location=args.input, format=args.format))
    checks = generate_rules_with_llm(df, provider, columns=args.columns, max_attempts=args.max_attempts)
    save_checks_to_file(checks, args.output)
    print(f"wrote {len(checks)} LLM-generated checks to {args.output}")
    return 0


def cmd_train_anomaly(args) -> int:
    from dqx_spark import anomaly
    from dqx_spark.io import InputConfig, read_input_data

    spark = _spark("train_anomaly")
    df = read_input_data(spark, InputConfig(location=args.input, format=args.format))
    model = anomaly.fit_isolation_forest(
        df,
        args.columns,
        num_trees=args.trees,
        sample_size=args.sample_size,
        max_samples=args.max_samples,
        contamination=args.contamination,
        seed=args.seed,
    )
    model_id = anomaly.save_model(spark, model, args.registry)
    print(
        json.dumps(
            {
                "model_id": model_id,
                "registry": args.registry,
                "columns": args.columns,
                "train_rows": model["train_rows"],
                "score_threshold": round(model["score_threshold"], 6),
            }
        )
    )
    return 0


def cmd_score_anomaly(args) -> int:
    from dqx_spark import anomaly
    from dqx_spark.io import InputConfig, read_input_data

    spark = _spark("score_anomaly")
    df = read_input_data(spark, InputConfig(location=args.input, format=args.format))
    model = anomaly.load_model(spark, args.registry, model_id=args.model_id)
    scored = anomaly.score_with_model(df, model)
    scored.write.mode(args.mode).parquet(args.output)
    drift = anomaly.feature_drift(df, model)
    print(json.dumps({"model_id": model["model_id"], "rows": scored.count(), "drift_psi": drift}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="dqx_spark", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("profile", help="infer checks from data")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--output", required=True, help="checks YAML/JSON path")
    p.add_argument("--columns", nargs="*", default=None)
    p.add_argument("--sample-fraction", type=float, default=0.3)
    p.add_argument("--limit", type=int, default=1000)
    p.set_defaults(func=cmd_profile)

    p = sub.add_parser("validate-checks", help="validate a checks file")
    p.add_argument("--checks", required=True)
    p.set_defaults(func=cmd_validate)

    p = sub.add_parser("apply", help="apply checks and write output/quarantine")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--checks", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--quarantine", default=None)
    p.add_argument("--metrics", default=None)
    p.add_argument("--mode", default="overwrite")
    p.add_argument("--run-name", default="cli")
    p.set_defaults(func=cmd_apply)

    p = sub.add_parser("e2e", help="profile -> generate -> apply")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--quarantine", default=None)
    p.add_argument("--metrics", default=None)
    p.add_argument("--mode", default="overwrite")
    p.add_argument("--run-name", default="cli_e2e")
    p.add_argument("--sample-fraction", type=float, default=0.3)
    p.add_argument("--limit", type=int, default=1000)
    p.set_defaults(func=cmd_e2e)

    p = sub.add_parser("llm-generate", help="generate checks via an injected LLM provider")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--provider", required=True, help="import path 'module:attribute' of a Callable[[str], str]")
    p.add_argument("--output", required=True, help="checks YAML/JSON path")
    p.add_argument("--columns", nargs="*", default=None)
    p.add_argument("--max-attempts", type=int, default=3)
    p.set_defaults(func=cmd_llm_generate)

    p = sub.add_parser("train_anomaly", help="fit an isolation forest and register it")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--columns", nargs="+", required=True)
    p.add_argument("--registry", required=True, help="parquet path or table name")
    p.add_argument("--trees", type=int, default=64)
    p.add_argument("--sample-size", type=int, default=256)
    p.add_argument("--max-samples", type=int, default=65536)
    p.add_argument("--contamination", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(func=cmd_train_anomaly)

    p = sub.add_parser("score_anomaly", help="score data with a registered model")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--registry", required=True)
    p.add_argument("--model-id", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="overwrite")
    p.set_defaults(func=cmd_score_anomaly)

    p = sub.add_parser("clean", help="corpus cleaning pipeline (filter/dedup/split)")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--languages", nargs="*", default=None)
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--boilerplate-doc-freq", type=int, default=None)
    p.add_argument("--near-dedup", action="store_true")
    p.add_argument("--eval-input", default=None,
                   help="eval/benchmark table to decontaminate against (same format as --input)")
    p.add_argument("--contamination-threshold", type=float, default=None,
                   help="exact n-gram contamination threshold (default 0.1; requires --eval-input)")
    p.add_argument("--fuzzy-contamination-threshold", type=float, default=None,
                   help="also drop whole-document near-copies of eval docs (MinHash-LSH Jaccard)")
    p.add_argument("--records-per-file", type=int, default=1_000_000)
    p.set_defaults(func=cmd_clean)

    p = sub.add_parser("compact", help="rewrite a parquet dataset with bounded file sizes")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--records-per-file", type=int, default=1_000_000)
    p.add_argument("--sort-by", nargs="*", default=None,
                   help="range-sort on these keys so file-level min/max stats prune scans")
    p.set_defaults(func=cmd_compact)

    p = sub.add_parser(
        "index-compact",
        help="rewrite a persisted ANN, dedup, or text index into a fresh versioned path "
             "with bounded file runs per partition (deploy by pointer flip)",
    )
    p.add_argument("--kind", required=True, choices=["ann", "lsh", "dedup", "text"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None,
                   help="destination path (omit with --store)")
    p.add_argument("--records-per-file", type=int, default=1_000_000)
    p.add_argument("--overwrite", action="store_true",
                   help="allow re-running a failed compaction onto the same output")
    p.add_argument("--store", action="store_true",
                   help="treat --input as a versioned store root: compact the "
                        "current version into the next and flip the pointer")
    p.set_defaults(func=cmd_index_compact)

    p = sub.add_parser(
        "index-maintenance",
        help="health-check a persisted ANN, dedup, or text index and print the "
             "maintenance verdict (ok/compact/retrain); exit 0/2/3 so a "
             "nightly cron can gate index-compact on it",
    )
    p.add_argument("--kind", required=True, choices=["ann", "lsh", "dedup", "text"])
    p.add_argument("--input", required=True)
    p.add_argument("--max-files-per-partition", type=float, default=16.0)
    p.add_argument("--max-tombstone-ratio", type=float, default=0.2)
    p.add_argument("--max-bucket-skew", type=float, default=8.0)
    p.set_defaults(func=cmd_index_maintenance)

    p = sub.add_parser(
        "store-gc",
        help="delete superseded versions of a versioned index store "
             "(keeps the current version plus --keep - 1 rollback targets)",
    )
    p.add_argument("--kind", required=True, choices=["ann", "lsh", "dedup", "text"])
    p.add_argument("--input", required=True, help="store root")
    p.add_argument("--keep", type=int, default=2)
    p.set_defaults(func=cmd_store_gc)

    p = sub.add_parser(
        "sketch-build",
        help="build or --append one mergeable sketch (hll/cms/kmv/sample/moments/hist/tokens) "
             "over a parquet input - the per-batch step of incremental corpus stats",
    )
    p.add_argument("--kind", required=True, choices=["hll", "cms", "kmv", "sample", "moments", "hist", "tokens"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="sketch layout path (data/ + _sketch_meta)")
    p.add_argument("--cols", nargs="+", required=True,
                   help="key columns (hll/cms may take several; moments/hist/tokens take one)")
    p.add_argument("--append", action="store_true",
                   help="accumulate this batch's rows (knob mismatch vs the sidecar is rejected)")
    p.add_argument("--p", type=int, default=12)
    p.add_argument("--k", type=int, default=1024, help="kmv/sample bottom-k size")
    p.add_argument("--id-col", default=None, help="sample: unique row id column")
    p.add_argument("--salt", default="", help="sample: draw selector")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--hash-name", default="xxhash64", choices=["xxhash64", "md5"])
    p.add_argument("--lo", type=float, default=None)
    p.add_argument("--hi", type=float, default=None)
    p.add_argument("--bins", type=int, default=128)
    p.add_argument("--no-lowercase", action="store_true")
    p.set_defaults(func=cmd_sketch_build)

    p = sub.add_parser(
        "sketch-report",
        help="re-merge a sketch layout's accumulated batches and print its estimate "
             "(hll: distinct; cms: --probe counts; moments: stats; hist: --quantiles; "
             "tokens: totals)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--probe", nargs="*", default=None,
                   help="cms: string form of the values to count")
    p.add_argument("--quantiles", nargs="*", type=float, default=None)
    p.set_defaults(func=cmd_sketch_report)

    p = sub.add_parser("run", help="managed multi-table runs from a run-config YAML/JSON file")
    p.add_argument("--run-configs", required=True, help="file written by save_run_configs (or by hand)")
    p.add_argument("--names", nargs="*", default=None, help="subset of run-config names to execute")
    p.add_argument("--max-parallelism", type=int, default=4)
    p.set_defaults(func=cmd_run)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
