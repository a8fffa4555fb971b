"""Managed end-to-end runs: read -> apply checks -> split -> write ->
metrics, for one table, a fan-out over many, or a wildcard pattern fan-out.

Semantics derived from the reference ``engine.py:852-974`` (E2E single run),
``engine.py:1113-1144`` (thread-pool fan-out), ``engine.py:1146-1242`` +
``utils.py:430-616`` (wildcard ``catalog.schema.*`` table patterns) and
``engine.py:946-974`` (metrics persistence).
"""

from __future__ import annotations

import fnmatch
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dqx_spark.engine import DQEngine
from dqx_spark.io import (
    InputConfig,
    OutputConfig,
    RunConfig,
    get_reference_dataframes,
    is_one_time_trigger,
    read_input_data,
    save_dataframe_as_table,
)
from dqx_spark.metrics import DQMetricsObserver, metrics_dataframe, observation_rows
from dqx_spark.serde import deserialize_checks


def apply_checks_and_save_in_table(
    spark: SparkSession,
    run_config: RunConfig,
    checks: list | None = None,
    engine: DQEngine | None = None,
    custom_check_functions: dict[str, Callable] | None = None,
    ref_dfs: dict[str, DataFrame] | None = None,
) -> dict[str, object] | None:
    """One managed run.  Returns the metrics dict (batch) or None
    (streaming started).  Quarantine config splits good/bad; otherwise the
    full annotated frame is written (reference engine.py:852-974)."""
    engine = engine or DQEngine(spark)
    if run_config.input_config is None or run_config.output_config is None:
        raise ValueError("run_config needs input_config and output_config")

    if checks is None:
        if not run_config.checks_location:
            raise ValueError("provide checks inline or via run_config.checks_location")
        # full storage dispatch: file suffix -> YAML/JSON file, 'jdbc:' ->
        # JDBC, otherwise table — not just the file path case
        from dqx_spark.checks_storage import checks_storage_factory

        checks = checks_storage_factory(
            spark, run_config.checks_location, run_config.name
        ).load()
    rules = deserialize_checks(checks, custom_check_functions) if checks and isinstance(checks[0], dict) else checks

    df = read_input_data(spark, run_config.input_config)
    # configured reference tables, overridable/extendable by direct DataFrames
    ref_dfs = {**(get_reference_dataframes(spark, run_config.reference_tables) or {}), **(ref_dfs or {})}
    checked = engine.apply_checks(df, rules, ref_dfs=ref_dfs)

    # thread the engine's (possibly customized) result column names into the
    # metric expressions — the defaults would reference a nonexistent
    # _errors column on engines with ExtraParams.result_column_names
    rcn = engine.result_column_names
    observer = DQMetricsObserver(
        name=f"dqx_{run_config.name}",
        custom_metrics=run_config.custom_metrics,
        errors_col=rcn["errors"],
        warnings_col=rcn["warnings"],
    )
    observation = None
    if run_config.metrics_config and not checked.isStreaming:
        checked, observation = observer.attach(checked)

    # (query, its OWN trigger): awaiting must be decided per query — with a
    # one-shot output trigger but a continuous quarantine trigger, awaiting
    # the quarantine query would hang forever
    queries = []
    if run_config.quarantine_config:
        good, bad = engine.get_valid(checked), engine.get_invalid(checked)
        queries.append((save_dataframe_as_table(good, run_config.output_config), run_config.output_config.trigger))
        queries.append(
            (save_dataframe_as_table(bad, run_config.quarantine_config), run_config.quarantine_config.trigger)
        )
    else:
        queries.append((save_dataframe_as_table(checked, run_config.output_config), run_config.output_config.trigger))

    for q, trig in queries:
        if q is not None and is_one_time_trigger(trig):
            q.awaitTermination()

    metrics = None
    if observation is not None:
        metrics = dict(observation.get)
        rows = observation_rows(
            metrics,
            run_id=observer.run_id,
            run_name=run_config.name,
            input_location=run_config.input_config.location,
            output_location=run_config.output_config.location,
            quarantine_location=run_config.quarantine_config.location if run_config.quarantine_config else None,
            checks_location=run_config.checks_location,
        )
        save_dataframe_as_table(metrics_dataframe(spark, rows), run_config.metrics_config)
    return metrics


def apply_checks_and_save_in_tables(
    spark: SparkSession,
    run_configs: list[RunConfig],
    checks_by_run: dict[str, list] | None = None,
    max_parallelism: int = 4,
    engine: DQEngine | None = None,
) -> dict[str, dict | None]:
    """Fan-out over N run configs on a driver thread pool — one Spark job
    per table, executed concurrently (reference engine.py:1113-1144)."""
    checks_by_run = checks_by_run or {}

    def run_one(rc: RunConfig):
        return rc.name, apply_checks_and_save_in_table(
            spark, rc, checks=checks_by_run.get(rc.name), engine=engine
        )

    with ThreadPoolExecutor(max_workers=max_parallelism) as pool:
        return dict(pool.map(run_one, run_configs))


def _full_table_names(spark: SparkSession, database_glob: str, catalog_listing=None) -> list[str]:
    """Fully-qualified ``db.table`` names for databases matching the glob.
    ``catalog_listing`` ({db: [table, ...]}) can be injected for tests (and
    for metastores where spark.catalog is slow); default uses spark.catalog."""
    if catalog_listing is not None:
        return [
            f"{db}.{t}"
            for db, tables in sorted(catalog_listing.items())
            if fnmatch.fnmatchcase(db, database_glob)
            for t in tables
        ]
    dbs = [d.name for d in spark.catalog.listDatabases() if fnmatch.fnmatchcase(d.name, database_glob)]
    return [
        f"{db}.{t.name}"
        for db in dbs
        for t in spark.catalog.listTables(db)
        if t.tableType != "TEMPORARY"
    ]


def expand_table_patterns(
    spark: SparkSession,
    patterns: list[str],
    exclude_patterns: list[str] | None = None,
    catalog_listing=None,
) -> list[str]:
    """Expand ``db.*`` / ``*.sales_*`` / plain ``db.table`` patterns into the
    catalog's matching table names (reference engine.py:1146-1242,
    utils.py:430-616; the reference's 3-part ``catalog.schema.table`` maps to
    OSS Spark's 2-part ``database.table`` — a leading ``catalog.`` segment is
    accepted and ignored for ``spark_catalog``).

    Catalog listing is scoped by the database part of each pattern (only
    matching databases are enumerated), exclusions run over the expanded
    names, and the result is sorted + de-duplicated."""
    # exclusions get the same catalog-prefix normalization as includes —
    # a 3-part 'spark_catalog.db.tmp_*' must match the 2-part names below
    exclude_patterns = [
        x.split(".", 1)[1] if x.count(".") == 2 and x.split(".")[0] in ("spark_catalog", "*") else x
        for x in (exclude_patterns or [])
    ]
    out: set[str] = set()
    for pattern in patterns:
        parts = pattern.split(".")
        if len(parts) == 3:
            if parts[0] not in ("spark_catalog", "*"):
                raise ValueError(f"unknown catalog in pattern {pattern!r} (OSS Spark has spark_catalog)")
            parts = parts[1:]
        if len(parts) == 1:
            parts = ["*", parts[0]]
        if len(parts) != 2:
            raise ValueError(f"table pattern must be [catalog.]database.table, got {pattern!r}")
        db_glob, tbl_glob = parts
        if "*" not in db_glob and "*" not in tbl_glob and "?" not in db_glob and "?" not in tbl_glob:
            out.add(f"{db_glob}.{tbl_glob}")  # exact name: no listing needed
            continue
        for full in _full_table_names(spark, db_glob, catalog_listing=catalog_listing):
            if fnmatch.fnmatchcase(full.split(".", 1)[1], tbl_glob):
                out.add(full)
    kept = [
        n
        for n in out
        if not any(fnmatch.fnmatchcase(n, x) or fnmatch.fnmatchcase(n.split(".", 1)[1], x) for x in exclude_patterns)
    ]
    return sorted(kept)


def run_configs_for_patterns(
    spark: SparkSession,
    patterns: list[str],
    checks_location: str,
    output_suffix: str = "_dq_output",
    quarantine_suffix: str | None = None,
    exclude_patterns: list[str] | None = None,
    output_mode: str = "overwrite",
    catalog_listing=None,
) -> list[RunConfig]:
    """One RunConfig per matched table: output (and optional quarantine)
    tables take the input name + suffix, checks come from
    ``checks_location`` with ``{table}`` substituted (reference
    engine.py:1196-1242's per-table checks-file convention)."""
    configs = []
    for table in expand_table_patterns(spark, patterns, exclude_patterns, catalog_listing=catalog_listing):
        configs.append(
            RunConfig(
                name=table,
                input_config=InputConfig(location=table),
                output_config=OutputConfig(location=f"{table}{output_suffix}", mode=output_mode),
                quarantine_config=(
                    OutputConfig(location=f"{table}{quarantine_suffix}", mode=output_mode)
                    if quarantine_suffix
                    else None
                ),
                checks_location=checks_location.replace("{table}", table),
            )
        )
    return configs


def apply_checks_and_save_in_tables_for_patterns(
    spark: SparkSession,
    patterns: list[str],
    checks_location: str,
    checks_by_run: dict[str, list] | None = None,
    exclude_patterns: list[str] | None = None,
    output_suffix: str = "_dq_output",
    quarantine_suffix: str | None = None,
    max_parallelism: int = 4,
    engine: DQEngine | None = None,
) -> dict[str, dict | None]:
    """Wildcard fan-out (reference engine.py:1146-1242): expand patterns,
    build per-table run configs, then reuse the thread-pool fan-out."""
    run_configs = run_configs_for_patterns(
        spark,
        patterns,
        checks_location,
        output_suffix=output_suffix,
        quarantine_suffix=quarantine_suffix,
        exclude_patterns=exclude_patterns,
    )
    return apply_checks_and_save_in_tables(
        spark, run_configs, checks_by_run=checks_by_run, max_parallelism=max_parallelism, engine=engine
    )
