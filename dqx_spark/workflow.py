"""Managed end-to-end runs: read -> apply checks -> split -> write ->
metrics, for one table or a fan-out over many.

Semantics derived from the reference ``engine.py:852-974`` (E2E single run),
``engine.py:1113-1144`` (thread-pool fan-out) and ``engine.py:946-974``
(metrics persistence).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import SparkSession

from dqx_spark.engine import DQEngine
from dqx_spark.io import (
    RunConfig,
    get_reference_dataframes,
    is_one_time_trigger,
    read_input_data,
    save_dataframe_as_table,
)
from dqx_spark.metrics import DQMetricsObserver, metrics_dataframe, observation_rows
from dqx_spark.serde import deserialize_checks, load_checks_from_file


def apply_checks_and_save_in_table(
    spark: SparkSession,
    run_config: RunConfig,
    checks: list | None = None,
    engine: DQEngine | None = None,
    custom_check_functions: dict[str, Callable] | None = None,
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
        checks = load_checks_from_file(run_config.checks_location)
    rules = deserialize_checks(checks, custom_check_functions) if checks and isinstance(checks[0], dict) else checks

    df = read_input_data(spark, run_config.input_config)
    ref_dfs = get_reference_dataframes(spark, run_config.reference_tables)
    checked = engine.apply_checks(df, rules, ref_dfs=ref_dfs)

    observer = DQMetricsObserver(name=f"dqx_{run_config.name}", custom_metrics=run_config.custom_metrics)
    observation = None
    if run_config.metrics_config and not checked.isStreaming:
        checked, observation = observer.attach(checked)

    queries = []
    if run_config.quarantine_config:
        good, bad = engine.get_valid(checked), engine.get_invalid(checked)
        queries.append(save_dataframe_as_table(good, run_config.output_config))
        queries.append(save_dataframe_as_table(bad, run_config.quarantine_config))
    else:
        queries.append(save_dataframe_as_table(checked, run_config.output_config))

    trigger = run_config.output_config.trigger
    for q in queries:
        if q is not None and is_one_time_trigger(trigger):
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
