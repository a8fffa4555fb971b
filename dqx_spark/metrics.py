"""Summary metrics via Spark ``Observation`` (batch) and a
``StreamingQueryListener`` (streaming).

Semantics derived from the reference ``metrics_observer.py`` (default SQL
metrics, long-format observation table) and ``metrics_listener.py``
(per-micro-batch metric rows).  Metrics attach with ``df.observe`` — zero
extra passes over the data; values materialize with the caller's action.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from dqx_spark.schema import ERRORS_COLUMN, WARNINGS_COLUMN, observation_table_schema


def default_metrics(errors_col: str = ERRORS_COLUMN, warnings_col: str = WARNINGS_COLUMN) -> list[str]:
    """SQL-expression metrics (reference metrics_observer.py:97-107)."""
    return [
        "count(1) AS input_row_count",
        f"count(CASE WHEN {errors_col} IS NOT NULL THEN 1 END) AS error_row_count",
        f"count(CASE WHEN {warnings_col} IS NOT NULL THEN 1 END) AS warning_row_count",
        f"count(CASE WHEN {errors_col} IS NULL AND {warnings_col} IS NULL THEN 1 END) AS valid_row_count",
    ]


def per_check_metrics(check_names: list[str], errors_col: str = ERRORS_COLUMN, warnings_col: str = WARNINGS_COLUMN) -> list[str]:
    """Per-check fail counts via exists() over the result arrays
    (reference metrics_observer.py:109-147)."""
    out = []
    for name in check_names:
        # string literal: escape backslashes BEFORE doubling quotes (a raw
        # backslash would otherwise swallow the char after it — or the
        # closing quote); alias: backticks double inside backticks
        safe = name.replace("\\", "\\\\").replace("'", "''")
        alias = name.replace("`", "``")
        out.append(
            f"count(CASE WHEN exists({errors_col}, x -> x.name = '{safe}') "
            f"OR exists({warnings_col}, x -> x.name = '{safe}') THEN 1 END) AS `check_{alias}_count`"
        )
    return out


@dataclass
class DQMetricsObserver:
    """Attachable metrics definition (reference metrics_observer.py:12-56)."""

    name: str = "dqx"
    custom_metrics: list[str] = field(default_factory=list)
    run_id: str = field(default_factory=lambda: str(uuid.uuid4()))
    #: result column names — must match the engine's
    #: ExtraParams.result_column_names when those are customized
    errors_col: str = ERRORS_COLUMN
    warnings_col: str = WARNINGS_COLUMN

    @property
    def metrics(self) -> list[str]:
        return default_metrics(self.errors_col, self.warnings_col) + list(self.custom_metrics)

    def attach(self, df: DataFrame) -> tuple[DataFrame, Observation | None]:
        """Batch: attach an Observation; metrics are available after the
        caller's first action.  Streaming: use ``df.observe(name, ...)`` and
        a StreamingMetricsListener instead (reference engine.py:621-658)."""
        exprs = [F.expr(m) for m in self.metrics]
        if df.isStreaming:
            return df.observe(self.name, *exprs), None
        obs = Observation(self.name)
        return df.observe(obs, *exprs), obs


def observation_rows(
    metrics: dict[str, object],
    run_id: str,
    run_name: str = "default",
    input_location: str | None = None,
    output_location: str | None = None,
    quarantine_location: str | None = None,
    checks_location: str | None = None,
    error_column_name: str = ERRORS_COLUMN,
    warning_column_name: str = WARNINGS_COLUMN,
    user_metadata: dict[str, str] | None = None,
    run_time: datetime | None = None,
) -> list[dict]:
    """Long-format rows matching ``observation_table_schema``
    (reference metrics_observer.py:58-107)."""
    # keep the tz-aware instant: createDataFrame interprets NAIVE datetimes
    # in the driver's LOCAL timezone, so stripping tzinfo would shift
    # run_time by the UTC offset on non-UTC drivers
    ts = run_time or datetime.now(timezone.utc)
    return [
        {
            "run_id": run_id,
            "run_name": run_name,
            "input_location": input_location,
            "output_location": output_location,
            "quarantine_location": quarantine_location,
            "checks_location": checks_location,
            "metric_name": k,
            "metric_value": None if v is None else str(v),
            "run_time": ts,
            "error_column_name": error_column_name,
            "warning_column_name": warning_column_name,
            "user_metadata": user_metadata,
        }
        for k, v in metrics.items()
    ]


def metrics_dataframe(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, observation_table_schema)


def compute_summary_metrics_lazy(checked_df: DataFrame, observer: DQMetricsObserver) -> DataFrame:
    """Plan-only metrics frame: one aggregate over the checked df, unpivoted
    to long format WITHOUT forcing an action (reference engine.py:1586-1683).
    Use when the caller cannot run an action (e.g. declarative pipelines)."""
    agg = checked_df.selectExpr(*observer.metrics)
    names = [f.name for f in agg.schema.fields]
    # backtick-quote the column reference: a metric aliased with a dot
    # ("p.50") would otherwise parse as a nested-field reference
    def _q(n: str):
        return F.col("`" + n.replace("`", "``") + "`")

    pairs = F.array(
        *[F.struct(F.lit(n).alias("metric_name"), _q(n).cast("string").alias("metric_value")) for n in names]
    )
    return (
        agg.select(F.explode(pairs).alias("m"))
        .select(F.col("m.metric_name"), F.col("m.metric_value"))
    )


class StreamingMetricsListener(StreamingQueryListener):
    """Collects observed metrics from every micro-batch of a named query
    (reference metrics_listener.py:13-120).  ``sink`` is called with the
    metrics dict per progress event."""

    def __init__(self, observer_name: str, sink, query_name: str | None = None):
        self.observer_name = observer_name
        self.sink = sink
        self.query_name = query_name

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        if self.query_name and event.progress.name != self.query_name:
            return
        observed = event.progress.observedMetrics
        if self.observer_name in observed:
            row = observed[self.observer_name]
            self.sink(row.asDict())

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass
