"""Structured Streaming integration.

The engine's plans are streaming-safe for row checks (pure projections) but
dataset checks (windows without time bounds, distinct, joins back onto the
stream) hit Spark's unsupported-operation matrix.  The reference scopes
dataset checks to each micro-batch (SURVEY.md §1.3, check_funcs.py:1835) —
the same strategy here, via ``foreachBatch``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dqx_spark.engine import DQEngine
from dqx_spark.rule import DQRule


def apply_checks_streaming(
    engine: DQEngine,
    stream_df: DataFrame,
    checks: list[DQRule],
    batch_sink: Callable[[DataFrame, int], None],
    ref_dfs: dict[str, DataFrame] | None = None,
    trigger: dict | None = None,
    query_name: str | None = None,
    checkpoint_location: str | None = None,
) -> StreamingQuery:
    """Apply ALL checks (incl. dataset-level) per micro-batch via
    foreachBatch: uniqueness/gaps/aggregates are validated within each batch
    exactly as the reference scopes them.  ``batch_sink(checked_df,
    batch_id)`` receives the annotated batch."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        checked = engine.apply_checks(batch_df, checks, ref_dfs=ref_dfs)
        batch_sink(checked, batch_id)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if trigger:
        writer = writer.trigger(**trigger)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()


def split_and_write_streaming(
    engine: DQEngine,
    stream_df: DataFrame,
    checks: list[DQRule],
    good_sink: Callable[[DataFrame, int], None],
    bad_sink: Callable[[DataFrame, int], None],
    ref_dfs: dict[str, DataFrame] | None = None,
    trigger: dict | None = None,
    checkpoint_location: str | None = None,
) -> StreamingQuery:
    """Quarantine flow for streams: per micro-batch, split good/bad and hand
    each to its sink (reference engine.py:921-941 adapted to foreachBatch)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        checked = engine.apply_checks(batch_df, checks, ref_dfs=ref_dfs)
        good_sink(engine.get_valid(checked), batch_id)
        bad_sink(engine.get_invalid(checked), batch_id)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()
