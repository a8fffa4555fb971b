"""IO: input/output configs, batch + Structured Streaming reads/writes.

Semantics derived from the reference ``config.py:35-196`` (dataclasses) and
``io.py:20-288`` (table-vs-path dispatch, streaming writers, one-time
triggers).  Databricks-specific surfaces (Unity Catalog volumes, Auto
Loader, liquid clustering) are out of scope; plain Spark formats (parquet,
delta-if-available, json, csv, table names) are first-class.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: `catalog.schema.table` / `schema.table` style names vs filesystem paths
#: (reference io.py:15-17)
TABLE_NAME_PATTERN = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+){0,2}$")
PATH_PATTERN = re.compile(r"^(/|s3a?://|abfss?://|gs://|file://|hdfs://|dbfs:/)")


@dataclass
class InputConfig:
    """Where/how to read (reference config.py:35-77)."""

    location: str
    format: str = "parquet"
    is_streaming: bool = False
    schema: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    @property
    def is_table(self) -> bool:
        return bool(TABLE_NAME_PATTERN.match(self.location)) and not PATH_PATTERN.match(self.location)


@dataclass
class OutputConfig:
    """Where/how to write (reference config.py:79-134)."""

    location: str
    format: str = "parquet"
    mode: str = "append"
    options: dict[str, str] = field(default_factory=dict)
    trigger: dict[str, Any] | None = None
    partition_by: list[str] = field(default_factory=list)

    @property
    def is_table(self) -> bool:
        return bool(TABLE_NAME_PATTERN.match(self.location)) and not PATH_PATTERN.match(self.location)


@dataclass
class RunConfig:
    """One end-to-end run (reference config.py:136-196)."""

    name: str = "default"
    input_config: InputConfig | None = None
    output_config: OutputConfig | None = None
    quarantine_config: OutputConfig | None = None
    checks_location: str | None = None
    reference_tables: dict[str, InputConfig] = field(default_factory=dict)
    metrics_config: OutputConfig | None = None
    custom_metrics: list[str] = field(default_factory=list)


def read_input_data(spark: SparkSession, input_config: InputConfig) -> DataFrame:
    """Dispatch table-vs-path, batch-vs-streaming (reference io.py:20-85)."""
    if input_config.is_table:
        if input_config.is_streaming:
            return spark.readStream.options(**input_config.options).table(input_config.location)
        return spark.read.options(**input_config.options).table(input_config.location)
    if input_config.is_streaming:
        reader = spark.readStream.options(**input_config.options).format(input_config.format)
        if input_config.schema:
            reader = reader.schema(input_config.schema)
        return reader.load(input_config.location)
    reader = spark.read.options(**input_config.options).format(input_config.format)
    if input_config.schema:
        reader = reader.schema(input_config.schema)
    return reader.load(input_config.location)


def get_reference_dataframes(
    spark: SparkSession, reference_tables: dict[str, InputConfig] | None
) -> dict[str, DataFrame] | None:
    """Named ref tables -> dict of DataFrames (reference io.py:262-288)."""
    if not reference_tables:
        return None
    return {name: read_input_data(spark, cfg) for name, cfg in reference_tables.items()}


def save_dataframe_as_table(df: DataFrame, output_config: OutputConfig) -> StreamingQuery | None:
    """Batch or streaming write (reference io.py:88-148).  Returns the
    StreamingQuery for streams, None for batch."""
    if df.isStreaming:
        writer = df.writeStream.format(output_config.format).options(**output_config.options)
        if output_config.mode:
            writer = writer.outputMode("append" if output_config.mode == "append" else output_config.mode)
        if output_config.trigger:
            writer = writer.trigger(**output_config.trigger)
        if output_config.partition_by:
            writer = writer.partitionBy(*output_config.partition_by)
        if output_config.is_table:
            return writer.toTable(output_config.location)
        # file sink needs a checkpoint location
        if "checkpointLocation" not in output_config.options:
            writer = writer.option("checkpointLocation", output_config.location.rstrip("/") + "/_checkpoint")
        return writer.start(output_config.location)

    writer = df.write.format(output_config.format).mode(output_config.mode).options(**output_config.options)
    if output_config.partition_by:
        writer = writer.partitionBy(*output_config.partition_by)
    if output_config.is_table:
        writer.saveAsTable(output_config.location)
    else:
        writer.save(output_config.location)
    return None


def is_one_time_trigger(trigger: dict[str, Any] | None) -> bool:
    """once/availableNow triggers -> await termination
    (reference io.py:247-259)."""
    if not trigger:
        return False
    return bool(trigger.get("once") or trigger.get("availableNow"))
