"""IO: input/output configs, batch + Structured Streaming reads/writes.

Semantics derived from the reference ``config.py:35-196`` (dataclasses) and
``io.py:20-288`` (table-vs-path dispatch, streaming writers, one-time
triggers).  Databricks-specific surfaces (Unity Catalog volumes, Auto
Loader, liquid clustering) are out of scope; plain Spark formats (parquet,
delta-if-available, json, csv, table names) are first-class.
"""

from __future__ import annotations
from dqx_spark.errors import InvalidParameterError

import os
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def _translate_cloud_files(fmt: str, options: dict[str, str]) -> tuple[str, dict[str, str]]:
    """Map Databricks Auto Loader configs onto the OSS streaming file source
    (reference io.py:48-69 requires format='cloudFiles' for streams).

    ``cloudFiles.format`` becomes the real source format;
    ``cloudFiles.maxFilesPerTrigger`` / ``maxBytesPerTrigger`` map to the
    OSS rate-limit options; ``cloudFiles.schemaLocation`` and the other
    notification/inference knobs are Databricks-runtime services with no
    OSS twin and are dropped (pass an explicit ``schema`` instead —
    required by the OSS file source anyway)."""
    if fmt != "cloudFiles":
        return fmt, options
    real_fmt = options.get("cloudFiles.format", "parquet")
    passthrough = {k: v for k, v in options.items() if not k.startswith("cloudFiles.")}
    for src, dst in (
        ("cloudFiles.maxFilesPerTrigger", "maxFilesPerTrigger"),
        ("cloudFiles.maxBytesPerTrigger", "maxBytesPerTrigger"),
    ):
        if src in options:
            passthrough[dst] = options[src]
    return real_fmt, passthrough


def read_input_data(spark: SparkSession, input_config: InputConfig) -> DataFrame:
    """Dispatch table-vs-path, batch-vs-streaming (reference io.py:20-85).
    Streaming paths accept ``format='cloudFiles'`` (Auto Loader configs are
    translated onto the OSS file source, see ``_translate_cloud_files``)."""
    if input_config.is_table:
        if input_config.is_streaming:
            return spark.readStream.options(**input_config.options).table(input_config.location)
        return spark.read.options(**input_config.options).table(input_config.location)
    fmt, options = _translate_cloud_files(input_config.format, input_config.options)
    if input_config.is_streaming:
        reader = spark.readStream.options(**options).format(fmt)
        if input_config.schema:
            reader = reader.schema(input_config.schema)
        return reader.load(input_config.location)
    reader = spark.read.options(**options).format(fmt)
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
            # batch modes don't exist in streaming: 'overwrite' (the batch
            # default) would throw at query start; everything else
            # (append/complete/update) passes through for Spark to validate
            stream_mode = "append" if output_config.mode == "overwrite" else output_config.mode
            writer = writer.outputMode(stream_mode)
        if output_config.trigger:
            writer = writer.trigger(**output_config.trigger)
        if output_config.partition_by:
            writer = writer.partitionBy(*output_config.partition_by)
        if output_config.is_table:
            if "checkpointLocation" not in output_config.options and not df.sparkSession.conf.get(
                "spark.sql.streaming.checkpointLocation", None
            ):
                # unlike the path sink below there is no location to derive a
                # default from — fail NOW with guidance instead of an opaque
                # AnalysisException at query start
                raise ValueError(
                    f"streaming write to table {output_config.location!r} needs options."
                    "checkpointLocation (or spark.sql.streaming.checkpointLocation)"
                )
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


# ---------------------------------------------------------------------------
# scale-oriented output layout helpers
# ---------------------------------------------------------------------------
def sort_for_skipping(df: DataFrame, columns: list[str], num_partitions: int | None = None) -> DataFrame:
    """Lay rows out for min/max data skipping on ``columns``: range-partition
    by the columns, then sort within each partition.  Files written from this
    layout carry tight per-file min/max statistics on the sort keys, so
    later scans with predicates on them prune whole files (the poor man's
    Z-order for a single key prefix; at 100 TB this is the difference
    between a full scan and touching a few files).

    One range-exchange (sampled boundaries, skew-resistant) + in-partition
    sort; no global sort barrier.
    """
    cols = [F.col(c) for c in columns]
    parted = (
        df.repartitionByRange(num_partitions, *cols) if num_partitions else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)


def write_sized(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    max_records_per_file: int | None = None,
    target_file_mb: int | None = None,
    sample_rows: int = 1000,
    mode: str = "overwrite",
    options: dict[str, Any] | None = None,
) -> None:
    """Write with bounded output-file sizes.

    Preferred (zero extra actions): pass ``max_records_per_file`` — Spark's
    ``maxRecordsPerFile`` splits files at write time without any
    repartition.  Alternatively pass ``target_file_mb`` and the in-memory
    row width is estimated from a ``limit(sample_rows)`` sample (one tiny
    action) to derive the records-per-file cap; parquet encoding typically
    compresses 2-5x below the estimate, so treat it as an upper bound on
    file size, not a target to hit exactly.
    """
    if (max_records_per_file is None) == (target_file_mb is None):
        raise InvalidParameterError("provide exactly one of max_records_per_file / target_file_mb")
    if target_file_mb is not None:
        sample = df.limit(sample_rows)
        agg = sample.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.to_json(F.struct(*df.columns)))).alias("bytes"),
        ).first()
        if not agg or not agg["n"]:
            max_records_per_file = 1_000_000
        else:
            row_bytes = max(float(agg["bytes"]) / float(agg["n"]), 1.0)
            max_records_per_file = max(int(target_file_mb * 1024 * 1024 / row_bytes), 1)
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .options(**(options or {}))
    )
    writer.save(path)


# ---------------------------------------------------------------------------
# run-config YAML round-trip (reference config_serializer.py:1-97)
# ---------------------------------------------------------------------------
def _cfg_to_dict(obj):
    from dataclasses import asdict, is_dataclass  # noqa: PLC0415

    if obj is None:
        return None
    assert is_dataclass(obj)
    d = asdict(obj)
    # drop empty/None fields so saved files stay minimal and re-loadable
    return {k: v for k, v in d.items() if v not in (None, {}, [])}


def run_config_to_dict(rc: RunConfig) -> dict:
    """RunConfig -> plain dict (nested configs inlined; empties dropped)."""
    out = {"name": rc.name}
    for key, sub in (
        ("input_config", rc.input_config),
        ("output_config", rc.output_config),
        ("quarantine_config", rc.quarantine_config),
        ("metrics_config", rc.metrics_config),
    ):
        if sub is not None:
            out[key] = _cfg_to_dict(sub)
    if rc.checks_location:
        out["checks_location"] = rc.checks_location
    if rc.reference_tables:
        out["reference_tables"] = {k: _cfg_to_dict(v) for k, v in rc.reference_tables.items()}
    if rc.custom_metrics:
        out["custom_metrics"] = list(rc.custom_metrics)
    return out


def run_config_from_dict(d: dict) -> RunConfig:
    """Inverse of :func:`run_config_to_dict`, with typed-error validation."""
    from dqx_spark.errors import InvalidConfigError  # noqa: PLC0415

    if not isinstance(d, dict):
        raise InvalidConfigError(f"run config entry must be a mapping, got {type(d).__name__}")

    def sub(cls, key):
        v = d.get(key)
        if v is None:
            return None
        if not isinstance(v, dict) or "location" not in v:
            raise InvalidConfigError(f"{key} must be a mapping with a 'location', got {v!r}")
        try:
            return cls(**v)
        except TypeError as e:
            raise InvalidConfigError(f"bad {key}: {e}") from e

    refs = {}
    for name, v in (d.get("reference_tables") or {}).items():
        if not isinstance(v, dict) or "location" not in v:
            raise InvalidConfigError(f"reference_tables[{name!r}] must be a mapping with a 'location'")
        try:
            refs[name] = InputConfig(**v)
        except TypeError as e:
            raise InvalidConfigError(f"bad reference_tables[{name!r}]: {e}") from e
    return RunConfig(
        name=d.get("name", "default"),
        input_config=sub(InputConfig, "input_config"),
        output_config=sub(OutputConfig, "output_config"),
        quarantine_config=sub(OutputConfig, "quarantine_config"),
        metrics_config=sub(OutputConfig, "metrics_config"),
        checks_location=d.get("checks_location"),
        reference_tables=refs,
        custom_metrics=list(d.get("custom_metrics") or []),
    )


def save_run_configs(run_configs: list[RunConfig], path: str) -> None:
    """Write run configs to a YAML (or ``.json``) file."""
    from dqx_spark.serde import save_structured_file  # noqa: PLC0415

    save_structured_file([run_config_to_dict(rc) for rc in run_configs], path)


def load_run_configs(path: str) -> list[RunConfig]:
    """Load run configs from a YAML/JSON file written by
    :func:`save_run_configs` (or by hand)."""
    from dqx_spark.errors import InvalidConfigError, MissingResourceError  # noqa: PLC0415
    from dqx_spark.serde import load_structured_file  # noqa: PLC0415

    try:
        data = load_structured_file(path)
    except FileNotFoundError as e:
        raise MissingResourceError(f"run-config file {path!r} does not exist") from e
    if not isinstance(data, list):
        raise InvalidConfigError(f"run-config file {path!r} must contain a list")
    return [run_config_from_dict(d) for d in data]


def parquet_layout(spark: SparkSession, path: str) -> DataFrame:
    """Physical-layout inspection of a parquet dataset: one row per file
    with ``(file, size_bytes, num_rows, num_row_groups, serialized_bytes)``
    — the inputs to every compaction / small-files / row-group-sizing
    decision (pairs with :func:`write_sized` and
    ``spark.sql.files.maxPartitionBytes``).

    Footer-only reads: the file list distributes across the cluster and
    each task opens just the parquet footer via pyarrow (no column data
    IO), so inspecting a 100 TB dataset costs one metadata round per file.
    URIs resolve through ``pyarrow.fs.FileSystem.from_uri`` (file://, s3://
    — s3a:// is translated — hdfs:// and gs:// where the pyarrow build
    supports them, percent-encoding unquoted); a file that cannot be
    opened yields a row with null stats and the failure in ``error``
    rather than being silently dropped.
    """
    import pandas as _pd  # noqa: PLC0415

    files = spark.read.parquet(path).inputFiles()

    def read_footers(batches):
        from urllib.parse import unquote, urlparse  # noqa: PLC0415

        import pyarrow.parquet as pq  # noqa: PLC0415
        from pyarrow import fs as pafs  # noqa: PLC0415

        def open_one(uri: str):
            u = uri.replace("s3a://", "s3://", 1) if uri.startswith("s3a://") else uri
            parsed = urlparse(u)
            if parsed.scheme in ("", "file"):
                local = unquote(parsed.path) if parsed.scheme else u
                return pq.ParquetFile(local).metadata, os.path.getsize(local)
            fsys, p = pafs.FileSystem.from_uri(u)
            info = fsys.get_file_info([p])[0]
            with fsys.open_input_file(p) as fh:
                return pq.ParquetFile(fh).metadata, info.size

        for pdf in batches:
            rows = []
            for uri in pdf["file"]:
                try:
                    md, size = open_one(uri)
                    rows.append(
                        (
                            uri,
                            size,
                            md.num_rows,
                            md.num_row_groups,
                            sum(
                                md.row_group(i).total_byte_size for i in range(md.num_row_groups)
                            ),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - per-file diagnostics, never task death
                    rows.append((uri, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield _pd.DataFrame(
                rows,
                columns=["file", "size_bytes", "num_rows", "num_row_groups", "serialized_bytes", "error"],
            )

    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        max(1, min(len(files), spark.sparkContext.defaultParallelism))
    )
    return fdf.mapInPandas(
        read_footers,
        schema=(
            "file string, size_bytes long, num_rows long, num_row_groups int, "
            "serialized_bytes long, error string"
        ),
    )


def sort_for_locality(df: DataFrame, cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort within partitions on ``cols`` before writing —
    the poor-man's clustering: co-locates key ranges into files so
    downstream scans with predicates on ``cols`` prune whole files via
    parquet min/max stats (the OSS analogue of the reference's
    ``cluster_by`` liquid-clustering passthrough, io.py:190-244).

    One range-exchange shuffle; the sort is partition-local.  Skewed key
    ranges are handled by Spark's range-partition sampling.
    """
    if not cols:
        raise InvalidParameterError("cols must be non-empty")
    parts = [F.col(c) for c in cols]
    rp = df.repartitionByRange(num_partitions, *parts) if num_partitions else df.repartitionByRange(*parts)
    return rp.sortWithinPartitions(*parts)
