"""Pluggable checks storage: local YAML/JSON files, Spark tables, and JDBC
databases.

Semantics derived from the reference ``checks_storage.py`` (file handler
:340+, Delta-table handler with ``run_config_name`` column :1070+,
Lakebase/Postgres handler :498-1230 — re-derived as plain Spark JDBC —
factory :1294-1443).  Databricks-only backends (workspace files, UC
volumes) are out of scope; the table backend works with any Spark catalog
format (parquet managed tables locally, Delta on clusters that have it);
the JDBC backend needs the database's driver jar on the Spark classpath.
"""

from __future__ import annotations
from dqx_spark.errors import CheckDownloadError, InvalidCheckError, InvalidConfigError, MissingResourceError

import json
from abc import ABC, abstractmethod

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqx_spark.serde import load_checks_from_file, save_checks_to_file

CHECKS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("criticality", T.StringType(), True),
        T.StructField("check", T.StringType(), True),  # JSON-encoded check block
        T.StructField("filter", T.StringType(), True),
        T.StructField("run_config_name", T.StringType(), True),
        T.StructField("user_metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class BaseChecksStorage(ABC):
    @abstractmethod
    def load(self) -> list[dict]: ...

    @abstractmethod
    def save(self, checks: list[dict], mode: str = "overwrite") -> None: ...


class FileChecksStorage(BaseChecksStorage):
    """Local YAML or JSON file (reference checks_storage.py:340+)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> list[dict]:
        try:
            checks = load_checks_from_file(self.path)
        except FileNotFoundError as e:
            raise MissingResourceError(f"checks file {self.path!r} does not exist") from e
        if not isinstance(checks, list):
            raise InvalidCheckError(f"checks file {self.path!r} must contain a list")
        return checks

    def save(self, checks: list[dict], mode: str = "overwrite") -> None:
        if mode == "append":
            existing = []
            try:
                existing = self.load()
            except FileNotFoundError:
                pass
            checks = existing + checks
        save_checks_to_file(checks, self.path)


def _row_to_check(r) -> dict:
    check = {"criticality": r["criticality"], "check": json.loads(r["check"])}
    if r["name"]:
        check["name"] = r["name"]
    if r["filter"]:
        check["filter"] = r["filter"]
    if r["user_metadata"]:
        check["user_metadata"] = dict(r["user_metadata"])
    return check


def _check_to_row(c: dict, run_config_name: str) -> dict:
    return {
        "name": c.get("name"),
        "criticality": c.get("criticality", "error"),
        "check": json.dumps(c["check"], sort_keys=True),
        "filter": c.get("filter"),
        "run_config_name": run_config_name,
        "user_metadata": c.get("user_metadata"),
    }


class TableChecksStorage(BaseChecksStorage):
    """Spark-table storage keyed by ``run_config_name``
    (reference checks_storage.py:1070+)."""

    def __init__(self, spark: SparkSession, table: str, run_config_name: str = "default"):
        self.spark = spark
        self.table = table
        self.run_config_name = run_config_name

    def load(self) -> list[dict]:
        from pyspark.errors import AnalysisException  # noqa: PLC0415

        try:
            rows = (
                self.spark.read.table(self.table)
                .where(F.col("run_config_name") == self.run_config_name)
                .collect()
            )
        except AnalysisException as e:
            raise CheckDownloadError(
                f"cannot load checks from table {self.table!r}: {e}"
            ) from e
        return [_row_to_check(r) for r in rows]

    def save(self, checks: list[dict], mode: str = "overwrite") -> None:
        rows = [_check_to_row(c, self.run_config_name) for c in checks]
        if mode == "overwrite":
            # overwrite ONLY this run config's rows, keep others; collect the
            # (small) other rows first — Spark cannot overwrite a table from
            # a plan that reads the same table
            # table-not-found is the ONLY swallowed error: any other read
            # failure (permissions, transient metastore/network) must abort
            # the save, or the overwrite would silently drop every other
            # run config's rows
            if self.spark.catalog.tableExists(self.table):
                others = (
                    self.spark.read.table(self.table)
                    .where(F.col("run_config_name") != self.run_config_name)
                    .collect()
                )
                rows = [r.asDict() for r in others] + rows
            self.spark.createDataFrame(rows, CHECKS_TABLE_SCHEMA).write.mode("overwrite").saveAsTable(self.table)
        else:
            self.spark.createDataFrame(rows, CHECKS_TABLE_SCHEMA).write.mode("append").saveAsTable(self.table)


class JdbcChecksStorage(BaseChecksStorage):
    """JDBC-backed storage — the reference's Lakebase/Postgres backend
    (checks_storage.py:498-1230) without the Databricks connection broker:
    plain Spark JDBC reads/writes against any database whose driver is on
    the classpath.

    ``location`` is ``<jdbc-url>#<table>``, e.g.
    ``jdbc:postgresql://host:5432/dq#public.dqx_checks``; credentials and
    the driver class go in ``options`` (``user``/``password``/``driver``).
    Overwrite keeps other run configs' rows, same discipline as
    :class:`TableChecksStorage`."""

    def __init__(self, spark: SparkSession, location: str, run_config_name: str = "default", options: dict | None = None):
        url, sep, table = location.partition("#")
        if not sep or not table:
            raise InvalidConfigError(f"JDBC checks location must be '<jdbc-url>#<table>', got {location!r}")
        self.spark = spark
        self.url = url
        self.table = table
        self.run_config_name = run_config_name
        self.options = options or {}

    def _reader(self):
        return self.spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table).options(
            **self.options
        )

    def _write(self, rows: list[dict], mode: str) -> None:
        (
            self.spark.createDataFrame(rows, CHECKS_TABLE_SCHEMA)
            .withColumn("user_metadata", F.to_json("user_metadata"))  # JDBC has no MAP type
            .write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .options(**self.options)
            .mode(mode)
            .save()
        )

    def load(self) -> list[dict]:
        rows = self._reader().load().where(F.col("run_config_name") == self.run_config_name).collect()
        return [
            _row_to_check(
                {**r.asDict(), "user_metadata": json.loads(r["user_metadata"]) if r["user_metadata"] else None}
            )
            for r in rows
        ]

    def save(self, checks: list[dict], mode: str = "overwrite") -> None:
        rows = [_check_to_row(c, self.run_config_name) for c in checks]
        if mode == "overwrite":
            try:
                others = (
                    self._reader().load().where(F.col("run_config_name") != self.run_config_name).collect()
                )
                rows = [
                    {**r.asDict(), "user_metadata": json.loads(r["user_metadata"]) if r["user_metadata"] else None}
                    for r in others
                ] + rows
            except Exception as exc:  # noqa: BLE001
                # swallow ONLY missing-relation errors (message text is the
                # best cross-database signal JDBC gives us); anything else —
                # auth, network, syntax — must abort, or the overwrite below
                # would silently drop every other run config's rows
                msg = str(exc).lower()
                if not any(
                    s in msg
                    for s in ("not exist", "not found", "no such table", "doesn't exist", "undefined")
                ):
                    raise
            self._write(rows, "overwrite")
        else:
            self._write(rows, "append")


def checks_storage_factory(spark: SparkSession, location: str, run_config_name: str = "default") -> BaseChecksStorage:
    """Dispatch by location shape (reference checks_storage.py:1294-1443):
    '.yml'/'.yaml'/'.json' suffix -> file; 'jdbc:' prefix -> JDBC;
    otherwise table name."""
    if location.endswith((".yml", ".yaml", ".json")):
        return FileChecksStorage(location)
    if location.startswith("jdbc:"):
        return JdbcChecksStorage(spark, location, run_config_name)
    return TableChecksStorage(spark, location, run_config_name)
