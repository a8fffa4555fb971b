"""Pluggable checks storage: local YAML/JSON files and Spark tables.

Semantics derived from the reference ``checks_storage.py`` (file handler
:340+, Delta-table handler with ``run_config_name`` column :1070+, factory
:1294-1443).  Databricks-only backends (workspace files, UC volumes,
Lakebase) are out of scope; the table backend works with any Spark catalog
format (parquet managed tables locally, Delta on clusters that have it).
"""

from __future__ import annotations

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
        checks = load_checks_from_file(self.path)
        if not isinstance(checks, list):
            raise ValueError(f"checks file {self.path!r} must contain a list")
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


class TableChecksStorage(BaseChecksStorage):
    """Spark-table storage keyed by ``run_config_name``
    (reference checks_storage.py:1070+)."""

    def __init__(self, spark: SparkSession, table: str, run_config_name: str = "default"):
        self.spark = spark
        self.table = table
        self.run_config_name = run_config_name

    def load(self) -> list[dict]:
        rows = (
            self.spark.read.table(self.table)
            .where(F.col("run_config_name") == self.run_config_name)
            .collect()
        )
        checks = []
        for r in rows:
            check = {"criticality": r["criticality"], "check": json.loads(r["check"])}
            if r["name"]:
                check["name"] = r["name"]
            if r["filter"]:
                check["filter"] = r["filter"]
            if r["user_metadata"]:
                check["user_metadata"] = dict(r["user_metadata"])
            checks.append(check)
        return checks

    def save(self, checks: list[dict], mode: str = "overwrite") -> None:
        rows = [
            {
                "name": c.get("name"),
                "criticality": c.get("criticality", "error"),
                "check": json.dumps(c["check"], sort_keys=True),
                "filter": c.get("filter"),
                "run_config_name": self.run_config_name,
                "user_metadata": c.get("user_metadata"),
            }
            for c in checks
        ]
        if mode == "overwrite":
            # overwrite ONLY this run config's rows, keep others; collect the
            # (small) other rows first — Spark cannot overwrite a table from
            # a plan that reads the same table
            try:
                others = (
                    self.spark.read.table(self.table)
                    .where(F.col("run_config_name") != self.run_config_name)
                    .collect()
                )
                rows = [r.asDict() for r in others] + rows
            except Exception:  # noqa: BLE001 — table doesn't exist yet
                pass
            self.spark.createDataFrame(rows, CHECKS_TABLE_SCHEMA).write.mode("overwrite").saveAsTable(self.table)
        else:
            self.spark.createDataFrame(rows, CHECKS_TABLE_SCHEMA).write.mode("append").saveAsTable(self.table)


def checks_storage_factory(spark: SparkSession, location: str, run_config_name: str = "default") -> BaseChecksStorage:
    """Dispatch by location shape (reference checks_storage.py:1294-1443):
    '.yml'/'.yaml'/'.json' suffix -> file; otherwise table name."""
    if location.endswith((".yml", ".yaml", ".json")):
        return FileChecksStorage(location)
    return TableChecksStorage(spark, location, run_config_name)
