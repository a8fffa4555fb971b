"""dqx_spark — a PySpark-native declarative data-quality / analytics engine.

Built from scratch against the semantics of the public ``databrickslabs/dqx``
project (see SURVEY.md).  Users declare *checks* (rules) in Python or
YAML/JSON metadata; the engine compiles each check into Spark ``Column``
expressions and/or DataFrame transforms, annotates every input row with
structured ``_errors`` / ``_warnings`` result columns, optionally splits the
output into good/quarantine DataFrames, and emits summary metrics via Spark
``Observation``.

Design stance (SURVEY.md §7.0): pure functions producing Columns; rules as
frozen dataclasses; engine = a fold over rules; ``pyspark`` is the only hard
dependency.  The two keystone conventions are kept from the reference:

* **message-or-null condition columns** (``make_condition``): a check's
  condition Column evaluates to NULL when the row passes and to a message
  string when it fails.
* the **row/dataset rule split**: row rules compile to a single Column
  expression; dataset rules return ``(condition, apply_closure)`` where the
  closure enriches the DataFrame (agg / join / window) with hidden condition
  columns that the condition references.
"""

from dqx_spark.rule import (
    Criticality,
    DQDatasetRule,
    DQForEachColRule,
    DQRowRule,
    DQRule,
    make_condition,
    register_rule,
)
from dqx_spark.schema import ERRORS_COLUMN, INFO_COLUMN, WARNINGS_COLUMN, dq_result_item_schema, dq_result_schema
from dqx_spark.engine import DQEngine, ExtraParams

#: reference-name alias (the reference splits DQEngine/DQEngineCore;
#: our engine is one class — engine.py docstring)
DQEngineCore = DQEngine
from dqx_spark.errors import (
    CheckDownloadError,
    ComputationError,
    DQXError,
    InvalidCheckError,
    InvalidConfigError,
    InvalidParameterError,
    InvalidPhysicalTypeError,
    MissingParameterError,
    MissingResourceError,
    ModelLoadError,
    ODCSContractError,
    ParameterError,
    UnsafeSqlQueryError,
)
from dqx_spark.reporting import build_dq_info_struct, dq_info_item_schema, merge_info_columns, register_dq_info_field

# Kept in sync with pyproject.toml [project].version (the single metadata
# source for the wheel); tests/test_storage_and_extras.py pins the match.
__version__ = "0.13.0"

__all__ = [
    "CheckDownloadError",
    "ComputationError",
    "DQEngineCore",
    "DQXError",
    "ExtraParams",
    "InvalidCheckError",
    "InvalidPhysicalTypeError",
    "MissingResourceError",
    "ModelLoadError",
    "ODCSContractError",
    "InvalidConfigError",
    "InvalidParameterError",
    "MissingParameterError",
    "ParameterError",
    "UnsafeSqlQueryError",
    "Criticality",
    "DQDatasetRule",
    "DQEngine",
    "DQForEachColRule",
    "DQRowRule",
    "DQRule",
    "ERRORS_COLUMN",
    "INFO_COLUMN",
    "WARNINGS_COLUMN",
    "build_dq_info_struct",
    "dq_info_item_schema",
    "merge_info_columns",
    "register_dq_info_field",
    "dq_result_item_schema",
    "dq_result_schema",
    "make_condition",
    "register_rule",
]
