"""Reporting columns: the wide ``_dq_info`` struct and its merge flow.

Re-derivation of the reference's reporting surface
(reporting_columns.py:22-52, schema/dq_info_schema.py:11-46): checks that
produce per-row diagnostics beyond pass/fail (anomaly scores, severity,
contributions) stage them in hidden ``__dq_info_<suffix>`` struct columns;
the engine merges those into one ``_dq_info`` array-of-structs column at
the end of ``apply_checks`` and drops the temporaries.

The struct is WIDE: every registered field exists in every element (nulls
where a check doesn't fill it), so elements from different check families
share one array type — ``F.concat`` across passes stays well-typed.  Check
modules register their field at import time; first registration of a name
wins, so repeated imports are no-ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "register_dq_info_field",
    "dq_info_item_schema",
    "build_dq_info_struct",
    "merge_info_columns",
    "INFO_COLUMN_PREFIX",
]

#: hidden staging columns produced by checks, merged + dropped by the engine
INFO_COLUMN_PREFIX = "__dq_info_"

_DQ_INFO_FIELDS: dict[str, T.DataType] = {}


def register_dq_info_field(name: str, dtype: T.DataType) -> None:
    """Register a field of the wide ``_dq_info`` struct (call at module
    import from check modules).  First registration wins."""
    if name not in _DQ_INFO_FIELDS:
        _DQ_INFO_FIELDS[name] = dtype


def dq_info_item_schema() -> T.StructType:
    """Current wide struct schema for one ``_dq_info`` element."""
    return T.StructType([T.StructField(n, t, True) for n, t in _DQ_INFO_FIELDS.items()])


def build_dq_info_struct(**kwargs: Column) -> Column:
    """One wide struct: ``kwargs[name]`` per registered field, null-cast
    placeholders for the rest — every producer emits the same type.
    Unknown kwarg names fail at plan-build time rather than silently
    nulling the caller's diagnostics."""
    unknown = set(kwargs) - set(_DQ_INFO_FIELDS)
    if unknown:
        raise ValueError(
            f"unregistered _dq_info fields: {sorted(unknown)}; "
            f"registered: {sorted(_DQ_INFO_FIELDS)} (register_dq_info_field at import time)"
        )
    parts = []
    for name, dtype in _DQ_INFO_FIELDS.items():
        col = kwargs.get(name)
        if col is None:
            col = F.lit(None).cast(dtype)
        parts.append(col.alias(name))
    return F.struct(*parts).cast(dq_info_item_schema())


def merge_info_columns(dest_name: str, df: DataFrame, info_col_names: list[str] | None = None) -> DataFrame:
    """Merge staged info struct columns into ``dest_name`` as an
    array-of-structs and drop the sources.

    Element order follows ``info_col_names``; names absent from the
    DataFrame are skipped; if ``dest_name`` already exists (a previous
    ``apply_checks`` pass) the new elements are appended via ``concat``.
    ``None``/empty names with no existing dest is a no-op."""
    info_cols = [c for c in (info_col_names or []) if c in df.columns]
    if not info_cols:
        # nothing staged: the existing dest (if any) passes through as-is
        return df
    new_structs = F.array(*[F.col(c) for c in info_cols])
    if dest_name in df.columns:
        # coalesce a NULL pre-existing dest to an empty array: concat
        # propagates NULL, which would silently DROP the newly staged
        # diagnostics on exactly those rows (r4 review)
        empty = F.array().cast(df.schema[dest_name].dataType)
        result_col = F.concat(F.coalesce(F.col(dest_name), empty), new_structs)
    else:
        result_col = new_structs
    return df.withColumn(dest_name, result_col).drop(*info_cols)
