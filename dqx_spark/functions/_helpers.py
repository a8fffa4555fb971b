"""Shared expression helpers for the check-function library.

Semantics derived from the reference's ``check_funcs.py`` utility tail
(``get_limit_expr`` :4468-4510, tolerance compare :3893-3943, null-safe limit
compare :4185-4231, null-safe join-back :3757-3833) — re-expressed from
scratch.
"""

from __future__ import annotations

import datetime
import itertools
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_counter = itertools.count()


def unique_suffix() -> str:
    """Deterministic-per-process unique suffix for temp columns/views so
    repeated checks compose (reference check_funcs.py:1766)."""
    return f"{next(_counter):x}"


def get_limit_expr(limit) -> Column:
    """Limit may be a literal, a column name, or a SQL expression
    (reference check_funcs.py:4468-4510)."""
    if limit is None:
        raise ValueError("limit must not be None")
    if isinstance(limit, Column):
        return limit
    if isinstance(limit, str):
        return F.expr(limit)
    if isinstance(limit, (int, float, Decimal, datetime.date, datetime.datetime)):
        return F.lit(limit)
    raise TypeError(f"unsupported limit type: {type(limit)!r}")


def str_value(column: Column) -> Column:
    """Render a value for failure messages; NULL prints as 'null'."""
    return F.coalesce(column.cast("string"), F.lit("null"))


def within_tolerance(a: Column, b: Column, abs_tolerance: float | None, rel_tolerance: float | None) -> Column:
    """abs(a-b) <= max(abs_tol, rel_tol * greatest(abs(a), abs(b)))
    (reference check_funcs.py:3893-3943).  With no tolerances, null-safe
    equality."""
    if abs_tolerance is None and rel_tolerance is None:
        return a.eqNullSafe(b)
    bound = F.lit(float(abs_tolerance or 0.0))
    if rel_tolerance is not None:
        bound = F.greatest(bound, F.lit(float(rel_tolerance)) * F.greatest(F.abs(a), F.abs(b)))
    # null-safe: both null -> within; one null -> not within
    return F.when(a.isNull() & b.isNull(), F.lit(True)).otherwise(F.abs(a - b) <= bound)


def null_safe_join_condition(left: DataFrame, right: DataFrame, left_cols: list[str], right_cols: list[str]) -> Column:
    """Conjunction of eqNullSafe terms (reference check_funcs.py:3757-3797)."""
    cond = None
    for lc, rc in zip(left_cols, right_cols):
        term = left[lc].eqNullSafe(right[rc])
        cond = term if cond is None else (cond & term)
    return cond


def filtered(expr: Column, row_filter: str | None) -> Column:
    """Push a rule-level filter *into* an aggregate input instead of
    pre-filtering the row stream — all rows must survive for annotation
    (reference check_funcs.py:4324-4333)."""
    if row_filter:
        return F.when(F.expr(row_filter), expr)
    return expr
