"""Rule model: the IR every API path converges on.

Semantics derived from the reference ``rule.py`` (DQRule family,
``rule.py:205-641``), ``check_funcs.make_condition`` (``check_funcs.py:123-142``)
and the registry decorator (``rule.py:38-57``).  Re-implemented from scratch as
plain frozen dataclasses over Column-producing callables.
"""

from __future__ import annotations
from dqx_spark.errors import InvalidParameterError

import hashlib
import inspect
import json
import re
from dataclasses import dataclass, field, replace
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

CRITICALITY_ERROR = "error"
CRITICALITY_WARN = "warn"


class Criticality:
    ERROR = CRITICALITY_ERROR
    WARN = CRITICALITY_WARN


#: name -> "row" | "dataset"  (reference ``rule.py:38-49``)
CHECK_FUNC_REGISTRY: dict[str, str] = {}

#: functions that must see the original (pre-check) column set
#: (reference ``rule.py:52-57``; used by ``has_valid_schema``)
PRESELECT_ORIGINAL_COLUMNS_REGISTRY: set[str] = set()


def register_rule(rule_type: str, preselect_original_columns: bool = False):
    """Class the decorated check function as row- or dataset-level."""

    def wrapper(func: Callable) -> Callable:
        CHECK_FUNC_REGISTRY[func.__name__] = rule_type
        if preselect_original_columns:
            PRESELECT_ORIGINAL_COLUMNS_REGISTRY.add(func.__name__)
        return func

    return wrapper


def make_condition(condition: Column, message: Column | str, alias: str) -> Column:
    """THE load-bearing convention: null = pass, message string = fail.

    (reference ``check_funcs.py:123-142``)
    """
    msg_col = F.lit(message) if isinstance(message, str) else message
    return F.when(condition, msg_col).otherwise(F.lit(None).cast("string")).alias(alias)


_INVALID_NAME_CHARS = re.compile(r"[^a-zA-Z0-9_]+")


def normalize_col_str(column: str | Column | None) -> str:
    """Deterministic printable name for a column or expression.

    Mirrors the intent of the reference ``get_column_name_or_alias(normalize=True)``
    (``utils.py:116-167``): lowercase, non-alphanumerics collapsed to ``_``.
    """
    if column is None:
        return ""
    if isinstance(column, Column):
        # Column repr is "Column<'expr AS alias'>"; take the inner expression.
        raw = str(column)
        m = re.match(r"Column<'(.*)'>$", raw, re.DOTALL)
        raw = m.group(1) if m else raw
        # strip a trailing alias
        parts = raw.rsplit(" AS ", 1)
        raw = parts[-1] if len(parts) == 2 else raw
    else:
        raw = str(column)
    out = _INVALID_NAME_CHARS.sub("_", raw.strip().lower()).strip("_")
    return out or "expr"


def to_col(column: str | Column) -> Column:
    """str -> F.expr (so dotted struct paths and expressions both work)."""
    return F.expr(column) if isinstance(column, str) else column


@dataclass(frozen=True)
class DQRule:
    """A single declarative check bound to a criticality.

    ``check_func`` produces either a condition Column (row rule) or a
    ``(condition, apply_closure)`` pair (dataset rule).
    """

    check_func: Callable
    criticality: str = CRITICALITY_ERROR
    name: str = ""
    column: str | Column | None = None
    columns: list[str | Column] | None = None
    filter: str | None = None
    check_func_args: tuple = ()
    check_func_kwargs: dict[str, Any] = field(default_factory=dict)
    user_metadata: dict[str, str] | None = None
    #: optional custom failure message: SQL expression string, truncated to
    #: 500 chars (reference rule.py:219-224, manager.py:247-274)
    message_expr: str | None = None

    def __post_init__(self):
        if self.criticality not in (CRITICALITY_ERROR, CRITICALITY_WARN):
            raise InvalidParameterError(f"invalid criticality: {self.criticality!r}")
        if self.column is not None and self.columns is not None:
            raise InvalidParameterError("provide 'column' or 'columns', not both")
        if not self.name:
            object.__setattr__(self, "name", self._auto_name())

    # -- naming ---------------------------------------------------------
    def _auto_name(self) -> str:
        parts = []
        cols = self.columns if self.columns is not None else ([self.column] if self.column is not None else [])
        col_part = "_".join(normalize_col_str(c) for c in cols)
        if col_part:
            parts.append(col_part)
        parts.append(self.check_func.__name__)
        return "_".join(parts)

    # -- invocation -----------------------------------------------------
    @property
    def rule_type(self) -> str:
        return CHECK_FUNC_REGISTRY.get(self.check_func.__name__, "row")

    def prepare_kwargs(self) -> dict[str, Any]:
        """Bind column/columns/filter into the check function call."""
        kwargs = dict(self.check_func_kwargs)
        sig_params = inspect.signature(self.check_func).parameters
        if self.column is not None and "column" in sig_params:
            kwargs.setdefault("column", self.column)
        if self.columns is not None and "columns" in sig_params:
            kwargs.setdefault("columns", self.columns)
        # filter pushdown into checks that accept it (reference rule.py:471-474)
        if self.filter and "row_filter" in sig_params:
            kwargs.setdefault("row_filter", self.filter)
        return kwargs

    def invoke(self):
        return self.check_func(*self.check_func_args, **self.prepare_kwargs())

    def invoke_cached(self):
        """``invoke()`` memoized per instance (frozen dataclass => the
        definition cannot change, so the factory output is the rule's
        expression).  Dataset-check factories mint unique temp-column
        suffixes per call; memoizing makes the suffix stable per rule
        object, which is what lets the engine reuse the (condition,
        closure) pair across repeated ``apply_checks`` calls — the
        streaming micro-batch and multi-table fan-out hot path, where
        plan-construction py4j round-trips dominate driver time."""
        cached = self.__dict__.get("_invoke_cache")
        if cached is None:
            cached = self.invoke()
            object.__setattr__(self, "_invoke_cache", cached)
        return cached

    @property
    def columns_as_strings(self) -> list[str]:
        cols = self.columns if self.columns is not None else ([self.column] if self.column is not None else [])
        out = []
        for c in cols:
            out.append(c if isinstance(c, str) else normalize_col_str(c))
        return out

    # -- serde / identity -------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "criticality": self.criticality,
            "check": {"function": self.check_func.__name__},
            "name": self.name,
        }
        args: dict[str, Any] = {}
        if self.column is not None:
            args["column"] = self.column if isinstance(self.column, str) else normalize_col_str(self.column)
        if self.columns is not None:
            args["columns"] = self.columns_as_strings
        for k, v in self.check_func_kwargs.items():
            args[k] = _normalize_arg(v)
        if args:
            d["check"]["arguments"] = args
        if self.filter:
            d["filter"] = self.filter
        if self.user_metadata:
            d["user_metadata"] = dict(self.user_metadata)
        if self.message_expr:
            d["message_expr"] = self.message_expr
        return d

    def fingerprint(self) -> str:
        """Deterministic SHA-256 over the canonicalized definition
        (reference ``rule.py:644-681``).  Memoized per instance (frozen
        dataclass => definition cannot change after construction)."""
        cached = self.__dict__.get("_fp_cache")
        if cached is None:
            canonical = json.dumps(self.to_dict(), sort_keys=True, default=str)
            cached = hashlib.sha256(canonical.encode()).hexdigest()
            object.__setattr__(self, "_fp_cache", cached)
        return cached

    def with_criticality(self, criticality: str) -> "DQRule":
        return replace(self, criticality=criticality)


def _normalize_arg(v: Any) -> Any:
    if isinstance(v, Column):
        return normalize_col_str(v)
    if isinstance(v, (list, tuple)):
        return [_normalize_arg(x) for x in v]
    if isinstance(v, dict):
        return {k: _normalize_arg(x) for k, x in v.items()}
    return v


@dataclass(frozen=True)
class DQRowRule(DQRule):
    """Check func returns one Column: message-or-null per row
    (reference ``rule.py:504-527``)."""

    @property
    def rule_type(self) -> str:
        return "row"


@dataclass(frozen=True)
class DQDatasetRule(DQRule):
    """Check func returns ``(condition, apply_closure)``; the closure transforms
    the DataFrame (agg/join/window) to add hidden condition columns
    (reference ``rule.py:530-560``)."""

    @property
    def rule_type(self) -> str:
        return "dataset"


@dataclass(frozen=True)
class DQForEachColRule:
    """Fan-out template: one rule per column (reference ``rule.py:563-641``)."""

    check_func: Callable
    columns: list  # each item: str | Column | list (composite key per rule)
    criticality: str = CRITICALITY_ERROR
    name: str = ""
    filter: str | None = None
    check_func_args: tuple = ()
    check_func_kwargs: dict[str, Any] = field(default_factory=dict)
    user_metadata: dict[str, str] | None = None
    message_expr: str | None = None

    def get_rules(self) -> list[DQRule]:
        rules: list[DQRule] = []
        rule_type = CHECK_FUNC_REGISTRY.get(self.check_func.__name__, "row")
        cls = DQDatasetRule if rule_type == "dataset" else DQRowRule
        for col in self.columns:
            kwargs = dict(
                check_func=self.check_func,
                criticality=self.criticality,
                name=self.name,
                filter=self.filter,
                check_func_args=self.check_func_args,
                check_func_kwargs=self.check_func_kwargs,
                user_metadata=self.user_metadata,
                message_expr=self.message_expr,
            )
            if isinstance(col, (list, tuple)):
                kwargs["columns"] = list(col)
            else:
                kwargs["column"] = col
            rules.append(cls(**kwargs))
        return rules


def rule_set_fingerprint(rules: list[DQRule]) -> str:
    canonical = json.dumps(sorted(r.fingerprint() for r in rules))
    return hashlib.sha256(canonical.encode()).hexdigest()
