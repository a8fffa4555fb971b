"""Metadata (YAML/JSON dict) <-> rule serde and validation.

Semantics derived from the reference ``checks_serializer.py`` /
``checks_validator.py`` / ``checks_resolver.py``: the dict form and the
Python API converge on the same ``list[DQRule]`` IR.
"""

from __future__ import annotations
from dqx_spark.errors import InvalidCheckError

import inspect
import json
from dataclasses import dataclass, field
from typing import Callable

from dqx_spark.rule import (
    CHECK_FUNC_REGISTRY,
    CRITICALITY_ERROR,
    DQDatasetRule,
    DQForEachColRule,
    DQRowRule,
    DQRule,
)


@dataclass
class ValidationStatus:
    errors: list[str] = field(default_factory=list)

    @property
    def has_errors(self) -> bool:
        return bool(self.errors)

    def __str__(self) -> str:
        return "; ".join(self.errors) if self.errors else "ok"


def _resolve_function(name: str, custom_check_functions: dict[str, Callable] | None) -> Callable | None:
    """builtin registry -> custom dict -> dotted module path
    (reference checks_resolver.py)."""
    import dqx_spark.functions as funcs

    if custom_check_functions and name in custom_check_functions:
        return custom_check_functions[name]
    if hasattr(funcs, name):
        return getattr(funcs, name)
    if "." in name:
        module_path, attr = name.rsplit(".", 1)
        try:
            import importlib

            module = importlib.import_module(module_path)
            return getattr(module, attr, None)
        except ImportError:
            return None
    return None


def validate_checks(
    checks: list[dict],
    custom_check_functions: dict[str, Callable] | None = None,
) -> ValidationStatus:
    """Structural + signature validation of metadata checks
    (reference checks_validator.py:30-60)."""
    status = ValidationStatus()
    for i, check in enumerate(checks):
        where = f"checks[{i}]"
        if not isinstance(check, dict):
            status.errors.append(f"{where}: not a dict")
            continue
        block = check.get("check")
        if not isinstance(block, dict) or "function" not in block:
            status.errors.append(f"{where}: missing 'check.function'")
            continue
        crit = check.get("criticality", CRITICALITY_ERROR)
        if crit not in ("error", "warn"):
            status.errors.append(f"{where}: invalid criticality {crit!r}")
        func = _resolve_function(block["function"], custom_check_functions)
        if func is None:
            status.errors.append(f"{where}: unknown check function {block['function']!r}")
            continue
        args = block.get("arguments", {})
        if not isinstance(args, dict):
            status.errors.append(f"{where}: 'arguments' must be a dict")
            continue
        if "for_each_column" in block:
            if not isinstance(block["for_each_column"], list) or not block["for_each_column"]:
                status.errors.append(f"{where}: 'for_each_column' must be a non-empty list")
        # signature check: every provided argument must be accepted
        sig = inspect.signature(func)
        accepts_kwargs = any(p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values())
        if not accepts_kwargs:
            for arg in args:
                if arg not in sig.parameters:
                    status.errors.append(
                        f"{where}: function {block['function']!r} does not accept argument {arg!r}"
                    )
        # required params (no default) must be present, unless injected.
        # row_filter is always engine-injected (from the 'filter' key);
        # column/columns only arrive from outside 'arguments' via
        # for_each_column fan-out — without it a missing required column
        # argument is a real authoring error that must be flagged here, not
        # a TypeError at plan time (r4 review)
        injected = {"row_filter"}
        if "for_each_column" in block:
            injected |= {"column", "columns"}
        for pname, p in sig.parameters.items():
            if p.default is inspect.Parameter.empty and p.kind in (
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                inspect.Parameter.KEYWORD_ONLY,
            ):
                if pname not in args and pname not in injected:
                    status.errors.append(f"{where}: missing required argument {pname!r}")
        # argument TYPE validation against annotations (reference
        # checks_validator argument-type tests): conservative — only flags
        # when every union member is a checkable primitive and none accepts
        # the value, so Column/DataFrame-typed params never false-positive
        for arg, val in args.items():
            err = _argument_type_error(func, arg, val)
            if err:
                status.errors.append(f"{where}: {err}")
    return status


_CHECKABLE_TYPES = (int, float, str, bool, list, dict)


def _argument_type_error(func: Callable, arg: str, val) -> str | None:
    """Non-None when ``val`` provably mismatches the annotation of ``arg``."""
    import typing

    try:
        hints = typing.get_type_hints(func)
    except Exception:  # noqa: BLE001 - unresolvable annotations: skip
        return None
    t = hints.get(arg)
    if t is None:
        return None
    import types as _pytypes

    origin = typing.get_origin(t)
    if origin in (typing.Union, _pytypes.UnionType):
        # both typing.Optional/Union[...] and PEP-604 `X | Y` unions
        members = list(typing.get_args(t))
    elif origin is not None:
        members = [origin]  # a single parameterized generic like list[str]
    else:
        members = [t]
    flat: list = []
    for m in members:
        m_origin = typing.get_origin(m)
        flat.append(m_origin if m_origin is not None else m)
    if type(None) in flat and val is None:
        return None
    concrete = [m for m in flat if m is not type(None)]
    if not concrete or not all(isinstance(m, type) and issubclass(m, _CHECKABLE_TYPES) for m in concrete):
        return None  # un-checkable (Column, Callable, Any, ...): skip
    for m in concrete:
        if m is float and isinstance(val, (int, float)) and not isinstance(val, bool):
            return None
        if m is int and isinstance(val, bool):
            continue  # bool is not an acceptable int argument
        if isinstance(val, m):
            return None
    names = "/".join(getattr(m, "__name__", str(m)) for m in concrete)
    return f"argument {arg!r} expects {names}, got {type(val).__name__} ({val!r})"


def deserialize_checks(
    checks: list[dict],
    custom_check_functions: dict[str, Callable] | None = None,
    validate: bool = True,
) -> list[DQRule]:
    """Metadata dicts -> DQRule IR (reference checks_serializer.py:252-343)."""
    if validate:
        status = validate_checks(checks, custom_check_functions)
        if status.has_errors:
            raise InvalidCheckError(f"invalid checks: {status}")
    rules: list[DQRule] = []
    for check in checks:
        block = dict(check["check"])
        func_name = block["function"]
        func = _resolve_function(func_name, custom_check_functions)
        args = dict(block.get("arguments", {}))
        criticality = check.get("criticality", CRITICALITY_ERROR)
        common = dict(
            check_func=func,
            criticality=criticality,
            name=check.get("name", ""),
            filter=check.get("filter"),
            user_metadata=check.get("user_metadata"),
            message_expr=check.get("message_expr"),
        )
        for_each = block.get("for_each_column")
        if for_each:
            fan = DQForEachColRule(
                check_func=func,
                columns=for_each,
                criticality=criticality,
                name=check.get("name", ""),
                filter=check.get("filter"),
                check_func_kwargs=args,
                user_metadata=check.get("user_metadata"),
                message_expr=check.get("message_expr"),
            )
            rules.extend(fan.get_rules())
            continue
        column = args.pop("column", None)
        columns = args.pop("columns", None)
        rule_type = CHECK_FUNC_REGISTRY.get(func_name, "row")
        cls = DQDatasetRule if rule_type == "dataset" else DQRowRule
        rules.append(cls(column=column, columns=columns, check_func_kwargs=args, **common))
    return rules


#: directly contradictory check pairs on the same column
#: (reference checks_semantic_validator.py)
_CONTRADICTIONS = [
    ("is_null", "is_not_null"),
    ("is_empty", "is_not_empty"),
    ("is_null_or_empty", "is_not_null_and_not_empty"),
]


def semantic_validate(
    checks: list[dict], custom_check_functions: dict[str, Callable] | None = None
) -> list[str]:
    """Detect duplicate and directly conflicting rules; returns warnings,
    not errors (reference checks_semantic_validator.py via engine.py:302-343)."""
    warnings: list[str] = []
    # a structurally invalid check (unknown function, bad arguments) must
    # not crash a warnings-only validator — report it as a warning and
    # validate the rest (r4 review: check_func=None died in _auto_name)
    valid: list[tuple[int, dict]] = []
    for i, check in enumerate(checks):
        st = validate_checks([check], custom_check_functions)
        if st.has_errors:
            warnings.append(f"checks[{i}] not semantically validated: {st}")
        else:
            valid.append((i, check))
    rules: list[DQRule] = []
    seen: dict[str, int] = {}
    for i, check in valid:
        # per-check deserialization keeps the original index even when
        # for_each_column fans one check out into several rules
        for rule in deserialize_checks([check], custom_check_functions, validate=False):
            rules.append(rule)
            fp = rule.fingerprint()
            if fp in seen:
                warnings.append(f"checks[{i}] duplicates checks[{seen[fp]}] ({rule.name})")
            else:
                seen[fp] = i
    by_col: dict[str, set[str]] = {}
    for rule in rules:
        for c in rule.columns_as_strings:
            by_col.setdefault(c, set()).add(rule.check_func.__name__)
    for col, funcs in by_col.items():
        for a, b in _CONTRADICTIONS:
            if a in funcs and b in funcs:
                warnings.append(f"column '{col}' has contradictory checks: {a} and {b}")
    return warnings


def serialize_checks(rules: list[DQRule]) -> list[dict]:
    """DQRule IR -> metadata dicts; round-trips with deserialize_checks
    (reference rule.py:374-411)."""
    return [r.to_dict() for r in rules]


def load_structured_file(path: str):
    """YAML-or-JSON-by-extension read; the one shared dispatch for checks
    files and run-config files."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if path.endswith(".json"):
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def save_structured_file(data, path: str) -> None:
    """YAML-or-JSON-by-extension write (inverse of load_structured_file)."""
    if path.endswith(".json"):
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(data, fh, indent=2)
        return
    import yaml

    with open(path, "w", encoding="utf-8") as fh:
        yaml.safe_dump(data, fh, sort_keys=False)


def load_checks_from_file(path: str) -> list[dict]:
    """YAML or JSON checks file (reference checks_storage.py:340+)."""
    return load_structured_file(path)


def save_checks_to_file(checks: list[dict], path: str) -> None:
    save_structured_file(checks, path)
