"""Data-contract → checks generator.

Semantics derived from the reference
``datacontract/contract_rules_generator.py:86-1009``: an ODCS-style contract
(schema objects with typed properties and quality attributes) compiles to a
``has_valid_schema`` check plus per-property rules.  Supported property
attributes (the non-Databricks subset):

* ``required``        -> is_not_null
* ``unique``          -> is_unique
* ``pattern``         -> regex_match
* ``enum``            -> is_in_list
* ``minimum``/``maximum`` -> is_in_range / is_not_less_than / is_not_greater_than
* ``minLength``/``maxLength`` -> sql_expression on length()
* ``format``: email / ipv4 / ipv6 / date / timestamp / uuid -> matching check
* ``primaryKey``      -> composite is_unique across flagged properties

Constraint attributes may live directly on the property OR nested under
``logicalTypeOptions`` (the ODCS v3 shape, reference
contract_rules_generator.py:617-668); direct attributes win on conflict.

Explicit quality sections are honored at both property and schema level
(reference :1183-1259): an entry with ``type: custom, engine: dqx`` and an
``implementation`` dict containing ``check`` passes through as a rule
(default criticality applied if unset, provenance recorded in
``user_metadata``); entries with ``type: text`` route through the optional
``text_rule_provider`` hook — the same pluggable-provider discipline as
``dqx_spark.llm`` (no bundled LLM runtime).
"""

from __future__ import annotations

from dqx_spark.errors import ODCSContractError

_FORMAT_CHECKS = {
    "email": "is_valid_email",
    "ipv4": "is_valid_ipv4_address",
    "ipv6": "is_valid_ipv6_address",
    "date": "is_valid_date",
    "timestamp": "is_valid_timestamp",
}
_UUID_PATTERN = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

import re as _re

#: Spark/UC DDL simple type names (a non-Spark physicalType like
#: Postgres 'uuid'/'jsonb' falls back to the logicalType mapping instead
#: of poisoning the DDL)
_SPARK_SIMPLE_TYPES = {
    "string", "char", "varchar", "int", "integer", "bigint", "smallint", "tinyint",
    "long", "float", "real", "double", "decimal", "numeric", "dec", "boolean",
    "date", "timestamp", "timestamp_ntz", "binary", "interval", "void", "variant",
}
_PHYSICAL_TYPE_RE = _re.compile(
    r"^([A-Za-z_]+)(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?$|^(ARRAY|MAP|STRUCT)\s*<.+>$", _re.IGNORECASE
)


def _is_spark_ddl_type(text: str) -> bool:
    m = _PHYSICAL_TYPE_RE.match(text)
    if not m:
        return False
    if m.group(4):  # ARRAY/MAP/STRUCT<...>
        return True
    return m.group(1).lower() in _SPARK_SIMPLE_TYPES


_MAX_TYPE_DEPTH = 10

#: composite ATTEMPT = keyword followed (possibly after whitespace — Spark's
#: DDL parser accepts 'ARRAY <int>') by '<'; a bare prefix ('structured')
#: is a simple type name, not a composite.
_COMPOSITE_TYPE_RE = _re.compile(r"^(ARRAY|MAP|STRUCT)\s*<", _re.IGNORECASE)


def _split_top_level(content: str) -> list[str]:
    """Split on commas at angle-bracket depth 0 (MAP<K, V> keeps K and V
    whole even when K is itself an ARRAY<...>)."""
    parts, depth, cur = [], 0, []
    for ch in content:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def _validate_physical_type(text: str, depth: int = 0) -> None:
    """Recursive structural validation of a Spark/UC DDL physicalType —
    the reference raises on malformed declared types instead of emitting a
    broken ``has_valid_schema`` DDL (contract_rules_generator.py:443
    `_validate_unity_physical_type`): DECIMAL precision <= 38 and scale <=
    precision, ARRAY/MAP/STRUCT inner types valid recursively, nesting
    bounded.  Simple UNKNOWN names are NOT validated here — they take the
    documented logical-type fallback (Postgres 'uuid'/'jsonb' etc.)."""
    from dqx_spark.errors import InvalidPhysicalTypeError  # noqa: PLC0415

    if depth > _MAX_TYPE_DEPTH:
        raise InvalidPhysicalTypeError(f"physicalType nesting exceeds {_MAX_TYPE_DEPTH}: {text!r}")
    t = text.strip()
    upper = t.upper()
    # Composite only when '<' actually follows the keyword (Spark's DDL
    # parser accepts 'ARRAY <int>'); names merely PREFIXED with a keyword
    # ('structured', a dialect 'mapping' type) fall through to the simple-
    # type path / logical fallback instead of raising.
    comp_m = _COMPOSITE_TYPE_RE.match(upper)
    if comp_m:
        comp = comp_m.group(1)
        if not t.endswith(">"):
            raise InvalidPhysicalTypeError(f"malformed {comp} type: {text!r}")
        inner = t[comp_m.end() : -1]
        parts = _split_top_level(inner)
        if comp == "ARRAY":
            if len(parts) != 1 or not parts[0]:
                raise InvalidPhysicalTypeError(f"ARRAY takes exactly one element type: {text!r}")
            _validate_inner(parts[0], depth + 1)
        elif comp == "MAP":
            if len(parts) != 2:
                raise InvalidPhysicalTypeError(f"MAP takes exactly key and value types: {text!r}")
            for p in parts:
                _validate_inner(p, depth + 1)
        else:  # STRUCT
            if not inner.strip():
                raise InvalidPhysicalTypeError(f"empty STRUCT: {text!r}")
            for field in parts:
                if ":" not in field:
                    raise InvalidPhysicalTypeError(f"STRUCT field needs 'name: type': {field!r} in {text!r}")
                _validate_inner(field.split(":", 1)[1], depth + 1)
        return
    m = _re.match(r"^([A-Za-z_]+)\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\)$", t)
    if m:
        name = m.group(1).lower()
        if name in ("decimal", "numeric", "dec"):
            precision, scale = int(m.group(2)), int(m.group(3) or 0)
            if precision > 38:
                raise InvalidPhysicalTypeError(f"decimal precision {precision} > 38: {text!r}")
            if scale > precision:
                raise InvalidPhysicalTypeError(f"decimal scale {scale} > precision {precision}: {text!r}")
        elif name not in ("char", "varchar"):
            raise InvalidPhysicalTypeError(f"type {name!r} takes no parameters: {text!r}")


def _validate_inner(text: str, depth: int) -> None:
    """Inner types inside ARRAY/MAP/STRUCT must be REAL Spark types — the
    logical-type fallback only exists for top-level simple names, so an
    unrecognized inner name is an authoring error, not a dialect."""
    from dqx_spark.errors import InvalidPhysicalTypeError  # noqa: PLC0415

    t = text.strip()
    if not _is_spark_ddl_type(t):
        raise InvalidPhysicalTypeError(f"invalid inner type {t!r}")
    _validate_physical_type(t, depth)

_TYPE_TO_SPARK = {
    "string": "string",
    "text": "string",
    "integer": "int",
    "int": "int",
    "long": "bigint",
    "bigint": "bigint",
    "number": "double",
    "double": "double",
    "float": "float",
    "decimal": "decimal(38,18)",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
}


def _explicit_quality_rules(
    quality: list[dict],
    schema_name: str,
    prop_name: str | None,
    criticality: str,
    text_rule_provider,
) -> list[dict]:
    """Rules from an ODCS ``quality`` list: dqx-engine custom entries pass
    through; ``type: text`` entries route to the provider hook."""
    out: list[dict] = []
    for q in quality:
        if not isinstance(q, dict):
            continue
        provenance = {"schema": schema_name}
        if prop_name:
            provenance["field"] = prop_name
        if q.get("type") == "custom" and q.get("engine") == "dqx":
            impl = q.get("implementation")
            if isinstance(impl, dict) and "check" in impl:
                rule = dict(impl)
                rule.setdefault("criticality", criticality)
                rule["user_metadata"] = {
                    **provenance,
                    **rule.get("user_metadata", {}),
                    "rule_type": "contract_explicit",
                }
                out.append(rule)
        elif q.get("type") == "text" and q.get("description") and text_rule_provider is not None:
            for rule in text_rule_provider(q["description"], schema_name, prop_name) or []:
                rule = dict(rule)
                rule.setdefault("criticality", criticality)
                rule["user_metadata"] = {
                    **provenance,
                    **rule.get("user_metadata", {}),
                    "rule_type": "text_llm",
                    "text_expectation": q["description"],
                }
                out.append(rule)
    return out


def generate_rules_from_contract(
    contract: dict,
    criticality: str = "error",
    text_rule_provider=None,
    generate_predefined_rules: bool = True,
    generate_schema_validation: bool = True,
    strict_schema_validation: bool = True,
    process_text_rules: bool = True,
) -> list[dict]:
    """ODCS-ish contract dict -> check metadata list.

    Expected shape::

        {"schema": [{"name": "orders", "properties": [
            {"name": "id", "type": "long", "required": True, "unique": True,
             "primaryKey": True},
            {"name": "email", "type": "string", "format": "email"},
            {"name": "qty", "type": "int",
             "logicalTypeOptions": {"minimum": 0, "maximum": 100}},
            {"name": "state", "type": "string",
             "quality": [{"type": "custom", "engine": "dqx",
                          "implementation": {"check": {
                              "function": "is_in_list",
                              "arguments": {"column": "state",
                                            "allowed": ["CA", "NY"]}}}}]},
            ...
        ]}]}

    ``text_rule_provider`` (optional): ``Callable[[description, schema_name,
    property_name|None], list[dict]]`` that turns a ``type: text`` quality
    expectation into check dicts — plug an LLM here
    (``dqx_spark.llm.generate_rules_with_llm`` composed with your
    provider), or a deterministic mapper in tests.
    """
    if not isinstance(contract, dict) or not isinstance(contract.get("schema", []), list):
        raise ODCSContractError("contract must be a dict with a 'schema' list")
    checks: list[dict] = []
    for obj in contract.get("schema", []):
        if not isinstance(obj, dict) or not isinstance(obj.get("properties", []), list):
            raise ODCSContractError(f"schema entries must be dicts with a 'properties' list, got {obj!r}")
        # reference :590 logs-and-skips unnamed fields rather than failing
        raw_props = [p for p in obj.get("properties", []) if isinstance(p, dict) and p.get("name")]
        # fold ODCS v3 logicalTypeOptions into a flat constraint view;
        # direct attributes win on conflict
        props = [{**(p.get("logicalTypeOptions") or {}), **p} for p in raw_props]
        # schema check from declared types: a physicalType is already a
        # Spark/UC DDL type and passes through verbatim (reference
        # _schema_object_to_ddl, contract_rules_generator.py:483); otherwise
        # the logical type name ('type' or ODCS 'logicalType') maps
        ddl_parts = []
        for p in props:
            phys = str(p.get("physicalType") or "").strip()
            composite_attempt = bool(_COMPOSITE_TYPE_RE.match(phys))
            if phys and (composite_attempt or _is_spark_ddl_type(phys)):
                # malformed declared types fail LOUDLY (decimal precision >
                # 38, scale > precision, bad or unterminated ARRAY/MAP/
                # STRUCT) — the reference raises instead of emitting broken
                # DDL; anything ARRAY/MAP/STRUCT-prefixed is a composite
                # ATTEMPT and never falls through to the logical fallback
                _validate_physical_type(phys)
                ddl_parts.append(f"{p['name']} {phys}")
                continue
            logical = p.get("type", p.get("logicalType", "string"))
            spark_type = _TYPE_TO_SPARK.get(str(logical).lower())
            if spark_type:
                ddl_parts.append(f"{p['name']} {spark_type}")
        if ddl_parts and generate_schema_validation:
            checks.append(
                {
                    "criticality": criticality,
                    "name": f"{obj.get('name', 'dataset')}_schema",
                    "check": {
                        "function": "has_valid_schema",
                        "arguments": {
                            "expected_schema": ", ".join(ddl_parts),
                            "strict": strict_schema_validation,
                        },
                    },
                }
            )
        pk = [p["name"] for p in props if p.get("primaryKey")]
        if pk and generate_predefined_rules:
            checks.append(
                {"criticality": criticality, "check": {"function": "is_unique", "arguments": {"columns": pk}}}
            )

        def walk(raw: list[dict], prefix: str):
            """Depth-first over nested ODCS properties: yields (dotted_path,
            folded_prop) for every named node — rules on nested object
            members address the struct field by its dotted column path,
            exactly as the reference's generator does
            (contract_rules_generator.py:569 column_path recursion)."""
            for rp in raw:
                if not (isinstance(rp, dict) and rp.get("name")):
                    continue
                folded = {**(rp.get("logicalTypeOptions") or {}), **rp}
                path = f"{prefix}{rp['name']}"
                yield path, folded
                nested = rp.get("properties")
                if isinstance(nested, list) and nested:
                    yield from walk(nested, f"{path}.")

        for name, p in walk(raw_props, ""):

            def add(function: str, arguments: dict | None = None, crit: str = criticality):
                if not generate_predefined_rules:
                    return
                args = {"column": name, **(arguments or {})}
                checks.append({"criticality": crit, "check": {"function": function, "arguments": args}})

            if p.get("required"):
                add("is_not_null")
            if generate_predefined_rules and p.get("unique") and pk != [name]:  # composite PK does not imply single-column uniqueness
                checks.append(
                    {"criticality": criticality, "check": {"function": "is_unique", "arguments": {"columns": [name]}}}
                )
            if p.get("pattern"):
                add("regex_match", {"regex": p["pattern"]})
            if p.get("enum"):
                add("is_in_list", {"allowed": list(p["enum"])})
            lo, hi = p.get("minimum"), p.get("maximum")
            if lo is not None and hi is not None:
                add("is_in_range", {"min_limit": lo, "max_limit": hi})
            elif lo is not None:
                add("is_not_less_than", {"limit": lo})
            elif hi is not None:
                add("is_not_greater_than", {"limit": hi})
            min_len, max_len = p.get("minLength"), p.get("maxLength")
            if generate_predefined_rules and (min_len is not None or max_len is not None):
                bounds = []
                if min_len is not None:
                    bounds.append(f"length({name}) >= {int(min_len)}")
                if max_len is not None:
                    bounds.append(f"length({name}) <= {int(max_len)}")
                # NULL passes length bounds (like every other generated
                # rule and JSON-Schema/ODCS semantics — nullability is
                # 'required''s job); sql_expression's default branch treats
                # a NULL expression as failed, so guard explicitly
                expr = f"{name} IS NULL OR ({' AND '.join(bounds)})"
                checks.append(
                    {
                        "criticality": criticality,
                        "name": f"{name}_length",
                        "check": {"function": "sql_expression", "arguments": {"expression": expr}},
                    }
                )
            # format semantics follow the logical type (reference
            # _generate_format_rules_from_options: date/timestamp formats
            # are PATTERNS and become is_valid_date/timestamp with the
            # pattern argument; anything else is ignored there).  The
            # pattern passes through verbatim — the checks accept both
            # Java/Spark and Python strftime spellings (row_checks.
            # _normalize_datetime_format).  Named string formats
            # (email/ipv4/uuid/...) are honored as an extension.
            fmt_raw = p.get("format")
            logical = str(p.get("type", p.get("logicalType", "string"))).lower()
            if fmt_raw is not None:
                fmt = str(fmt_raw)
                if logical == "date":
                    add("is_valid_date", {"date_format": fmt})
                elif logical in ("timestamp", "datetime"):
                    add("is_valid_timestamp", {"timestamp_format": fmt})
                elif fmt.lower() in _FORMAT_CHECKS:
                    add(_FORMAT_CHECKS[fmt.lower()])
                elif fmt.lower() == "uuid":
                    add("regex_match", {"regex": _UUID_PATTERN})
            if p.get("quality"):
                checks.extend(
                    _explicit_quality_rules(
                        p["quality"], obj.get("name", "dataset"), name, criticality,
                        text_rule_provider if process_text_rules else None,
                    )
                )
        if obj.get("quality"):
            checks.extend(
                _explicit_quality_rules(
                    obj["quality"], obj.get("name", "dataset"), None, criticality,
                    text_rule_provider if process_text_rules else None,
                )
            )
    return checks
