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
"""

from __future__ import annotations

_FORMAT_CHECKS = {
    "email": "is_valid_email",
    "ipv4": "is_valid_ipv4_address",
    "ipv6": "is_valid_ipv6_address",
    "date": "is_valid_date",
    "timestamp": "is_valid_timestamp",
}
_UUID_PATTERN = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

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


def generate_rules_from_contract(contract: dict, criticality: str = "error") -> list[dict]:
    """ODCS-ish contract dict -> check metadata list.

    Expected shape::

        {"schema": [{"name": "orders", "properties": [
            {"name": "id", "type": "long", "required": True, "unique": True,
             "primaryKey": True},
            {"name": "email", "type": "string", "format": "email"},
            {"name": "qty", "type": "int", "minimum": 0, "maximum": 100},
            ...
        ]}]}
    """
    checks: list[dict] = []
    for obj in contract.get("schema", []):
        props = obj.get("properties", [])
        # schema check from declared types
        ddl_parts = []
        for p in props:
            spark_type = _TYPE_TO_SPARK.get(str(p.get("type", "string")).lower())
            if spark_type:
                ddl_parts.append(f"{p['name']} {spark_type}")
        if ddl_parts:
            checks.append(
                {
                    "criticality": criticality,
                    "name": f"{obj.get('name', 'dataset')}_schema",
                    "check": {
                        "function": "has_valid_schema",
                        "arguments": {"expected_schema": ", ".join(ddl_parts)},
                    },
                }
            )
        pk = [p["name"] for p in props if p.get("primaryKey")]
        if pk:
            checks.append(
                {"criticality": criticality, "check": {"function": "is_unique", "arguments": {"columns": pk}}}
            )
        for p in props:
            name = p["name"]

            def add(function: str, arguments: dict | None = None, crit: str = criticality):
                args = {"column": name, **(arguments or {})}
                checks.append({"criticality": crit, "check": {"function": function, "arguments": args}})

            if p.get("required"):
                add("is_not_null")
            if p.get("unique") and pk != [name]:  # composite PK does not imply single-column uniqueness
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
            if min_len is not None or max_len is not None:
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
            fmt = str(p.get("format", "")).lower()
            if fmt in _FORMAT_CHECKS:
                add(_FORMAT_CHECKS[fmt])
            elif fmt == "uuid":
                add("regex_match", {"regex": _UUID_PATTERN})
    return checks
