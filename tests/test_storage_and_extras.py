"""Checks storage backends, message_expr, row-anomaly check."""

from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQDatasetRule, DQRowRule
from dqx_spark.checks_storage import FileChecksStorage, TableChecksStorage, checks_storage_factory
from dqx_spark.engine import ExtraParams

RUN_TS = "2024-06-01 00:00:00"

CHECKS = [
    {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "a"}}},
    {"criticality": "warn", "name": "named", "filter": "b > 0",
     "check": {"function": "is_in_list", "arguments": {"column": "c", "allowed": ["x", "y"]}}},
]


def test_file_storage_round_trip(tmp_path):
    for ext in ("yaml", "json"):
        path = str(tmp_path / f"checks.{ext}")
        storage = FileChecksStorage(path)
        storage.save(CHECKS)
        assert storage.load() == CHECKS
        storage.save([CHECKS[0]], mode="append")
        assert len(storage.load()) == 3
    assert isinstance(checks_storage_factory(None, path), FileChecksStorage)


def test_table_storage_round_trip(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS dq_checks_test")
    shutil.rmtree("/tmp/dqx_test_warehouse/dq_checks_test", ignore_errors=True)
    storage = TableChecksStorage(spark, "dq_checks_test", run_config_name="rc1")
    storage.save(CHECKS)
    loaded = storage.load()
    assert len(loaded) == 2
    named = next(c for c in loaded if c.get("name") == "named")
    assert named["filter"] == "b > 0"
    # another run config does not clobber rc1
    other = TableChecksStorage(spark, "dq_checks_test", run_config_name="rc2")
    other.save([CHECKS[0]])
    assert len(storage.load()) == 2
    assert len(other.load()) == 1
    spark.sql("DROP TABLE IF EXISTS dq_checks_test")


def test_jdbc_storage_surface(spark):
    # no JDBC driver ships in this environment, so exercise everything up to
    # the wire: factory dispatch, URL#table parsing, row serde round-trip
    import pytest

    from dqx_spark.checks_storage import JdbcChecksStorage, _check_to_row, _row_to_check

    st = checks_storage_factory(spark, "jdbc:postgresql://h:5432/dq#public.dqx_checks", "rc1")
    assert isinstance(st, JdbcChecksStorage)
    assert st.url == "jdbc:postgresql://h:5432/dq"
    assert st.table == "public.dqx_checks"
    assert st.run_config_name == "rc1"
    with pytest.raises(ValueError, match="jdbc-url.*#"):
        JdbcChecksStorage(spark, "jdbc:postgresql://h/dq")  # missing #table
    for c in CHECKS:
        row = _check_to_row(c, "rc1")
        assert row["run_config_name"] == "rc1"
        restored = _row_to_check(row)
        expected = {**c}
        expected.setdefault("criticality", "error")
        assert restored == expected


def test_cloud_files_translation():
    from dqx_spark.io import _translate_cloud_files

    fmt, opts = _translate_cloud_files(
        "cloudFiles",
        {
            "cloudFiles.format": "json",
            "cloudFiles.schemaLocation": "/tmp/sl",  # Databricks-only: dropped
            "cloudFiles.maxFilesPerTrigger": "5",
            "multiLine": "true",
        },
    )
    assert fmt == "json"
    assert opts == {"multiLine": "true", "maxFilesPerTrigger": "5"}
    # non-cloudFiles formats pass through untouched
    assert _translate_cloud_files("csv", {"header": "true"}) == ("csv", {"header": "true"})


def test_message_expr(spark):
    df = spark.createDataFrame([(1, "bad"), (2, "ok")], "id int, status string")
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    rule = DQRowRule(
        check_func=C.is_not_equal_to,
        column="status",
        check_func_kwargs={"value": F.lit("bad")},
        message_expr="concat('row ', cast(id AS string), ' has bad status')",
    )
    rows = {r["id"]: r for r in engine.apply_checks(df, [rule]).collect()}
    assert rows[1]["_errors"][0]["message"] == "row 1 has bad status"
    assert rows[2]["_errors"] is None
    # metadata path carries message_expr through
    meta = [{"criticality": "error", "message_expr": "concat('id=', cast(id AS string))",
             "check": {"function": "is_null", "arguments": {"column": "id"}}}]
    rows2 = engine.apply_checks_by_metadata(df, meta).collect()
    assert rows2[0]["_errors"][0]["message"].startswith("id=")


def test_row_anomalies(spark):
    rows = [(i, 100.0 + (i % 7), 50.0 + (i % 5)) for i in range(200)] + [(900, 10000.0, 52.0), (901, 101.0, -4000.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    rule = DQDatasetRule(
        check_func=C.has_no_row_anomalies, check_func_kwargs={"columns": ["x", "y"], "threshold": 3.5}
    )
    checked = engine.apply_checks(df, [rule])
    flagged = {r["id"]: r["_errors"][0]["message"] for r in checked.where(F.col("_errors").isNotNull()).collect()}
    assert set(flagged) == {900, 901}
    assert "worst column: x" in flagged[900]
    assert "worst column: y" in flagged[901]


def test_contract_rules_generator(spark):
    from dqx_spark.contracts import generate_rules_from_contract
    from dqx_spark.serde import validate_checks

    contract = {
        "schema": [
            {
                "name": "users",
                "properties": [
                    {"name": "id", "type": "long", "required": True, "primaryKey": True},
                    {"name": "email", "type": "string", "format": "email", "required": True},
                    {"name": "age", "type": "int", "minimum": 0, "maximum": 150},
                    {"name": "country", "type": "string", "enum": ["US", "DE"]},
                    {"name": "handle", "type": "string", "minLength": 3, "maxLength": 10, "pattern": "^[a-z]+$"},
                ],
            }
        ]
    }
    checks = generate_rules_from_contract(contract)
    assert not validate_checks(checks).has_errors
    funcs = [c["check"]["function"] for c in checks]
    assert funcs.count("is_unique") == 1 and "has_valid_schema" in funcs
    assert "is_valid_email" in funcs and "is_in_range" in funcs and "is_in_list" in funcs

    df = spark.createDataFrame(
        [(1, "a@b.com", 30, "US", "alice"), (2, "nope", 200, "XX", "B")],
        "id bigint, email string, age int, country string, handle string",
    )
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks_by_metadata(df, checks)
    rows = {r["id"]: r for r in checked.collect()}
    assert rows[1]["_errors"] is None
    bad_names = {e["function"] for e in rows[2]["_errors"]}
    assert {"is_valid_email", "is_in_range", "is_in_list", "regex_match", "sql_expression"} <= bad_names


def test_validate_checks_argument_types():
    """Type validation mirrors the reference checks_validator's
    argument-type tests: provably-wrong primitive types are flagged;
    Column-typed or un-checkable annotations never false-positive."""
    from dqx_spark.serde import validate_checks

    bad_days = [{"check": {"function": "is_older_than_n_days",
                           "arguments": {"column": "x", "days": "ten"}}}]
    errs = validate_checks(bad_days).errors
    assert len(errs) == 1 and "'days' expects int" in errs[0]

    bad_regex = [{"check": {"function": "regex_match",
                            "arguments": {"column": "x", "regex": 123}}}]
    assert "expects str" in validate_checks(bad_regex).errors[0]

    # int into float-annotated param is fine; bool into int is not
    ok_float = [{"check": {"function": "has_no_outliers",
                           "arguments": {"column": "x", "k": 3}}}]
    assert not validate_checks(ok_float).has_errors
    bad_bool = [{"check": {"function": "is_older_than_n_days",
                           "arguments": {"column": "x", "days": True}}}]
    assert validate_checks(bad_bool).has_errors

    # limit params also accept Column / str expressions -> never flagged
    ok_col_expr = [{"check": {"function": "is_not_greater_than",
                              "arguments": {"column": "x", "limit": "other_col"}}}]
    assert not validate_checks(ok_col_expr).has_errors

    # None is accepted only for Optional annotations
    ok_none = [{"check": {"function": "does_not_contain_pii",
                          "arguments": {"column": "x", "entities": None}}}]
    assert not validate_checks(ok_none).has_errors


def test_validate_checks_pep604_unions():
    from dqx_spark.serde import validate_checks

    # list[str] | None annotation: int provably wrong, list and None fine
    bad = [{"check": {"function": "does_not_contain_pii",
                      "arguments": {"column": "x", "entities": 7}}}]
    assert "expects list" in validate_checks(bad).errors[0]
    ok = [{"check": {"function": "does_not_contain_pii",
                     "arguments": {"column": "x", "entities": ["US_SSN"]}}}]
    assert not validate_checks(ok).has_errors


def test_contract_logical_type_options_and_quality_sections(spark):
    """ODCS v3 shapes (reference contract_rules_generator.py:617-668,
    1183-1259): constraints under logicalTypeOptions, explicit dqx-engine
    quality rules at property and schema level, and text expectations
    routed through the pluggable provider hook."""
    from dqx_spark.contracts import generate_rules_from_contract
    from dqx_spark.serde import validate_checks

    contract = {
        "schema": [
            {
                "name": "users",
                "properties": [
                    {
                        "name": "age",
                        "type": "int",
                        "logicalTypeOptions": {"minimum": 0, "maximum": 150},
                    },
                    {
                        # direct attribute wins over the nested one
                        "name": "qty",
                        "type": "int",
                        "minimum": 5,
                        "logicalTypeOptions": {"minimum": 1, "maxLength": 4},
                    },
                    {
                        "name": "state",
                        "type": "string",
                        "quality": [
                            {
                                "type": "custom",
                                "engine": "dqx",
                                "implementation": {
                                    "check": {
                                        "function": "is_in_list",
                                        "arguments": {"column": "state", "allowed": ["CA", "NY"]},
                                    }
                                },
                            },
                            # non-dqx engines are ignored, not errors
                            {"type": "custom", "engine": "soda", "implementation": {"x": 1}},
                        ],
                    },
                ],
                "quality": [
                    {
                        "type": "custom",
                        "engine": "dqx",
                        "implementation": {
                            "criticality": "warn",
                            "check": {"function": "is_unique", "arguments": {"columns": ["age", "state"]}},
                        },
                    },
                    {"type": "text", "description": "age must be even"},
                ],
            }
        ]
    }

    def fake_provider(description, schema_name, prop_name):
        assert description == "age must be even" and schema_name == "users" and prop_name is None
        return [{"check": {"function": "sql_expression", "arguments": {"expression": "age % 2 = 0"}}}]

    checks = generate_rules_from_contract(contract, text_rule_provider=fake_provider)
    assert not validate_checks(checks).has_errors
    funcs = [c["check"]["function"] for c in checks]
    # logicalTypeOptions range surfaced
    assert "is_in_range" in funcs
    # direct minimum=5 beat the nested minimum=1; maxLength folded in from options
    length_rules = [c for c in checks if c["check"]["function"] == "sql_expression" and "length" in str(c)]
    assert length_rules and "length(qty) <= 4" in length_rules[0]["check"]["arguments"]["expression"]
    not_less = [c for c in checks if c["check"]["function"] == "is_not_less_than"]
    assert not_less and not_less[0]["check"]["arguments"]["limit"] == 5
    # explicit property + schema rules with provenance
    explicit = [c for c in checks if c.get("user_metadata", {}).get("rule_type") == "contract_explicit"]
    assert {c["check"]["function"] for c in explicit} == {"is_in_list", "is_unique"}
    warn_rule = [c for c in explicit if c["check"]["function"] == "is_unique"][0]
    assert warn_rule["criticality"] == "warn" and warn_rule["user_metadata"]["schema"] == "users"
    prop_rule = [c for c in explicit if c["check"]["function"] == "is_in_list"][0]
    assert prop_rule["user_metadata"]["field"] == "state"
    # text expectation through the hook
    text = [c for c in checks if c.get("user_metadata", {}).get("rule_type") == "text_llm"]
    assert len(text) == 1 and text[0]["user_metadata"]["text_expectation"] == "age must be even"
    # the composed rule set actually runs
    df = spark.createDataFrame([(2, 3, "CA"), (151, 4, "TX")], "age int, qty int, state string")
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks_by_metadata(df, checks)
    rows = {r["age"]: r for r in checked.collect()}
    assert rows[2]["_errors"] is None or all(e["function"] != "is_in_list" for e in rows[2]["_errors"])
    bad = {e["function"] for e in rows[151]["_errors"]}
    assert {"is_in_range", "is_in_list", "sql_expression"} <= bad


def test_table_storage_missing_table_raises_check_download_error(spark):
    import pytest as _pytest

    from dqx_spark.checks_storage import TableChecksStorage
    from dqx_spark.errors import CheckDownloadError, InvalidCheckError

    with _pytest.raises(CheckDownloadError):
        TableChecksStorage(spark, "default.no_such_checks_table_xyz").load()
    # still catchable as its parent (and as ValueError)
    with _pytest.raises(InvalidCheckError):
        TableChecksStorage(spark, "default.no_such_checks_table_xyz").load()


def test_contract_generator_toggles_and_type_validation():
    """r6 reference-parity surface: generation toggles
    (generate_predefined_rules / generate_schema_validation /
    strict_schema_validation / process_text_rules) and recursive
    physicalType validation that raises instead of emitting broken DDL."""
    import pytest

    from dqx_spark.contracts import generate_rules_from_contract
    from dqx_spark.errors import InvalidPhysicalTypeError

    contract = {
        "schema": [
            {
                "name": "t",
                "properties": [
                    {"name": "id", "physicalType": "BIGINT", "required": True},
                    {"name": "tags", "physicalType": "ARRAY<STRING>"},
                    {"name": "amount", "physicalType": "DECIMAL(38,10)"},
                    {"name": "notes", "physicalType": "STRING",
                     "quality": [
                         {"type": "custom", "engine": "dqx",
                          "implementation": {"check": {"function": "is_not_null",
                                                       "arguments": {"column": "notes"}}}},
                         {"type": "text", "description": "notes should be english"},
                     ]},
                ],
            }
        ]
    }
    texts = []

    def provider(desc, schema_name, prop_name):
        texts.append(desc)
        return []

    # defaults: schema rule present with strict=True (reference default)
    rules = generate_rules_from_contract(contract, text_rule_provider=provider)
    schema_rules = [r for r in rules if r["check"]["function"] == "has_valid_schema"]
    assert len(schema_rules) == 1 and schema_rules[0]["check"]["arguments"]["strict"] is True
    assert "tags ARRAY<STRING>" in schema_rules[0]["check"]["arguments"]["expected_schema"]
    assert len(texts) == 1

    # strict passthrough
    rules = generate_rules_from_contract(contract, strict_schema_validation=False)
    assert [r for r in rules if r["check"]["function"] == "has_valid_schema"][0][
        "check"]["arguments"]["strict"] is False

    # schema validation off
    rules = generate_rules_from_contract(contract, generate_schema_validation=False)
    assert not [r for r in rules if r["check"]["function"] == "has_valid_schema"]

    # predefined off: explicit quality rules survive, is_not_null(id) does not
    rules = generate_rules_from_contract(contract, generate_predefined_rules=False)
    cols = [r["check"]["arguments"].get("column") for r in rules if r["check"]["function"] == "is_not_null"]
    assert cols == ["notes"]  # only the explicit quality rule

    # text processing off: provider not invoked
    texts.clear()
    generate_rules_from_contract(contract, text_rule_provider=provider, process_text_rules=False)
    assert texts == []

    # malformed physical types fail loudly
    def with_type(t):
        return {"schema": [{"name": "t", "properties": [{"name": "x", "physicalType": t}]}]}

    for bad in ["DECIMAL(39,2)", "DECIMAL(10,12)", "ARRAY<banana>", "MAP<INT>",
                "STRUCT<a INT>", "ARRAY<STRING", "INT(5)"]:
        with pytest.raises(InvalidPhysicalTypeError):
            generate_rules_from_contract(with_type(bad))
    # valid nested types pass
    for ok in ["ARRAY<ARRAY<INT>>", "MAP<STRING, ARRAY<INT>>", "STRUCT<a: INT, b: ARRAY<STRING>>",
               "DECIMAL(38,10)", "VARCHAR(20)", "uuid"]:  # 'uuid' -> logical fallback, no raise
        generate_rules_from_contract(with_type(ok))


def test_wheel_builds_and_contains_package(tmp_path):
    """r7 packaging (VERDICT r6 item 7): the stdlib wheel builder produces a
    PEP 427 wheel with every dqx_spark module, metadata from pyproject, and
    the console entry point — `pip install <wheel>` is what the venv smoke
    in COVERAGE.md verifies."""
    import sys
    import zipfile
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import build_wheel

    out = build_wheel.build(str(tmp_path))
    names = zipfile.ZipFile(out).namelist()
    assert "dqx_spark/__init__.py" in names
    assert "dqx_spark/functions/row_checks.py" in names
    assert "dqx_spark/pipeline/ann_local.py" in names
    assert any(n.endswith(".dist-info/METADATA") for n in names)
    meta = next(n for n in names if n.endswith(".dist-info/METADATA"))
    text = zipfile.ZipFile(out).read(meta).decode()
    assert "Name: dqx-spark" in text and "Requires-Dist: pyspark>=3.5" in text
    ep = zipfile.ZipFile(out).read(meta.replace("METADATA", "entry_points.txt")).decode()
    assert "dqx-spark = dqx_spark.cli:main" in ep


def test_package_version_matches_pyproject():
    """pyproject.toml is the single metadata source for the wheel;
    dqx_spark.__version__ must agree so runtime provenance (CLI, installed
    metadata, support triage) never disagrees with `pip show dqx-spark`."""
    import re
    from pathlib import Path

    import dqx_spark

    toml = (Path(__file__).resolve().parents[1] / "pyproject.toml").read_text()
    m = re.search(r'^version\s*=\s*"([^"]+)"', toml, re.M)
    assert m, "pyproject.toml must declare [project].version"
    assert dqx_spark.__version__ == m.group(1)
