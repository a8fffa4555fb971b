"""The strongest switching-user evidence: the REFERENCE repo's own YAML
check corpora (tests/resources/all_*.yaml — 126 checks covering the whole
declarative surface) validate, deserialize, and RUN through this engine on
data shaped like the reference's perf fixtures.

The corpora are loaded read-only from /root/reference at test time (never
copied into this repo); the whole module skips when the reference checkout
is absent, so the repo stays standalone.
"""

import glob
import os

import pytest
import yaml
from pyspark.sql import functions as F

from dqx_spark import DQEngine
from dqx_spark.engine import ExtraParams
from dqx_spark.serde import validate_checks

REF_RES = "/root/reference/tests/resources"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference checkout not available"
)

RUN_TS = "2024-06-01 00:00:00"


@pytest.fixture(scope="module", autouse=True)
def _ansi_off(spark):
    """The reference corpora were authored for ANSI-off Spark 3.x (e.g.
    comparing an int column to the SQL literal 'unknown'); Spark 4 defaults
    ANSI on, so mirror the reference runtime for this module only."""
    before = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield
    spark.conf.set("spark.sql.ansi.enabled", before)


def _engine():
    return DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS, run_id_overwrite="refc"))


def _load(name):
    with open(os.path.join(REF_RES, name), encoding="utf-8") as fh:
        return yaml.safe_load(fh)


def test_all_reference_corpora_validate():
    total = 0
    for p in sorted(glob.glob(os.path.join(REF_RES, "all_*checks.yaml"))):
        checks = yaml.safe_load(open(p, encoding="utf-8"))
        status = validate_checks(checks)
        assert not status.has_errors, f"{os.path.basename(p)}: {status}"
        total += len(checks)
    assert total >= 120


@pytest.fixture(scope="module")
def ref_shaped_df(spark):
    """Rows shaped like the reference perf fixture (conftest.py SCHEMA_STR)
    plus the extra columns the row corpus references."""
    rows = [
        (1, 10, 5, [1, 2], "2024-05-30", "2024-05-31 23:00:00", {"key1": 1}, (7,), 3,
         "192.168.1.10", "2001:db8::1", '{"key1": "a", "key2": "b"}', "POINT(4.90 52.37)",
         "US", "USD", "a@b.com", "en", "123-45-6789", "US-CA", '{"key1": "x"}',
         "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))", "POINT(1 1)", "LINESTRING(0 0, 1 1)",
         "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))", "MULTIPOINT((0 0), (1 1))",
         "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))",
         "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)))",
         "GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0, 1 1))"),
        (2, 20, 6, [3], "2024-05-20", "2024-05-25 12:00:00", {"key1": 2}, (8,), 4,
         "10.0.0.1", "2001:db8::2", '{"key1": "c", "key2": "d"}', "POINT(4.73 52.28)",
         "DE", "EUR", "c@d.org", "de", "987-65-4321", "DE-BY", '{"key1": "y"}',
         "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))", "POINT(11 11)",
         "LINESTRING(10 10, 11 11)", "POLYGON((10 10, 11 10, 11 11, 10 11, 10 10))",
         "MULTIPOINT((10 10))", "MULTILINESTRING((10 10, 11 11))",
         "MULTIPOLYGON(((10 10, 11 10, 11 11, 10 11, 10 10)))",
         "GEOMETRYCOLLECTION(POINT(11 11))"),
    ]
    schema = (
        "col1 int, col2 int, col3 int, col4 array<int>, col5 string, col6 string, "
        "col7 map<string,int>, col8 struct<field1:int>, col10 int, col_ipv4 string, "
        "col_ipv6 string, col_json_str string, col_geo_point string, col_country string, "
        "col_currency string, col_email string, col_language string, col_ssn string, "
        "col_subdivision string, col_json_str2 string, "
        "geom string, point_geom string, linestring_geom string, polygon_geom string, "
        "multipoint_geom string, multilinestring_geom string, multipolygon_geom string, "
        "geometrycollection_geom string"
    )
    return (
        spark.createDataFrame(rows, schema)
        .withColumn("col5", F.to_date("col5"))
        .withColumn("col6", F.to_timestamp("col6"))
    )


def test_reference_row_corpus_runs_end_to_end(spark, ref_shaped_df):
    checks = _load("all_row_checks.yaml")
    checked = _engine().apply_checks_by_metadata(ref_shaped_df, checks)
    rows = checked.collect()
    assert len(rows) == 2
    results = [e for r in rows for e in (r["_errors"] or []) + (r["_warnings"] or [])]
    # nothing was structurally skipped: every check resolved its columns
    skipped = [e["name"] for e in results if e["skipped"]]
    assert skipped == [], f"skipped: {skipped}"


def test_reference_dataset_corpus_runs_end_to_end(spark, ref_shaped_df):
    checks = _load("all_dataset_checks.yaml")
    ref_df = spark.createDataFrame([(1, 10, 5), (2, 20, 6)], "ref_col1 int, ref_col2 int, ref_col3 int")
    checked = _engine().apply_checks_by_metadata(
        ref_shaped_df, checks, ref_dfs={"ref_df_key": ref_df}
    )
    rows = checked.collect()
    assert len(rows) == 2
    results = [e for r in rows for e in (r["_errors"] or []) + (r["_warnings"] or [])]
    skipped = [e["name"] for e in results if e["skipped"]]
    assert skipped == [], f"skipped: {skipped}"


def test_reference_geo_corpora_run_end_to_end(spark, ref_shaped_df):
    geo = _load("all_row_geo_checks.yaml") + _load("all_dateset_geo_checks.yaml")
    checked = _engine().apply_checks_by_metadata(ref_shaped_df, geo)
    rows = checked.collect()
    assert len(rows) == 2
    results = [e for r in rows for e in (r["_errors"] or []) + (r["_warnings"] or [])]
    skipped = [e["name"] for e in results if e["skipped"]]
    assert skipped == [], f"skipped: {skipped}"


def test_reference_sample_datacontract_generates_and_runs(spark):
    """The reference's comprehensive ODCS v3 sample contract (two schemas,
    logicalTypeOptions, physicalType DDL, explicit dqx quality rules incl.
    for_each_column + filter, text expectations) generates valid rules that
    run end-to-end."""
    from dqx_spark.contracts import generate_rules_from_contract

    contract = yaml.safe_load(open(os.path.join(REF_RES, "sample_datacontract.yaml"), encoding="utf-8"))
    texts = []

    def provider(desc, schema_name, prop_name):
        texts.append((schema_name, prop_name))
        return []

    checks = generate_rules_from_contract(contract, text_rule_provider=provider)
    status = validate_checks(checks)
    assert not status.has_errors, str(status)
    assert len(checks) >= 30
    assert len(texts) == 4  # 3 property-level + 1 schema-level text expectations
    funcs = {c["check"]["function"] for c in checks}
    assert {"has_valid_schema", "is_in_range", "regex_match", "is_data_fresh_per_time_window",
            "is_not_null_and_not_empty", "sql_expression"} <= funcs
    # physicalType DDL passes through verbatim
    ddls = [c["check"]["arguments"]["expected_schema"] for c in checks
            if c["check"]["function"] == "has_valid_schema"]
    assert any("DECIMAL(5,2)" in d for d in ddls) and any("ARRAY<STRING>" in d for d in ddls)

    # the sensor_readings rules run on data shaped like the contract
    rows = [
        ("SENSOR-AB-0001", "MACHINE-A1B2C3", "2024-06-01 00:30:00", "2024-05-01",
         21.5, 40.0, 1.2, 3, "active", "low", "NYC-FL-001", "AB1234-X",
         None, "TECH-00001", False, "ops@example.com"),
        ("bad id", "nope", "2024-06-01 00:45:00", "2024-07-01",
         500.0, 150.0, 0.0, 99, "broken", "unknown", "x", "nope",
         "n" * 501, "nope", True, "not-an-email"),
    ]
    schema = (
        "sensor_id string, machine_id string, reading_timestamp string, calibration_date string, "
        "temperature_celsius double, humidity_percentage double, pressure_bar double, "
        "vibration_level int, sensor_status string, alert_level string, location string, "
        "device_model string, notes string, technician_id string, is_anomaly boolean, "
        "alert_email string"
    )
    df = (
        spark.createDataFrame(rows, schema)
        .withColumn("reading_timestamp", F.to_timestamp("reading_timestamp"))
        .withColumn("calibration_date", F.to_date("calibration_date"))
    )
    sensor_checks = [
        c for c in checks
        if c.get("name") != "all_data_types_schema" and c["check"]["function"] != "has_valid_schema"
    ]
    checked = _engine().apply_checks_by_metadata(df, sensor_checks)
    got = {r["sensor_id"]: r for r in checked.collect()}
    # the contract is deliberately self-contradictory on sensor_id (the
    # pattern admits exactly 14 characters, minLength demands 15), so the
    # otherwise-clean row fails precisely that one generated rule
    clean_errors = {e["name"] for e in got["SENSOR-AB-0001"]["_errors"]}
    assert clean_errors == {"sensor_id_length"}
    bad = {e["function"] for e in got["bad id"]["_errors"]}
    assert {"regex_match", "is_in_range", "sql_expression"} <= bad


def test_second_odcs_contract_covers_remaining_shapes(spark):
    """Second end-to-end contract (r6): the property shapes the reference
    sample does NOT exercise, mirrored from the reference generator's own
    unit-test corpus (test_datacontract_generator.py): nested objects with
    dotted column paths, date/timestamp logicalTypeOptions.format in BOTH
    Java and Python strftime spellings, format ignored on string types,
    single-sided minimum / maximum, minLength-only / maxLength-only, enum,
    uuid format, the unique flag, and a second schema object.  Generated
    rules run through the real engine on shaped data with exact expected
    fire-sets — zero divergence from the reference's documented semantics."""
    from dqx_spark.contracts import generate_rules_from_contract

    contract = {
        "schema": [
            {
                "name": "shipments",
                "properties": [
                    {"name": "shipment_id", "physicalType": "STRING", "logicalType": "string",
                     "required": True, "unique": True,
                     "logicalTypeOptions": {"format": "uuid"}},
                    {"name": "ship_date", "physicalType": "STRING", "logicalType": "date",
                     "logicalTypeOptions": {"format": "yyyy-MM-dd"}},          # Java pattern
                    {"name": "delivered_at", "physicalType": "STRING", "logicalType": "timestamp",
                     # Python strftime, ISO 'T' spelling: the unquoted
                     # literal 'T' used to crash Spark at task time (r6
                     # ADVICE high) — this pins the end-to-end fix
                     "logicalTypeOptions": {"format": "%Y-%m-%dT%H:%M:%S"}},
                    {"name": "status", "physicalType": "STRING", "logicalType": "string",
                     "enum": ["pending", "shipped", "delivered"],
                     # format on a string logical type must be IGNORED
                     # (reference _generate_format_rules_from_options warns+skips)
                     "logicalTypeOptions": {"format": "yyyy-MM-dd"}},
                    {"name": "weight_kg", "physicalType": "DOUBLE", "logicalType": "number",
                     "logicalTypeOptions": {"minimum": 0}},                    # one-sided min
                    {"name": "priority", "physicalType": "INT", "logicalType": "integer",
                     "logicalTypeOptions": {"maximum": 5}},                    # one-sided max
                    {"name": "carrier_code", "physicalType": "STRING", "logicalType": "string",
                     "logicalTypeOptions": {"minLength": 2}},                  # minLength only
                    {"name": "notes", "physicalType": "STRING", "logicalType": "string",
                     "logicalTypeOptions": {"maxLength": 10}},                 # maxLength only
                    {"name": "consignee", "physicalType": "BINARY", "logicalType": "object",
                     "required": True,
                     "properties": [
                         {"name": "name", "physicalType": "STRING", "logicalType": "string",
                          "required": True},
                         {"name": "address", "physicalType": "BINARY", "logicalType": "object",
                          "properties": [
                              {"name": "zipcode", "physicalType": "STRING", "logicalType": "string",
                               "logicalTypeOptions": {"pattern": "^[0-9]{5}$"}},
                          ]},
                     ]},
                ],
            },
            {
                "name": "carriers",
                "properties": [
                    {"name": "code", "physicalType": "STRING", "logicalType": "string",
                     "required": True, "primaryKey": True},
                ],
            },
        ]
    }
    checks = generate_rules_from_contract(contract)
    status = validate_checks(checks)
    assert not status.has_errors, str(status)

    by_fn: dict[str, list] = {}
    for c in checks:
        by_fn.setdefault(c["check"]["function"], []).append(c["check"]["arguments"])
    # nested dotted paths reach every level (reference column_path recursion)
    notnull_cols = {a["column"] for a in by_fn["is_not_null"]}
    assert {"shipment_id", "consignee", "consignee.name"} <= notnull_cols
    pattern_cols = {a["column"] for a in by_fn["regex_match"]}
    assert "consignee.address.zipcode" in pattern_cols
    assert any("column" in a and a["column"] == "shipment_id" for a in by_fn["regex_match"])  # uuid
    # format semantics by logical type: patterns pass through verbatim,
    # string-type format generates NO date rule
    assert by_fn["is_valid_date"] == [{"column": "ship_date", "date_format": "yyyy-MM-dd"}]
    assert by_fn["is_valid_timestamp"] == [
        {"column": "delivered_at", "timestamp_format": "%Y-%m-%dT%H:%M:%S"}
    ]
    # one-sided bounds pick the single-comparator checks
    assert by_fn["is_not_less_than"] == [{"column": "weight_kg", "limit": 0}]
    assert by_fn["is_not_greater_than"] == [{"column": "priority", "limit": 5}]
    # unique flag and second-schema primaryKey
    unique_sets = [tuple(a["columns"]) for a in by_fn["is_unique"]]
    assert ("shipment_id",) in unique_sets and ("code",) in unique_sets

    # end-to-end on shaped rows: one clean, one violating every shape
    schema = (
        "shipment_id string, ship_date string, delivered_at string, status string, "
        "weight_kg double, priority int, carrier_code string, notes string, "
        "consignee struct<name: string, address: struct<zipcode: string>>"
    )
    rows = [
        ("123e4567-e89b-12d3-a456-426614174000", "2024-06-01", "2024-06-02T10:30:00",
         "shipped", 12.5, 3, "UP", "ok", {"name": "Ada", "address": {"zipcode": "10001"}}),
        ("not-a-uuid", "06/01/2024", "yesterday",
         "lost", -2.0, 9, "U", "waaaaay too long", {"name": None, "address": {"zipcode": "ABCDE"}}),
    ]
    df = spark.createDataFrame(rows, schema)
    # shipments rules only: the carriers-schema rules reference a column the
    # shipments frame doesn't have and would be recorded as skipped entries
    runnable = [
        c for c in checks
        if c["check"]["function"] != "has_valid_schema" and "code" not in str(c["check"]["arguments"])
    ]
    checked = _engine().apply_checks_by_metadata(df, runnable)
    got = {r["shipment_id"]: r for r in checked.collect()}
    clean = got["123e4567-e89b-12d3-a456-426614174000"]
    assert clean["_errors"] is None, [e["name"] for e in clean["_errors"] or []]
    bad_fns = {e["function"] for e in got["not-a-uuid"]["_errors"]}
    assert {
        "regex_match", "is_valid_date", "is_valid_timestamp", "is_in_list",
        "is_not_less_than", "is_not_greater_than", "sql_expression", "is_not_null",
    } <= bad_fns
    # the strftime-format timestamp rule actually PARSES the valid value
    # (the raw '%Y-…' string would be an invalid Spark pattern) and the
    # dotted-path rule fired on the nested null
    bad_names = {e["name"] for e in got["not-a-uuid"]["_errors"]}
    assert "delivered_at_is_valid_timestamp" in bad_names
    assert "consignee_name_is_not_null" in bad_names


def test_check_function_signatures_match_reference_contract():
    """Positional-call compatibility: the reference repo pins every public
    check function's parameter order in its signature-contract test
    (tests/unit/test_check_func_signatures.py EXPECTED_PARAMETER_ORDER).
    Parse that dict via ast (read-only, no databricks import) and assert
    each function exists here with the reference's parameters as a PREFIX
    of ours in the same order — so any reference call site, positional or
    keyword, runs unchanged; our extensions (strategy=, approx=, engine=,
    broadcast_stats=, ...) may only append after the shared prefix."""
    import ast
    import inspect

    import dqx_spark.functions as C

    src_path = "/root/reference/tests/unit/test_check_func_signatures.py"
    expected = None
    for node in ast.walk(ast.parse(open(src_path, encoding="utf-8").read())):
        if isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == "EXPECTED_PARAMETER_ORDER":
            expected = ast.literal_eval(node.value)
    assert expected and len(expected) >= 80, "reference contract not found"

    missing, mismatched = [], []
    for fn_name, params in expected.items():
        fn = getattr(C, fn_name, None)
        if fn is None:
            missing.append(fn_name)
            continue
        mine = list(inspect.signature(fn).parameters)
        if tuple(mine[: len(params)]) != tuple(params):
            mismatched.append((fn_name, tuple(mine[: len(params)]), tuple(params)))
    assert not missing, f"reference check functions absent: {missing}"
    assert not mismatched, "parameter-order drift vs reference:\n" + "\n".join(map(str, mismatched))
