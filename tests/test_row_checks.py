"""Per-check unit tests over adversarial typed mini-fixtures (FIXTURES F5,
mirroring the reference's tests/unit/test_row_checks.py strategy: one small
createDataFrame per family, assert exactly which rows fire)."""

import pytest
from pyspark.sql import functions as F

import dqx_spark.functions as C
from dqx_spark import DQEngine, DQRowRule
from dqx_spark.engine import ExtraParams

RUN_TS = "2024-06-01 00:00:00"


def fired_ids(spark, df, rule, id_col="id"):
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [rule])
    return {r[id_col] for r in checked.where(F.col("_errors").isNotNull() | F.col("_warnings").isNotNull()).collect()}


# ---------------------------------------------------------------------------
# nulls and empties (F5.1)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def nulls_df(spark):
    return spark.createDataFrame(
        [(0, None), (1, ""), (2, "  "), (3, "x"), (4, None)],
        "id int, s string",
    )


def test_null_empty_family(spark, nulls_df):
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_not_null, column="s")) == {0, 4}
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_not_empty, column="s")) == {1}
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_not_null_and_not_empty, column="s")) == {0, 1, 4}
    assert fired_ids(
        spark, nulls_df,
        DQRowRule(check_func=C.is_not_null_and_not_empty, column="s", check_func_kwargs={"trim_strings": True}),
    ) == {0, 1, 2, 4}
    # inverted assertions
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_null, column="s")) == {1, 2, 3}
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_empty, column="s")) == {2, 3}
    assert fired_ids(spark, nulls_df, DQRowRule(check_func=C.is_null_or_empty, column="s")) == {2, 3}


def test_array_struct_map_fixture(spark):
    df = spark.createDataFrame(
        [
            (0, ["a"], {"f": 1}, {"k": 1}),
            (1, [], {"f": None}, {}),
            (2, None, None, None),
        ],
        "id int, arr array<string>, st struct<f:int>, mp map<string,int>",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_not_null_and_not_empty_array, column="arr")) == {1, 2}
    # struct dot-path access works as a column expression
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_not_null, column="st.f")) == {1, 2}


# ---------------------------------------------------------------------------
# comparisons / ranges / lists
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def nums_df(spark):
    return spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, 10.0), (3, None)], "id int, v double"
    )


def test_comparison_family(spark, nums_df):
    assert fired_ids(spark, nums_df, DQRowRule(check_func=C.is_not_less_than, column="v", check_func_kwargs={"limit": 5})) == {0}
    assert fired_ids(spark, nums_df, DQRowRule(check_func=C.is_not_greater_than, column="v", check_func_kwargs={"limit": 5})) == {2}
    assert fired_ids(spark, nums_df, DQRowRule(check_func=C.is_in_range, column="v", check_func_kwargs={"min_limit": 2, "max_limit": 7})) == {0, 2}
    assert fired_ids(spark, nums_df, DQRowRule(check_func=C.is_not_in_range, column="v", check_func_kwargs={"min_limit": 2, "max_limit": 7})) == {1}
    # limit as SQL expression referencing another column
    df2 = spark.createDataFrame([(0, 5, 3), (1, 2, 3)], "id int, v int, cap int")
    assert fired_ids(spark, df2, DQRowRule(check_func=C.is_not_greater_than, column="v", check_func_kwargs={"limit": "cap"})) == {0}
    # null-safe equality
    dfe = spark.createDataFrame([(0, None), (1, 7)], "id int, v int")
    assert fired_ids(spark, dfe, DQRowRule(check_func=C.is_equal_to, column="v", check_func_kwargs={"value": 7})) == {0}


def test_list_family(spark):
    df = spark.createDataFrame([(0, "A"), (1, "a"), (2, "Z"), (3, None)], "id int, s string")
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_in_list, column="s", check_func_kwargs={"allowed": ["A", "B"]})) == {1, 2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_in_list, column="s", check_func_kwargs={"allowed": ["A", "B"], "case_sensitive": False}),
    ) == {2}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_not_null_and_is_in_list, column="s", check_func_kwargs={"allowed": ["A"]})) == {1, 2, 3}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_not_in_list, column="s", check_func_kwargs={"forbidden": ["Z"]})) == {2}
    with pytest.raises(ValueError):
        C.is_in_list("s", [])


# ---------------------------------------------------------------------------
# strings / patterns (F5.3-ish)
# ---------------------------------------------------------------------------
def test_string_case(spark):
    df = spark.createDataFrame(
        [(0, "HELLO"), (1, "hello"), (2, "Hello World"), (3, "Hello world")], "id int, s string"
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.has_valid_string_case, column="s", check_func_kwargs={"case": "upper"})) == {1, 2, 3}
    assert fired_ids(spark, df, DQRowRule(check_func=C.has_valid_string_case, column="s", check_func_kwargs={"case": "lower"})) == {0, 2, 3}
    # initcap lowercases the tail: "HELLO" -> "Hello", so all-caps fails title
    assert fired_ids(spark, df, DQRowRule(check_func=C.has_valid_string_case, column="s", check_func_kwargs={"case": "title"})) == {0, 1, 3}
    with pytest.raises(ValueError):
        C.has_valid_string_case("s", case="screaming")


def test_network_fixture(spark):
    df = spark.createDataFrame(
        [
            (0, "192.168.1.1", "::1", "user@example.com"),
            (1, "256.1.1.1", "not-ipv6", "bad@@example"),
            (2, "10.0.0.7", "2001:db8::8a2e:370:7334", "a.b@c-d.org"),
            (3, None, None, None),
        ],
        "id int, ip4 string, ip6 string, email string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_ipv4_address, column="ip4")) == {1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_ipv6_address, column="ip6")) == {1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_email, column="email")) == {1}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_ipv4_address_in_cidr, column="ip4", check_func_kwargs={"cidr_block": "10.0.0.0/8"}),
    ) == {0, 1}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_ipv6_address_in_cidr, column="ip6", check_func_kwargs={"cidr_block": "2001:db8::/32"}),
    ) == {0, 1}
    with pytest.raises(ValueError):
        C.is_ipv4_address_in_cidr("ip4", "2001:db8::/32")


def test_iso_codes_fixture(spark):
    df = spark.createDataFrame(
        [(0, "US", "USD", "en", "US-CA"), (1, "XX", "XXZ", "zz", "XX-01"), (2, "de", "usd", "EN", "DE-BW"), (3, None, None, None, None)],
        "id int, country string, currency string, lang string, subdiv string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_country_code, column="country")) == {1, 2}
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.is_valid_country_code, column="country", check_func_kwargs={"case_sensitive": False})
    ) == {1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_currency_code, column="currency")) == {1, 2}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_language_code, column="lang")) == {1, 2}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_subdivision_code, column="subdiv")) == {1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_national_id, column="country")) == {0, 1, 2}


def test_json_fixture(spark):
    df = spark.createDataFrame(
        [
            (0, '{"id": 1, "name": "a"}'),
            (1, '{"id": 2}'),
            (2, "{broken"),
            (3, None),
            (4, '{"id": null, "name": "b"}'),
        ],
        "id int, j string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_json, column="j")) == {2}
    assert fired_ids(spark, df, DQRowRule(check_func=C.has_json_keys, column="j", check_func_kwargs={"keys": ["id", "name"]})) == {1, 2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_json_keys, column="j", check_func_kwargs={"keys": ["id", "name"], "require_all": False}),
    ) == {2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.has_valid_json_schema, column="j", check_func_kwargs={"schema": "id int not null, name string"}),
    ) == {2, 4}


# ---------------------------------------------------------------------------
# dates / freshness
# ---------------------------------------------------------------------------
def test_date_family(spark):
    df = spark.createDataFrame(
        [
            (0, "2024-01-01", "2024-01-10"),
            (1, "2024-01-09", "2024-01-10"),
            (2, "2024-01-11", "2024-01-10"),
            (3, "nope", "2024-01-10"),
        ],
        "id int, d1 string, d2 string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_valid_date, column="d1")) == {3}
    # malformed dates try_cast to null -> pass (catch them with is_valid_date)
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_older_than_col2_for_n_days, check_func_kwargs={"column1": "d1", "column2": "d2", "days": 5}),
    ) == {1, 2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_older_than_n_days, column="d1", check_func_kwargs={"days": 30, "curr_date": "2024-01-20"}),
    ) == {0, 1, 2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_not_in_future, column="d1", check_func_kwargs={"curr_timestamp": "2024-01-10 00:00:00"}),
    ) == {2}
    assert fired_ids(
        spark, df,
        DQRowRule(check_func=C.is_data_fresh, column="d1", check_func_kwargs={"max_age_minutes": 1440, "base_timestamp": "2024-01-10 12:00:00"}),
    ) == {0, 1}  # 01-09 00:00 is older than base - 1 day (01-09 12:00)


def test_sql_expression_and_filter(spark):
    df = spark.createDataFrame([(0, 1, "a"), (1, -1, "a"), (2, -1, "b")], "id int, v int, g string")
    # negate
    assert fired_ids(spark, df, DQRowRule(check_func=C.sql_expression, check_func_args=("v < 0",), check_func_kwargs={"negate": True})) == {1, 2}
    # rule-level filter: only group 'a' is checked
    assert fired_ids(
        spark, df, DQRowRule(check_func=C.sql_expression, check_func_args=("v > 0",), filter="g = 'a'")
    ) == {1}
    # regex negate
    assert fired_ids(spark, df, DQRowRule(check_func=C.regex_match, column="g", check_func_kwargs={"regex": "^a$", "negate": True})) == {0, 1}


def test_pii_and_geo_lite(spark):
    df = spark.createDataFrame(
        [
            (0, "call me at 555-123-4567 ok", "45.0", "120.0"),
            (1, "ssn 123-45-6789 leaked", "91.5", "-181.0"),
            (2, "clean text", "-90", "180"),
            (3, None, "abc", None),
        ],
        "id int, t string, lat string, lon string",
    )
    assert fired_ids(spark, df, DQRowRule(check_func=C.does_not_contain_pii, column="t")) == {0, 1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.does_not_contain_pii, column="t", check_func_kwargs={"entities": ["US_SSN"]})) == {1}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_latitude, column="lat")) == {1, 3}
    assert fired_ids(spark, df, DQRowRule(check_func=C.is_longitude, column="lon")) == {1}
    with pytest.raises(ValueError):
        C.does_not_contain_pii("t", entities=["NOT_AN_ENTITY"])


def test_pii_custom_analyzer_hook(spark):
    # stand-in for a Presidio AnalyzerEngine: flags free-text PII the regex
    # battery cannot see.  Defined as a closure so cloudpickle ships it by
    # value (a module-level test function is not importable on executors).
    def _fake_ner_analyzer(series):
        return series.map(lambda v: v is not None and "leaked" in v)

    df = spark.createDataFrame(
        [
            (0, "call me at 555-123-4567 ok"),
            (1, "ssn 123-45-6789 leaked"),
            (2, "clean text"),
            (3, None),
        ],
        "id int, t string",
    )
    rule = DQRowRule(
        check_func=C.does_not_contain_pii, column="t", check_func_kwargs={"analyzer": _fake_ner_analyzer}
    )
    assert fired_ids(spark, df, rule) == {1}


def test_presidio_analyzer_adapter():
    """The shipped Presidio adapter: real NER where the package exists, a
    clean install-hint ImportError where it doesn't (this container)."""
    import pandas as pd
    import pytest

    analyze = C.presidio_analyzer(entities=["US_SSN"])
    try:
        import presidio_analyzer  # noqa: F401

        have = True
    except ImportError:
        have = False
    series = pd.Series(["my ssn is 078-05-1120", "no pii here", None])
    if have:
        out = analyze(series)
        assert list(out.astype(bool)) == [True, False, False]
    else:
        with pytest.raises(ImportError, match="presidio-analyzer"):
            analyze(series)


def test_result_schema_exact(spark):
    """F5.6: exact result schema + split invariants."""
    from dqx_spark.schema import dq_result_schema

    df = spark.createDataFrame([(0,), (1,)], "id int")
    engine = DQEngine(extra_params=ExtraParams(run_time_overwrite=RUN_TS))
    checked = engine.apply_checks(df, [DQRowRule(check_func=C.is_not_null, column="id")])
    fields = {f.name: f.dataType for f in checked.schema.fields}
    # array_compact marks containsNull=False (stricter); element struct must
    # match the published schema exactly
    assert fields["_errors"].elementType == dq_result_schema.elementType
    assert fields["_warnings"].elementType == dq_result_schema.elementType
    good, bad = engine.get_valid(checked), engine.get_invalid(checked)
    assert good.count() + bad.count() == df.count()  # no warnings in this set


def test_ipv6_oracle_regex_matches_stdlib():
    """The DuckDB oracle twin of is_valid_ipv6_address is a pure-regex RFC
    4291 grammar; pin its equivalence to stdlib `ipaddress` (the UDF's
    authority) on zone-free addresses so regex and UDF can't drift apart."""
    import ipaddress
    import random
    import re

    from __spark_entry__ import _ipv6_regex

    pat = re.compile(_ipv6_regex())
    cases = [
        "::", "::1", "1::", "2001:db8::1", "::ffff:10.0.5.1", "::ffff:0:1.2.3.4",
        "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7:8:9", "1::2::3", ":::", ":", "",
        "1:2:3:4:5:6:1.2.3.4", "12345::", "g::1", "1:2:3:4:5:6:7::",
        "::2:3:4:5:6:7:8", "::1:2:3:4:5:1.2.3.4", "1::256.1.2.3",
        "::ffff:01.2.3.4", "1:2::1.2.3.4", "not-an-ip", "0:0:0:0:0:0:0:0",
        "1:2:3:4:5::1.2.3.4", "1:2:3:4:5:6::1.2.3.4", "1:2:3:4:5:6:7:1.2.3.4",
        "::1.2.3.4", "1.2.3.4", "0:ffff::1:ffff:0:1.2.3.4", "1:0:1::ffff:1.2.3.4",
    ]
    rng = random.Random(7)
    for _ in range(2000):
        parts = [
            rng.choice(["1", "0", "ab", "ffff", "12345", "1.2.3.4", "256.1.2.3", ""])
            for _ in range(rng.randint(1, 9))
        ]
        s = ":".join(parts)
        if rng.random() < 0.3:
            s = ":" + s
        if rng.random() < 0.3:
            s = s + ":"
        cases.append(s)
    for c in set(cases):
        try:
            ipaddress.IPv6Address(c)
            expected = True
        except ValueError:
            expected = False
        assert bool(pat.match(c)) == expected, c


def test_pii_credit_card_luhn_validation(spark):
    """CREDIT_CARD detection requires the Luhn checksum (pure Column
    arithmetic) — 16-digit order numbers no longer false-positive."""
    import dqx_spark.functions as C

    rows = [
        (1, "pay with 4111 1111 1111 1111 now"),       # Luhn-valid
        (2, "card 5500-0000-0000-0004 on file"),        # Luhn-valid (dashes)
        (3, "order 4111 1111 1111 1112 shipped"),       # fails Luhn
        (4, "tracking 1234 5678 9012 3456 ok"),         # fails Luhn
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.c is not None
        for r in df.select(
            "id", C.does_not_contain_pii("t", entities=["CREDIT_CARD"]).alias("c")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_pii_credit_card_windowed_formats(spark):
    """Cards are found at ANY offset inside a longer digit run and across
    the 13/15/16/19-digit network formats — but only windows starting at a
    valid network IIN prefix are Luhn-tested, so Luhn-valid junk with an
    unissued prefix does not fire."""
    import dqx_spark.functions as C

    rows = [
        (1, "ref 94111 1111 1111 11117 end"),     # valid Visa inside a 17-digit run
        (2, "visa13 4222222222222 old format"),   # 13-digit Visa
        (3, "amex 378282246310005 on file"),      # 15-digit Amex
        (4, "disc 6011111111111117 okay"),        # 16-digit Discover
        (5, "junk 1890831903000908 here"),        # Luhn-valid, prefix 1: no network
        (6, "serial 63608377835337406 x"),        # 17 digits, no card inside
        (7, "clean text"),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.c is not None
        for r in df.select(
            "id", C.does_not_contain_pii("t", entities=["CREDIT_CARD"]).alias("c")
        ).collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: True, 5: False, 6: False, 7: False, 8: False}


def test_pii_engine_selection(spark):
    """engine='auto' ladder: NER when presidio imports, regex fallback
    otherwise; explicit engines force their path."""
    import dqx_spark.functions as C
    from dqx_spark.functions.row_checks import _presidio_available

    df = spark.createDataFrame(
        [(0, "ssn 123-45-6789 leaked"), (1, "my name is John Smith and I live in Boston"), (2, "clean")],
        "id int, t string",
    )

    def fired(cond):
        return {r.id for r in df.select("id", cond.alias("c")).collect() if r.c is not None}

    # forced regex: structured PII only, deterministic everywhere
    assert fired(C.does_not_contain_pii("t", engine="regex")) == {0}
    with pytest.raises(ValueError, match="engine='regex' conflicts"):
        C.does_not_contain_pii("t", engine="regex", threshold=0.5)
    with pytest.raises(ValueError, match="unknown engine"):
        C.does_not_contain_pii("t", engine="nope")

    if _presidio_available():  # pragma: no cover - env-dependent
        # auto selects NER: free-text person names are caught
        assert 1 in fired(C.does_not_contain_pii("t"))
        assert fired(C.does_not_contain_pii("t", engine="ner")) >= {0, 1}
    else:
        # auto falls back to the regex battery (this container)
        assert fired(C.does_not_contain_pii("t")) == {0}
