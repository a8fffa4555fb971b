"""LLM protocol surface with deterministic fake providers: prompt content,
JSON extraction, retry-with-feedback, validation, PK verify loop."""

import json

import pytest

from dqx_spark import llm


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, i % 7, f"u{i}@example.com", None if i % 5 == 0 else "x") for i in range(50)],
        "id long, grp long, email string, note string",
    )


def test_prompt_contains_evidence(df):
    p = llm.build_rules_prompt(df)
    assert "rows: 50" in p
    assert "email (string)" in p
    assert "is_not_null" in p  # registry advertised to the model
    assert "sample rows:" in p


def test_generate_rules_happy_path(df):
    checks = [
        {"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "id"}}},
        {"criticality": "warn", "check": {"function": "is_valid_email", "arguments": {"column": "email"}}},
    ]

    def provider(prompt):
        return "Here you go:\n```json\n" + json.dumps(checks) + "\n```"

    assert llm.generate_rules_with_llm(df, provider) == checks


def test_generate_rules_retry_feedback(df):
    calls = []

    def provider(prompt):
        calls.append(prompt)
        if len(calls) == 1:
            return "not json at all"
        if len(calls) == 2:
            # valid JSON, bogus function name -> validation error fed back
            return json.dumps([{"criticality": "error", "check": {"function": "no_such_check", "arguments": {}}}])
        return json.dumps([{"criticality": "error", "check": {"function": "is_not_null", "arguments": {"column": "id"}}}])

    out = llm.generate_rules_with_llm(df, provider, max_attempts=3)
    assert out[0]["check"]["function"] == "is_not_null"
    assert len(calls) == 3
    assert "previous answer was invalid" in calls[1]
    assert "no_such_check" in calls[2]


def test_generate_rules_gives_up(df):
    with pytest.raises(ValueError, match="did not produce valid checks"):
        llm.generate_rules_with_llm(df, lambda p: "garbage", max_attempts=2)


def test_pk_detection_verifies_candidates(df):
    # model proposes a non-unique key first; Spark verification rejects it
    # and accepts the truly-unique second candidate
    def provider(prompt):
        return json.dumps([["grp"], ["id"], ["email"]])

    assert llm.detect_primary_keys_with_llm(df, provider) == ["id"]


def test_pk_detection_rejects_nullable_and_returns_none(spark):
    d = spark.createDataFrame([(1, None), (2, "a"), (2, "b")], "k long, v string")

    def provider(prompt):
        return json.dumps([["k"], ["v"]])  # k not unique; v nullable

    assert llm.detect_primary_keys_with_llm(d, provider) is None
