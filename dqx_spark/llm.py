"""LLM-assisted rule generation and primary-key detection — the pluggable
protocol surface of the reference's llm module (llm/llm_core.py:148-343,
llm/llm_pk_detector.py), with the model call INJECTED rather than bundled.

No LLM runtime ships here (none exists in this environment, and the
reference's coupling to a hosted endpoint is exactly what a library
shouldn't hard-code).  Instead every entry point takes a ``provider``:

    provider: Callable[[str], str]     # prompt in, completion text out

Any client satisfies it::

    def provider(prompt: str) -> str:
        return my_llm_client.complete(prompt)   # openai, local model, ...

Everything around the call is real and tested with deterministic fake
providers: prompt construction from schema + profile evidence, JSON
extraction, retry-with-error-feedback, rule validation against the check
registry, and Spark-side verification of LLM-proposed primary keys.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_rules_prompt",
    "generate_rules_with_llm",
    "build_pk_prompt",
    "detect_primary_keys_with_llm",
]

_RULES_INSTRUCTIONS = """You are a data-quality engineer. Given the table
schema, column statistics and sample rows below, propose data-quality checks
as a JSON array. Each element must be:
{"criticality": "error"|"warn",
 "check": {"function": <name>, "arguments": {...}}}
Use only these check functions: %s.
Return ONLY the JSON array, no prose."""


def _profile_evidence(df: DataFrame, columns: list[str] | None, sample_rows: int) -> str:
    """Schema + per-column null/distinct stats + a few sample rows, in one
    aggregate pass (approx_count_distinct; no full shuffles)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__d_{c}"))
    aggs.append(F.count(F.lit(1)).alias("__rows"))
    stats = df.agg(*aggs).collect()[0]
    lines = [f"rows: {stats['__rows']}", "columns:"]
    for c in cols:
        dtype = dict(df.dtypes)[c]
        lines.append(f"  - {c} ({dtype}): nulls={stats[f'__n_{c}']}, approx_distinct={stats[f'__d_{c}']}")
    sample = df.select(*cols).limit(sample_rows).collect()
    lines.append("sample rows:")
    for r in sample:
        lines.append("  " + json.dumps({c: str(r[c]) for c in cols}))
    return "\n".join(lines)


def build_rules_prompt(
    df: DataFrame, columns: list[str] | None = None, sample_rows: int = 10, user_input: str = ""
) -> str:
    """The exact prompt ``generate_rules_with_llm`` sends (exposed for
    audit/debugging, mirroring the reference's prompt-template surface).
    ``user_input`` appends the caller's natural-language requirements
    (reference generator.py:107 user_input steering)."""
    import dqx_spark.functions  # noqa: F401  (populates the check registry)
    from dqx_spark.rule import CHECK_FUNC_REGISTRY

    header = _RULES_INSTRUCTIONS % ", ".join(sorted(CHECK_FUNC_REGISTRY))
    prompt = f"{header}\n\n{_profile_evidence(df, columns, sample_rows)}"
    if user_input:
        prompt = f"{prompt}\n\nUser requirements (follow these when choosing checks):\n{user_input}"
    return prompt


def _extract_json(text: str):
    """First JSON array/object in a completion (models love prose + fences)."""
    fenced = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
    if fenced:
        text = fenced.group(1)
    start = min((i for i in (text.find("["), text.find("{")) if i >= 0), default=-1)
    if start < 0:
        raise ValueError("no JSON found in completion")
    # raw_decode tolerates trailing prose after the JSON value ("Hope this
    # helps!") — json.loads would reject the whole completion as Extra data
    value, _end = json.JSONDecoder().raw_decode(text[start:])
    return value


def generate_rules_with_llm(
    df: DataFrame,
    provider: Callable[[str], str],
    columns: list[str] | None = None,
    sample_rows: int = 10,
    max_attempts: int = 3,
    user_input: str = "",
) -> list[dict]:
    """Prompt -> completion -> JSON checks -> registry validation, with up
    to ``max_attempts`` retry rounds that feed the validation errors back to
    the model (reference llm_core.py:148-343's generate-validate loop).
    Returns validated check dicts ready for ``DQEngine.apply_checks`` via
    ``serde.deserialize_checks``."""
    from dqx_spark.serde import validate_checks

    prompt = build_rules_prompt(df, columns, sample_rows, user_input=user_input)
    last_err = None
    for _ in range(max_attempts):
        completion = provider(prompt)
        try:
            checks = _extract_json(completion)
            if not isinstance(checks, list):
                raise ValueError(f"expected a JSON array of checks, got {type(checks).__name__}")
            status = validate_checks(checks)
            if status.has_errors:
                raise ValueError(str(status))
            return checks
        except (ValueError, json.JSONDecodeError) as e:  # noqa: PERF203
            last_err = e
            prompt = f"{prompt}\n\nYour previous answer was invalid: {e}\nReturn ONLY a corrected JSON array."
    raise ValueError(f"LLM did not produce valid checks after {max_attempts} attempts: {last_err}")


_PK_INSTRUCTIONS = """Given the table schema and column statistics below,
propose candidate primary keys as a JSON array of column-name arrays,
most likely first, e.g. [["id"], ["order_id", "line_number"]].
Return ONLY the JSON array."""


def build_pk_prompt(df: DataFrame, columns: list[str] | None = None) -> str:
    return f"{_PK_INSTRUCTIONS}\n\n{_profile_evidence(df, columns, sample_rows=5)}"


def detect_primary_keys_with_llm(
    df: DataFrame,
    provider: Callable[[str], str],
    columns: list[str] | None = None,
    max_attempts: int = 3,
) -> list[str] | None:
    """LLM proposes candidate keys from profile evidence; Spark VERIFIES
    them (exact count vs count-distinct — one aggregate per candidate) and
    the first actually-unique candidate wins (reference
    llm_pk_detector.py's propose-then-verify loop).  Returns None when no
    candidate verifies."""
    prompt = build_pk_prompt(df, columns)
    candidates: list[list[str]] = []
    last_err = None
    for _ in range(max_attempts):
        try:
            raw = _extract_json(provider(prompt))
            if not isinstance(raw, list) or not all(isinstance(c, list) and c for c in raw):
                raise ValueError("expected a JSON array of non-empty column-name arrays")
            known = set(df.columns)
            candidates = [c for c in raw if set(c) <= known]
            if not candidates:
                # structurally valid but hallucinated/empty: feed the
                # unknown names back and RETRY — breaking here would waste
                # the correction loop that exists for exactly this case
                bad = sorted({c for cols in raw for c in cols if c not in known})
                raise ValueError(
                    f"no candidate uses only existing columns; unknown columns: {bad}; "
                    f"existing columns: {sorted(known)}"
                )
            break
        except (ValueError, json.JSONDecodeError) as e:  # noqa: PERF203
            last_err = e
            prompt = f"{prompt}\n\nYour previous answer was invalid: {e}\nReturn ONLY a corrected JSON array."
    else:
        raise ValueError(f"LLM did not produce candidates after {max_attempts} attempts: {last_err}")
    for cand in candidates:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(c) for c in cand]).alias("d"),
            *[F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}") for c in cand],
        ).collect()[0]
        if row["n"] == row["d"] and all(row[f"__n_{c}"] == 0 for c in cand):
            return list(cand)
    return None
