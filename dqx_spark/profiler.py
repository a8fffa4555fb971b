"""Profiler: infer data-quality rule candidates from data.

Semantics derived from the reference ``profiler/profiler.py`` (sampling,
summary stats, per-column metrics, nested struct flattening),
``profiler/profile_builder.py`` (builder chain: null/empty -> is_in ->
min_max -> outliers) and ``profiler/generator.py`` (profile -> rule
metadata).  All statistics come from Spark aggregates — one ``summary()``
pass plus one aggregate pass per profiled batch of columns; approximate
quantiles for outlier bands.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class DQProfile:
    """A rule candidate inferred from data (reference profiler/profile.py:10-17)."""

    name: str
    column: str
    description: str | None = None
    parameters: dict[str, Any] = field(default_factory=dict)
    filter: str | None = None


DEFAULT_OPTIONS: dict[str, Any] = {
    "sample_fraction": 0.3,
    "sample_seed": 42,
    "limit": 1000,
    "round": True,
    "max_in_count": 10,          # emit is_in_list when distinct <= this
    "distinct_ratio": 0.05,      # ...and distinct/count below this
    "max_null_ratio": 0.01,      # emit is_not_null when null ratio below this
    "remove_outliers": True,     # min/max from trimmed quantiles
    "outlier_columns": [],       # restrict outlier profiling; [] = all numeric
    "num_sigmas": 3.0,
    "trim_strings": True,
    "max_empty_ratio": 0.01,
}

_NUMERIC_TYPES = (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.FloatType, T.DoubleType, T.DecimalType)


def flatten_fields(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    """Recursive struct walk -> dotted field names
    (reference profiler/profiler.py:620-638)."""
    out: list[tuple[str, T.DataType]] = []
    for f_ in schema.fields:
        name = f"{prefix}{f_.name}"
        if isinstance(f_.dataType, T.StructType):
            out.extend(flatten_fields(f_.dataType, prefix=f"{name}."))
        else:
            out.append((name, f_.dataType))
    return out


class DQProfiler:
    """profile(df) -> (summary_stats, [DQProfile])."""

    def __init__(self, options: dict[str, Any] | None = None):
        self.options = {**DEFAULT_OPTIONS, **(options or {})}

    def _sample(self, df: DataFrame) -> DataFrame:
        opts = self.options
        if opts.get("filter"):
            df = df.filter(opts["filter"])
        if opts.get("stratified_column") and opts.get("stratified_fractions"):
            # stratified sampling per key (reference profiler.py:335-414 sampleBy)
            df = df.sampleBy(
                opts["stratified_column"], opts["stratified_fractions"], seed=opts.get("sample_seed", 42)
            )
        elif opts.get("sample_fraction") and opts["sample_fraction"] < 1.0:
            df = df.sample(fraction=opts["sample_fraction"], seed=opts.get("sample_seed", 42))
        if opts.get("limit"):
            df = df.limit(int(opts["limit"]))
        return df

    def profile(
        self, df: DataFrame, columns: list[str] | None = None
    ) -> tuple[dict[str, dict[str, Any]], list[DQProfile]]:
        sample = self._sample(df)
        fields = flatten_fields(df.schema)
        if columns:
            wanted = set(columns)
            fields = [(n, t) for n, t in fields if n in wanted]

        # one aggregate pass for all per-column metrics
        aggs: list = [F.count(F.lit(1)).alias("__total")]
        for name, dtype in fields:
            col = F.col(name)
            safe = name.replace(".", "__")
            aggs.append(F.count(col).alias(f"{safe}__count"))
            aggs.append(F.approx_count_distinct(col).alias(f"{safe}__distinct"))
            if isinstance(dtype, T.StringType):
                aggs.append(F.count(F.when(F.trim(col) == "", 1)).alias(f"{safe}__empty"))
            if isinstance(dtype, _NUMERIC_TYPES):
                aggs.extend(
                    [
                        F.min(col).alias(f"{safe}__min"),
                        F.max(col).alias(f"{safe}__max"),
                        F.avg(col).alias(f"{safe}__mean"),
                        F.stddev(col).alias(f"{safe}__stddev"),
                    ]
                )
            if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
                aggs.extend([F.min(col).alias(f"{safe}__min"), F.max(col).alias(f"{safe}__max")])
        # trimmed quantiles need a SECOND action over the sample — pin the
        # sample first, or the unordered limit()/sample() re-draws different
        # rows per action and the quantile bands can disagree with the
        # stats pass (min_max rules outside the reported min/max)
        numeric = [n for n, t in fields if isinstance(t, _NUMERIC_TYPES)]
        if self.options["outlier_columns"]:
            numeric = [n for n in numeric if n in set(self.options["outlier_columns"])]
        two_actions = bool(numeric) and self.options["remove_outliers"]
        if two_actions:
            sample = sample.localCheckpoint(eager=False)

        row = sample.agg(*aggs).collect()[0].asDict()
        total = row["__total"]

        # trimmed quantiles for numeric outlier bands, one approxQuantile call
        quantiles: dict[str, list[float]] = {}
        if two_actions:
            flat = sample.select([F.col(n).cast("double").alias(n.replace(".", "__")) for n in numeric])
            qs = flat.approxQuantile([n.replace(".", "__") for n in numeric], [0.01, 0.25, 0.5, 0.75, 0.99], 0.01)
            quantiles = dict(zip(numeric, qs))

        stats: dict[str, dict[str, Any]] = {}
        profiles: list[DQProfile] = []
        for name, dtype in fields:
            safe = name.replace(".", "__")
            col_stats = {k[len(safe) + 2 :]: v for k, v in row.items() if k.startswith(f"{safe}__")}
            col_stats["total"] = total
            col_stats["null_count"] = total - (col_stats.get("count") or 0)
            if name in quantiles:
                col_stats["quantiles"] = quantiles[name]
            stats[name] = col_stats
            profiles.extend(self._build_profiles(name, dtype, col_stats, total))
        return stats, profiles

    # builder chain order mirrors the reference: null/empty -> is_in ->
    # min_max/outliers (profile_builder.py:44-54)
    def _build_profiles(self, name: str, dtype: T.DataType, s: dict[str, Any], total: int) -> list[DQProfile]:
        out: list[DQProfile] = []
        if total == 0:
            return out
        opts = self.options
        null_ratio = s["null_count"] / total
        if null_ratio <= opts["max_null_ratio"]:
            if isinstance(dtype, T.StringType) and (s.get("empty") or 0) / total <= opts["max_empty_ratio"]:
                out.append(
                    DQProfile(
                        "is_not_null_and_not_empty",
                        name,
                        f"null+empty ratio {(null_ratio + (s.get('empty') or 0) / total):.4f} below threshold",
                        {"trim_strings": opts["trim_strings"]},
                    )
                )
            else:
                out.append(DQProfile("is_not_null", name, f"null ratio {null_ratio:.4f} below threshold"))
        distinct = s.get("distinct") or 0
        cnt = s.get("count") or 0
        if (
            isinstance(dtype, (T.StringType, T.IntegerType, T.LongType, T.ShortType))
            and 0 < distinct <= opts["max_in_count"]
            and cnt > 0
            and distinct / cnt <= opts["distinct_ratio"]
        ):
            out.append(DQProfile("is_in_list", name, f"{distinct} distinct values", {"needs_values": True}))
        if "min" in s and s.get("min") is not None and s.get("max") is not None:
            lo, hi = s["min"], s["max"]
            if "quantiles" in s and opts["remove_outliers"]:
                q = s["quantiles"]
                p01, p99 = q[0], q[4]
                if p01 is not None and p99 is not None and p01 < p99:
                    lo, hi = p01, p99
            out.append(
                DQProfile(
                    "min_max",
                    name,
                    "range inferred from sample" + (" (outlier-trimmed)" if "quantiles" in s else ""),
                    {"min": lo, "max": hi},
                )
            )
        return out


def resolve_in_list_values(df: DataFrame, profiles: list[DQProfile], max_in_count: int = 10) -> None:
    """Fill actual value lists for is_in_list candidates (one distinct pass
    per flagged column, bounded by max_in_count+1)."""
    for p in profiles:
        if p.name == "is_in_list" and p.parameters.get("needs_values"):
            values = [r[0] for r in df.select(p.column).where(F.col(p.column).isNotNull()).distinct().limit(max_in_count + 1).collect()]
            if len(values) <= max_in_count:
                p.parameters = {"allowed": sorted(values)}
            else:
                p.parameters = {"dropped": True}


def generate_rules(profiles: list[DQProfile], criticality: str = "error") -> list[dict]:
    """Profiles -> check metadata dicts (reference profiler/generator.py:71-105)."""
    rules: list[dict] = []
    for p in profiles:
        if p.name == "is_not_null":
            check = {"function": "is_not_null", "arguments": {"column": p.column}}
        elif p.name == "is_not_null_and_not_empty":
            check = {
                "function": "is_not_null_and_not_empty",
                "arguments": {"column": p.column, "trim_strings": bool(p.parameters.get("trim_strings", True))},
            }
        elif p.name == "is_in_list":
            allowed = p.parameters.get("allowed")
            if not allowed:
                continue
            check = {"function": "is_in_list", "arguments": {"column": p.column, "allowed": allowed}}
        elif p.name == "min_max":
            lo, hi = p.parameters.get("min"), p.parameters.get("max")
            # one-sided bounds degrade to the single-ended checks
            # (reference generator.dq_generate_min_max behavior)
            if lo is not None and hi is not None:
                check = {
                    "function": "is_in_range",
                    "arguments": {"column": p.column, "min_limit": lo, "max_limit": hi},
                }
            elif lo is not None:
                check = {"function": "is_not_less_than", "arguments": {"column": p.column, "limit": lo}}
            elif hi is not None:
                check = {"function": "is_not_greater_than", "arguments": {"column": p.column, "limit": hi}}
            else:
                continue
        else:
            continue
        rule = {"criticality": criticality, "check": check}
        if p.filter:
            rule["filter"] = p.filter
        rules.append(rule)
    return rules


def _sql_literal(v) -> str:
    """SQL literal rendering: quote + escape strings, quote temporal values
    (an unquoted 2024-01-01 parses as integer subtraction), numbers as-is."""
    import datetime as _dt

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (_dt.date, _dt.datetime)):
        return f"'{v}'"
    return str(v)


def _dlt_expression(p: DQProfile) -> tuple[str, str] | None:
    """(expectation_name, boolean SQL expression) for one profile, or None
    when the profile has no DLT mapping."""
    c = p.column
    params = p.parameters or {}
    if p.name in ("is_not_null", "is_not_null_and_not_empty"):
        return f"{c}_is_not_null", f"{c} IS NOT NULL"
    if p.name == "is_in_list" and params.get("allowed"):
        vals = ", ".join(_sql_literal(v) for v in params["allowed"])
        return f"{c}_is_in_list", f"{c} IN ({vals})"
    if p.name == "min_max":
        lo, hi = params.get("min"), params.get("max")
        if lo is not None and hi is not None:
            return f"{c}_in_range", f"{c} BETWEEN {_sql_literal(lo)} AND {_sql_literal(hi)}"
        if hi is not None:
            return f"{c}_in_range", f"{c} <= {_sql_literal(hi)}"
        if lo is not None:
            return f"{c}_in_range", f"{c} >= {_sql_literal(lo)}"
    return None


def generate_dlt_expectations(
    profiles: list[DQProfile], action: str | None = None, language: str = "SQL"
) -> list[str] | str | dict:
    """Lakeflow-pipeline (DLT) expectations from profiles (reference
    profiler/dlt_generator.py:17-231).

    ``language='SQL'`` (default): ``CONSTRAINT ... EXPECT (...)`` strings,
    with ``action`` 'drop'/'fail' adding the ON VIOLATION clause.
    ``'Python'``: an ``@dlt.expect_all*`` decorator string over the JSON
    expectations dict.  ``'Python_Dict'``: the raw {name: expression} dict."""
    if action is not None and str(action).lower() not in ("drop", "fail"):
        # an unrecognized action must not silently degrade a drop/fail
        # expectation to a warning (r4 review)
        raise ValueError(f"unsupported action {action!r}; use 'drop', 'fail' or None")
    action = str(action).lower() if action is not None else None
    exprs: dict[str, str] = {}
    for p in profiles:
        pair = _dlt_expression(p)
        if pair:
            exprs[pair[0]] = pair[1]
    lang = language.lower()
    if lang == "sql":
        act = {"drop": " ON VIOLATION DROP ROW", "fail": " ON VIOLATION FAIL UPDATE"}.get(action, "")
        return [f"CONSTRAINT {n} EXPECT ({e}){act}" for n, e in exprs.items()]
    if lang == "python_dict":
        return exprs
    if lang == "python":
        if not exprs:
            return ""
        import json as _json

        decorator = {"drop": "@dlt.expect_all_or_drop", "fail": "@dlt.expect_all_or_fail"}.get(
            action, "@dlt.expect_all"
        )
        return f"{decorator}(\n{_json.dumps(exprs)}\n)"
    raise ValueError(f"unsupported language {language!r}; use SQL, Python or Python_Dict")


# ---------------------------------------------------------------------------
# reference-parity surface: table-level profiling and the generator classes
# (reference profiler/profiler.py:121-206, generator.py:40-176,
# dlt_generator.py:17-231 expose these as methods; the engines above are the
# implementations, these are thin delegates)
# ---------------------------------------------------------------------------
def _profile_table(profiler: "DQProfiler", spark, input_config, columns=None, options=None):
    from dqx_spark.io import read_input_data  # noqa: PLC0415

    p = DQProfiler({**profiler.options, **(options or {})}) if options else profiler
    return p.profile(read_input_data(spark, input_config), columns=columns)


def _as_input_config(location_or_config):
    from dqx_spark.io import InputConfig  # noqa: PLC0415

    if isinstance(location_or_config, str):
        return InputConfig(location_or_config)
    return location_or_config


class _DQProfilerTableMixin:
    """Table-level entry points for :class:`DQProfiler`."""

    def profile_table(self, input_config, columns: list[str] | None = None, options: dict | None = None,
                      spark=None):
        """Profile one table/path (reference profiler.py:121)."""
        from pyspark.sql import SparkSession  # noqa: PLC0415

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("profile_table needs an active SparkSession")
        return _profile_table(self, spark, _as_input_config(input_config), columns, options)

    def profile_tables_for_patterns(
        self,
        patterns: list[str],
        exclude_patterns: list[str] | None = None,
        columns: dict[str, list[str]] | None = None,
        options: dict | None = None,
        max_parallelism: int = 4,
        spark=None,
    ) -> dict:
        """Wildcard fan-out over catalog tables (reference profiler.py:146):
        ``{table: (summary_stats, [DQProfile])}`` on a driver thread pool."""
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        from pyspark.sql import SparkSession  # noqa: PLC0415

        from dqx_spark.workflow import expand_table_patterns  # noqa: PLC0415

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("profile_tables_for_patterns needs an active SparkSession")
        tables = expand_table_patterns(spark, patterns, exclude_patterns)
        cols = columns or {}

        def one(t: str):
            from dqx_spark.io import InputConfig  # noqa: PLC0415

            return t, _profile_table(self, spark, InputConfig(t), cols.get(t), options)

        with ThreadPoolExecutor(max_workers=max_parallelism) as pool:
            return dict(pool.map(one, tables))

    @staticmethod
    def get_columns_or_fields(columns: list[T.StructField]) -> list[T.StructField]:
        """Flatten struct fields into dotted leaf fields
        (reference profiler.py:62)."""
        out: list[T.StructField] = []
        for f in columns:
            if isinstance(f.dataType, T.StructType):
                for name, dtype in flatten_fields(f.dataType, prefix=f.name + "."):
                    out.append(T.StructField(name, dtype, True))
            else:
                out.append(f)
        return out

    def detect_primary_keys_with_llm(self, input_config, provider, columns=None, spark=None):
        """Propose-then-verify PK detection (reference profiler.py:189;
        the LLM provider is the pluggable callable of dqx_spark.llm)."""
        from pyspark.sql import SparkSession  # noqa: PLC0415

        from dqx_spark.io import read_input_data  # noqa: PLC0415
        from dqx_spark.llm import detect_primary_keys_with_llm  # noqa: PLC0415

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("detect_primary_keys_with_llm needs an active SparkSession")
        df = read_input_data(spark, _as_input_config(input_config))
        return detect_primary_keys_with_llm(df, provider, columns=columns)


# graft the mixin onto DQProfiler (kept separate so the core profiling class
# stays readable; attribute assignment, not inheritance, preserves existing
# pickled/constructed instances)
for _name in ("profile_table", "profile_tables_for_patterns", "get_columns_or_fields",
              "detect_primary_keys_with_llm"):
    # __dict__ access, not getattr: getattr unwraps @staticmethod into a
    # plain function, which would re-bind as an instance method and break
    # DQProfiler().get_columns_or_fields(fields) (r4 review)
    setattr(DQProfiler, _name, _DQProfilerTableMixin.__dict__[_name])


class DQGenerator:
    """Rule generation from profiles / contracts / LLM
    (reference profiler/generator.py:40-176)."""

    def __init__(self, provider=None):
        #: optional LLM provider callable for the ai-assisted path
        self.provider = provider

    @staticmethod
    def generate_dq_rules(profiles: list[DQProfile] | None = None, criticality: str = "error") -> list[dict]:
        return generate_rules(profiles or [], criticality)

    @staticmethod
    def generate_rules_from_contract(contract: dict, criticality: str = "error") -> list[dict]:
        from dqx_spark.contracts import generate_rules_from_contract  # noqa: PLC0415

        return generate_rules_from_contract(contract, criticality)

    def generate_dq_rules_ai_assisted(self, df: DataFrame, user_input: str = "", **kwargs) -> list[dict]:
        """LLM-assisted generation (reference generator.py:107) through the
        pluggable provider protocol of dqx_spark.llm.  ``user_input`` (the
        natural-language requirements) is appended to the prompt."""
        if self.provider is None:
            raise ValueError("DQGenerator(provider=...) is required for ai-assisted generation")
        from dqx_spark.llm import generate_rules_with_llm  # noqa: PLC0415

        return generate_rules_with_llm(df, self.provider, user_input=user_input, **kwargs)


class DQDltGenerator:
    """Lakeflow-pipeline (DLT) expectation generation
    (reference profiler/dlt_generator.py:17)."""

    @staticmethod
    def generate_dlt_rules(rules: list[DQProfile], action: str | None = None, language: str = "SQL"):
        return generate_dlt_expectations(rules, action=action, language=language)
