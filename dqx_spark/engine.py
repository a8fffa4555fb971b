"""Engine: fold a list of rules over a DataFrame, annotating rows with
structured ``_errors`` / ``_warnings`` array columns.

Semantics derived from the reference ``engine.py:120-184`` (apply_checks),
``engine.py:530-619`` (results-array assembly), ``manager.py:195-245``
(per-rule processing incl. skip detection and filter application) and
``executor.py:53-172`` (row/dataset dispatch).  The whole engine is lazy
plan construction on the driver: zero Spark actions in ``apply_checks``.
"""

from __future__ import annotations
from dqx_spark.errors import InvalidParameterError, MissingParameterError

import inspect
import uuid
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from dqx_spark.rule import (
    CRITICALITY_ERROR,
    CRITICALITY_WARN,
    PRESELECT_ORIGINAL_COLUMNS_REGISTRY,
    DQRule,
    rule_set_fingerprint,
)
from dqx_spark.reporting import INFO_COLUMN_PREFIX, merge_info_columns
from dqx_spark.schema import ERRORS_COLUMN, INFO_COLUMN, WARNINGS_COLUMN, dq_result_item_schema

# sentinel for _process_rule's skip_reason parameter: None is a meaningful
# value ("not skipped"), so absence needs its own marker
_SKIP_UNSET = object()


@dataclass(frozen=True)
class ExtraParams:
    """Determinism knobs (reference ``engine.py:98-114``).

    ``result_column_names`` renames the result columns per engine instance
    (reference ``_result_column_names`` resolution, engine.py:85-94):
    keys ``errors`` / ``warnings`` / ``info``, defaulting to ``_errors`` /
    ``_warnings`` / ``_dq_info``."""

    run_time_overwrite: datetime | str | None = None
    run_id_overwrite: str | None = None
    user_metadata: dict[str, str] = field(default_factory=dict)
    result_column_names: dict[str, str] = field(default_factory=dict)


class DQEngine:
    """Applies declarative quality rules to batch or streaming DataFrames."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        extra_params: ExtraParams | None = None,
        suppress_skipped: bool = False,
        checkpoint_every_n_dataset_checks: int | None = None,
    ):
        self.spark = spark
        self.extra_params = extra_params or ExtraParams()
        self.suppress_skipped = suppress_skipped
        #: N dataset checks chain N joins onto one DataFrame; very large rule
        #: sets explode the plan (the reference only warns —
        #: check_funcs.py:2161-2163).  Setting this truncates lineage with a
        #: lazy localCheckpoint every N dataset checks.  Trade-off: the
        #: checkpoint caches the intermediate rows on executors.
        self.checkpoint_every_n_dataset_checks = checkpoint_every_n_dataset_checks
        self._run_id = self.extra_params.run_id_overwrite or str(uuid.uuid4())
        rcn = self.extra_params.result_column_names
        unknown = set(rcn) - {"errors", "warnings", "info"}
        if unknown:
            raise InvalidParameterError(f"result_column_names keys must be errors/warnings/info, got {sorted(unknown)}")
        self._errors_col = rcn.get("errors", ERRORS_COLUMN)
        self._warnings_col = rcn.get("warnings", WARNINGS_COLUMN)
        self._info_col = rcn.get("info", INFO_COLUMN)
        # Row-rule result Columns are pure (unresolved) expressions with no
        # DataFrame dependency, so the fully-wrapped result struct can be
        # reused verbatim whenever the same rule (by fingerprint) is applied
        # again under the same rule-set fingerprint — plan construction is
        # pure py4j round-trip cost (~60 JVM calls per rule), and rule sets
        # are routinely re-applied (multi-table fan-out, streaming
        # micro-batches, repeated runs).  Keyed on (rule_fp, set_fp);
        # engine-level run_id/run_time/user_metadata are fixed per instance.
        self._row_result_cache: dict[tuple, Column] = {}
        # dataset-rule result structs, keyed (id(rule), set_fp) with the
        # rule object pinned in the value (id stability) — see _process_rule.
        # Bounded: workloads that mint NEW rule objects per apply (e.g.
        # apply_checks_by_metadata in a foreachBatch loop deserializes fresh
        # rules every micro-batch) would otherwise grow this monotonically
        # with zero hits; on overflow the oldest half is evicted (dict
        # preserves insertion order), un-pinning those rules for GC.
        self._dataset_struct_cache: dict[tuple, tuple] = {}
        self._dataset_struct_cache_max = 1024

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def apply_checks(
        self,
        df: DataFrame,
        checks: list[DQRule],
        ref_dfs: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Append ``_errors`` then ``_warnings`` array-of-struct columns."""
        self._validate_no_result_column_collision(df)
        for c in checks:
            if not isinstance(c, DQRule):
                raise TypeError(f"checks must be DQRule instances, got {type(c)!r}")

        spark = self.spark or df.sparkSession
        set_fp = rule_set_fingerprint(checks)
        original_columns = list(df.columns)

        error_rules = [r for r in checks if r.criticality == CRITICALITY_ERROR]
        warn_rules = [r for r in checks if r.criticality == CRITICALITY_WARN]

        current_df = df
        error_conds: list[Column] = []
        warn_conds: list[Column] = []
        n_dataset = 0

        # r12 fused stats pass: dataset rules whose stats subplan is a plain
        # aggregate over the ORIGINAL input advertise an _AggFusionSpec on
        # their closure; compatible specs within THIS rule list are batched
        # so ONE stats subplan (one input scan + one broadcast join-back)
        # serves the whole batch — N global-aggregate rules cost 1 full
        # input scan instead of N.  Values are identical either way (each
        # member's aggregate expression and verdict projection are exactly
        # its single-rule ones); single-member batches keep the unfused
        # single-rule plan shape.
        from dqx_spark.functions.dataset_checks import apply_fused_agg_rules  # noqa: PLC0415

        # r13 (ADVICE r12): memoize skip verdicts for this apply — the scan
        # below and the main loop's _process_rule otherwise BOTH run
        # _skip_reason per rule, and for Column-expression args each call
        # does analyzer probes (py4j round trips), doubling exactly the
        # plan-build cost the _skip_reason fast path exists to bound.
        skip_memo: dict[int, str | None] = {}

        def _skip_of(r: DQRule) -> str | None:
            rid = id(r)
            if rid not in skip_memo:
                skip_memo[rid] = self._skip_reason(r, df)
            return skip_memo[rid]

        fusion_batches: dict[tuple, list[int]] = {}
        fusion_specs: dict[int, tuple] = {}
        for r in error_rules + warn_rules:
            if r.rule_type != "dataset" or id(r) in fusion_specs:
                continue
            if _skip_of(r) is not None:
                continue
            try:
                _c, closure = r.invoke_cached()
            except Exception:  # noqa: BLE001 — the main loop raises identically
                continue
            spec = getattr(closure, "_dq_fusion", None)
            if spec is None:
                continue
            key = spec.key()
            fusion_batches.setdefault(key, []).append(id(r))
            fusion_specs[id(r)] = (key, spec)
        fusion_batches = {k: v for k, v in fusion_batches.items() if len(v) >= 2}
        fusion_specs = {rid: ks for rid, ks in fusion_specs.items() if ks[0] in fusion_batches}
        fused_done: set[tuple] = set()

        # Thread current_df through rules so later rules see earlier rules'
        # hidden condition columns (reference engine.py:568-591).
        # The SAME rule object listed twice contributes its first condition
        # again without re-running the closure: since r8 the (condition,
        # closure) pair is memoized per instance, so a second closure
        # application would re-emit the same temp message column (ambiguous
        # reference); the duplicate's result is identical by construction.
        seen_in_pass: dict[int, Column] = {}
        for rule, sink in [(r, error_conds) for r in error_rules] + [(r, warn_conds) for r in warn_rules]:
            if id(rule) in seen_in_pass:
                prior = seen_in_pass[id(rule)]
                if prior is not None:
                    sink.append(prior)
                continue
            ks = fusion_specs.get(id(rule))
            if ks is not None and ks[0] not in fused_done:
                batch_specs = [fusion_specs[rid][1] for rid in fusion_batches[ks[0]]]
                current_df = apply_fused_agg_rules(
                    current_df, df, batch_specs, spark=spark, ref_dfs=ref_dfs
                )
                fused_done.add(ks[0])
            cond, current_df = self._process_rule(
                rule, current_df, df, spark, ref_dfs, set_fp, closure_applied=ks is not None,
                skip_reason=_skip_of(rule),
            )
            seen_in_pass[id(rule)] = cond
            if cond is not None:
                sink.append(cond)
            if rule.rule_type == "dataset":
                n_dataset += 1
                every = self.checkpoint_every_n_dataset_checks
                if every and n_dataset % every == 0 and not current_df.isStreaming:
                    current_df = current_df.localCheckpoint(eager=False)

        # merge any staged per-row diagnostics (anomaly scores etc.) into the
        # _dq_info array and drop the staging columns (reference
        # engine.py:604, reporting_columns.py:22-52)
        # only columns STAGED by this pass's checks — a user column that
        # happens to carry the prefix passes through untouched
        info_cols = [
            c for c in current_df.columns
            if c.startswith(INFO_COLUMN_PREFIX) and c not in original_columns
        ]
        if not info_cols:
            # fast path: one projection instead of withColumn+withColumn+
            # select — each DataFrame op is a JVM analysis round trip, and
            # plan construction is the fixed driver cost of small batches
            return current_df.select(
                *original_columns,
                _assemble_results(error_conds).alias(self._errors_col),
                _assemble_results(warn_conds).alias(self._warnings_col),
            )
        result = current_df.withColumn(self._errors_col, _assemble_results(error_conds)).withColumn(
            self._warnings_col, _assemble_results(warn_conds)
        )
        # temp-column hygiene: restore exactly the original columns + results.
        # Multi-pass: a pre-existing _dq_info (array) gets the new elements
        # appended (info_cols is non-empty here — the empty case returned
        # above).
        keep = original_columns + [self._errors_col, self._warnings_col]
        result = merge_info_columns(self._info_col, result, info_cols)
        if self._info_col not in keep:
            keep.append(self._info_col)
        return result.select(*keep)

    def apply_checks_and_split(
        self,
        df: DataFrame,
        checks: list[DQRule],
        ref_dfs: dict[str, DataFrame] | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """(good, bad): good rows have no errors (result cols dropped);
        bad rows have errors or warnings (result cols kept)."""
        checked = self.apply_checks(df, checks, ref_dfs)
        return self.get_valid(checked), self.get_invalid(checked)

    def apply_checks_by_metadata(
        self,
        df: DataFrame,
        checks: list[dict],
        custom_check_functions: dict[str, Callable] | None = None,
        ref_dfs: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        from dqx_spark.serde import deserialize_checks

        rules = deserialize_checks(checks, custom_check_functions)
        return self.apply_checks(df, rules, ref_dfs)

    def apply_checks_by_metadata_and_split(
        self,
        df: DataFrame,
        checks: list[dict],
        custom_check_functions: dict[str, Callable] | None = None,
        ref_dfs: dict[str, DataFrame] | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        checked = self.apply_checks_by_metadata(df, checks, custom_check_functions, ref_dfs)
        return self.get_valid(checked), self.get_invalid(checked)

    # ------------------------------------------------------------------
    # reference-parity convenience surface: in the reference these are
    # DQEngine methods (engine.py:303-1733); the implementations live in
    # serde/checks_storage/workflow/metrics here, so each method is a thin
    # delegate — a reference user's `engine.<method>(...)` calls work as-is.
    # ------------------------------------------------------------------
    @property
    def result_column_names(self) -> dict[str, str]:
        """Resolved result column names (reference engine.py:117)."""
        return {"errors": self._errors_col, "warnings": self._warnings_col, "info": self._info_col}

    @staticmethod
    def validate_checks(checks: list[dict], custom_check_functions: dict[str, Callable] | None = None):
        """Structural + signature validation (reference engine.py:303)."""
        from dqx_spark.serde import validate_checks  # noqa: PLC0415

        return validate_checks(checks, custom_check_functions)

    @staticmethod
    def load_checks_from_local_file(filepath: str) -> list[dict]:
        """reference engine.py:375."""
        from dqx_spark.serde import load_checks_from_file  # noqa: PLC0415

        return load_checks_from_file(filepath)

    @staticmethod
    def save_checks_in_local_file(checks: list[dict], filepath: str) -> None:
        """reference engine.py:396."""
        from dqx_spark.serde import save_checks_to_file  # noqa: PLC0415

        save_checks_to_file(checks, filepath)

    def load_checks(self, checks_location: str, run_config_name: str = "default") -> list[dict]:
        """Load from file / table / JDBC storage by location shape
        (reference engine.py:1420)."""
        from dqx_spark.checks_storage import checks_storage_factory  # noqa: PLC0415

        return checks_storage_factory(self._require_spark(), checks_location, run_config_name).load()

    def save_checks(
        self, checks: list[dict], checks_location: str, run_config_name: str = "default", mode: str = "overwrite"
    ) -> None:
        """reference engine.py save_checks."""
        from dqx_spark.checks_storage import checks_storage_factory  # noqa: PLC0415

        checks_storage_factory(self._require_spark(), checks_location, run_config_name).save(checks, mode=mode)

    def apply_checks_and_save_in_table(
        self,
        input_config,
        output_config=None,
        checks: list | None = None,
        quarantine_config=None,
        metrics_config=None,
        checks_location: str | None = None,
        run_config_name: str = "default",
        custom_check_functions: dict[str, Callable] | None = None,
        ref_dfs: dict[str, DataFrame] | None = None,
    ):
        """Managed end-to-end run (reference engine.py:853): read input,
        apply checks, write output (and quarantine/metrics when configured).
        Returns the metrics dict for batch metrics runs, else None."""
        from dqx_spark.io import RunConfig  # noqa: PLC0415
        from dqx_spark.workflow import apply_checks_and_save_in_table  # noqa: PLC0415

        rc = RunConfig(
            name=run_config_name,
            input_config=input_config,
            output_config=output_config,
            quarantine_config=quarantine_config,
            metrics_config=metrics_config,
            checks_location=checks_location,
        )
        return apply_checks_and_save_in_table(
            self._require_spark(), rc, checks=checks, engine=self,
            custom_check_functions=custom_check_functions, ref_dfs=ref_dfs,
        )

    # by-metadata twin: the workflow function accepts dict checks directly
    apply_checks_by_metadata_and_save_in_table = apply_checks_and_save_in_table

    def apply_checks_and_save_in_tables(self, run_configs: list, max_parallelism: int = 4):
        """reference engine.py:1114."""
        from dqx_spark.workflow import apply_checks_and_save_in_tables  # noqa: PLC0415

        return apply_checks_and_save_in_tables(
            self._require_spark(), run_configs, max_parallelism=max_parallelism, engine=self
        )

    def apply_checks_and_save_in_tables_for_patterns(
        self,
        patterns: list[str],
        checks_location: str,
        exclude_patterns: list[str] | None = None,
        output_table_suffix: str = "_dq_output",
        quarantine_table_suffix: str | None = None,
        max_parallelism: int = 4,
    ):
        """reference engine.py:1147."""
        from dqx_spark.workflow import apply_checks_and_save_in_tables_for_patterns  # noqa: PLC0415

        return apply_checks_and_save_in_tables_for_patterns(
            self._require_spark(),
            patterns,
            checks_location,
            exclude_patterns=exclude_patterns,
            output_suffix=output_table_suffix,
            quarantine_suffix=quarantine_table_suffix,
            max_parallelism=max_parallelism,
            engine=self,
        )

    def save_results_in_table(
        self,
        output_df: DataFrame | None = None,
        quarantine_df: DataFrame | None = None,
        output_config=None,
        quarantine_config=None,
    ) -> None:
        """Write already-checked frames to their configured sinks
        (reference engine.py:1305); one-shot streaming triggers are awaited."""
        from dqx_spark.io import is_one_time_trigger, save_dataframe_as_table  # noqa: PLC0415

        for df, cfg in ((output_df, output_config), (quarantine_df, quarantine_config)):
            if df is None or cfg is None:
                continue
            q = save_dataframe_as_table(df, cfg)
            if q is not None and is_one_time_trigger(cfg.trigger):
                q.awaitTermination()

    def compute_summary_metrics(self, checked_df: DataFrame, custom_metrics: list[str] | None = None) -> dict:
        """Eager summary metrics over a checked frame (reference
        engine.py:1587) honoring this engine's result column names."""
        from dqx_spark.metrics import DQMetricsObserver  # noqa: PLC0415

        observer = DQMetricsObserver(
            custom_metrics=custom_metrics or [],
            errors_col=self._errors_col, warnings_col=self._warnings_col,
        )
        observed, observation = observer.attach(checked_df)
        observed.count()
        return dict(observation.get)

    def save_summary_metrics(
        self,
        observed_metrics: dict,
        metrics_config,
        run_name: str = "default",
        input_location: str | None = None,
        output_location: str | None = None,
        quarantine_location: str | None = None,
        checks_location: str | None = None,
    ) -> None:
        """Persist a metrics dict in long format (reference engine.py:1686)."""
        from dqx_spark.io import save_dataframe_as_table  # noqa: PLC0415
        from dqx_spark.metrics import metrics_dataframe, observation_rows  # noqa: PLC0415

        rows = observation_rows(
            observed_metrics,
            run_id=self._run_id,
            run_name=run_name,
            input_location=input_location,
            output_location=output_location,
            quarantine_location=quarantine_location,
            checks_location=checks_location,
            error_column_name=self._errors_col,
            warning_column_name=self._warnings_col,
        )
        save_dataframe_as_table(metrics_dataframe(self._require_spark(), rows), metrics_config)

    def get_streaming_metrics_listener(self, metrics_config, observer_name: str = "dqx", run_name: str = "default"):
        """Listener that persists each micro-batch's observed metrics
        (reference engine.py:1731)."""
        from dqx_spark.io import save_dataframe_as_table  # noqa: PLC0415
        from dqx_spark.metrics import (  # noqa: PLC0415
            StreamingMetricsListener,
            metrics_dataframe,
            observation_rows,
        )

        spark = self._require_spark()

        def sink(metrics: dict) -> None:
            rows = observation_rows(
                metrics,
                run_id=self._run_id,
                run_name=run_name,
                error_column_name=self._errors_col,
                warning_column_name=self._warnings_col,
            )
            save_dataframe_as_table(metrics_dataframe(spark, rows), metrics_config)

        return StreamingMetricsListener(observer_name, sink)

    def _require_spark(self) -> SparkSession:
        spark = self.spark or SparkSession.getActiveSession()
        if spark is None:
            raise MissingParameterError("this method needs a SparkSession: pass one to DQEngine(spark)")
        return spark

    def get_valid(self, df: DataFrame) -> DataFrame:
        """Rows with no errors, result columns dropped (reference engine.py:345-357).
        Honors this engine's ``result_column_names``."""
        return df.where(F.col(self._errors_col).isNull()).drop(self._errors_col, self._warnings_col)

    def get_invalid(self, df: DataFrame) -> DataFrame:
        """Rows with any error or warning, result columns kept
        (reference engine.py:359-372)."""
        return df.where(F.col(self._errors_col).isNotNull() | F.col(self._warnings_col).isNotNull())

    # ------------------------------------------------------------------
    # per-rule processing (reference manager.py:195-245, executor.py:53-172)
    # ------------------------------------------------------------------
    def _process_rule(
        self,
        rule: DQRule,
        current_df: DataFrame,
        original_df: DataFrame,
        spark: SparkSession,
        ref_dfs: dict[str, DataFrame] | None,
        set_fp: str,
        closure_applied: bool = False,
        skip_reason: str | None | object = _SKIP_UNSET,
    ) -> tuple[Column | None, DataFrame]:
        if skip_reason is _SKIP_UNSET:
            skip_reason = self._skip_reason(rule, original_df)
        if skip_reason is not None:
            if self.suppress_skipped:
                return None, current_df
            return self._result_struct(rule, F.lit(skip_reason), set_fp, skipped=True), current_df

        if rule.rule_type == "dataset":
            # (condition, closure) is memoized on the rule and the wrapped
            # result struct per (rule object, set_fp): repeated apply_checks
            # with the same rules (streaming micro-batches, fan-out,
            # re-runs) then pays only the closure APPLICATION, not the
            # ~100 py4j calls of expression re-construction.  Keyed on
            # id(rule) with the rule pinned in the value so the id cannot
            # be recycled; per-object keys sidestep the fingerprint-
            # collision caveat that gates the row cache below.
            condition, closure = rule.invoke_cached()
            if closure_applied:
                # the engine's fused stats pass already appended this rule's
                # hidden message column to current_df — only wrap the result
                new_df = current_df
            else:
                # checks like has_valid_schema must see only the original
                # (pre-check) column set (reference engine.py:483-513)
                original_columns = (
                    list(original_df.columns)
                    if rule.check_func.__name__ in PRESELECT_ORIGINAL_COLUMNS_REGISTRY
                    else None
                )
                new_df = _call_closure(closure, current_df, spark, ref_dfs, original_columns, original_df)
            struct_key = (id(rule), set_fp)
            pinned = self._dataset_struct_cache.get(struct_key)
            if pinned is None:
                if len(self._dataset_struct_cache) >= self._dataset_struct_cache_max:
                    for stale in list(self._dataset_struct_cache)[: self._dataset_struct_cache_max // 2]:
                        del self._dataset_struct_cache[stale]
                pinned = (rule, self._result_struct(rule, condition, set_fp))
                self._dataset_struct_cache[struct_key] = pinned
            return pinned[1], new_df

        # id(check_func) guards same-named custom functions with different
        # bodies (fingerprints canonicalize by function NAME).  Rules with
        # Column-object args bypass the cache entirely: fingerprints record
        # only the NORMALIZED display string of a Column, so two distinct
        # expressions (F.col('a.b') vs 'a_b') can share a fingerprint and
        # would silently reuse each other's condition (r4 review).
        if _has_column_objects(rule):
            return self._result_struct(rule, rule.invoke(), set_fp), current_df
        cache_key = (rule.fingerprint(), set_fp, id(rule.check_func))
        cached = self._row_result_cache.get(cache_key)
        if cached is not None:
            return cached, current_df
        condition = rule.invoke()
        result = self._result_struct(rule, condition, set_fp)
        self._row_result_cache[cache_key] = result
        return result, current_df

    def _skip_reason(self, rule: DQRule, df: DataFrame) -> str | None:
        """Plan-only validation: unresolvable column/filter => structured skip,
        not a run failure (reference manager.py:195-215, 323-356).

        Fast path: a bare identifier already present in df.columns needs no
        analyzer probe — each probe is a py4j round trip, and N rules × M
        columns of them dominate plan-build time."""
        existing = set(df.columns)
        raw_cols = rule.columns if rule.columns is not None else ([rule.column] if rule.column is not None else [])
        for c in raw_cols:
            if isinstance(c, str):
                if c in existing:
                    continue
                if not _is_resolvable(df, c):
                    return f"column '{c}' is not found in the input"
            elif not _is_resolvable(df, c):
                # a Column-expression arg: probe the expression ITSELF —
                # its normalized display name (columns_as_strings) is not a
                # parseable expression, and probing that would skip every
                # Column-typed rule (r4 review)
                from dqx_spark.rule import normalize_col_str  # noqa: PLC0415

                return f"column '{normalize_col_str(c)}' is not found in the input"
        if rule.filter and not _is_resolvable(df, rule.filter):
            return f"filter '{rule.filter}' cannot be resolved on the input"
        if rule.message_expr and not _is_resolvable(df, rule.message_expr):
            return f"message_expr '{rule.message_expr}' cannot be resolved on the input"
        return None

    def _result_struct(self, rule: DQRule, condition: Column, set_fp: str, skipped: bool = False) -> Column:
        """Wrap a raw message-or-null condition into the result struct and
        apply the rule-level filter (reference manager.py:217-245)."""
        run_time = (
            F.lit(self.extra_params.run_time_overwrite).cast("timestamp")
            if self.extra_params.run_time_overwrite is not None
            else F.current_timestamp()
        )
        cols = rule.columns_as_strings
        columns_lit = (
            F.array(*[F.lit(c) for c in cols]) if cols else F.lit(None).cast("array<string>")
        )
        metadata = {**self.extra_params.user_metadata, **(rule.user_metadata or {})}
        metadata_lit = (
            F.create_map(*[F.lit(x) for kv in metadata.items() for x in kv])
            if metadata
            else F.lit(None).cast("map<string,string>")
        )
        message_val = condition.cast("string")
        if rule.message_expr and not skipped:
            # custom message expression, truncated to 500 chars
            # (reference manager.py:247-274)
            message_val = F.substring(F.expr(rule.message_expr).cast("string"), 1, 500)
        struct_col = F.struct(
            F.lit(rule.name).alias("name"),
            message_val.alias("message"),
            columns_lit.alias("columns"),
            F.lit(rule.filter).cast("string").alias("filter"),
            F.lit(rule.check_func.__name__).alias("function"),
            run_time.alias("run_time"),
            F.lit(self._run_id).alias("run_id"),
            metadata_lit.alias("user_metadata"),
            F.lit(rule.fingerprint()).alias("rule_fingerprint"),
            F.lit(set_fp).alias("rule_set_fingerprint"),
            F.lit(skipped).alias("skipped"),
        ).cast(dq_result_item_schema)

        if skipped:
            return struct_col

        fired = condition.isNotNull()
        if rule.filter:
            fired = F.expr(rule.filter) & fired
        return F.when(fired, struct_col).otherwise(F.lit(None).cast(dq_result_item_schema))

    def _validate_no_result_column_collision(self, df: DataFrame) -> None:
        clash = {self._errors_col, self._warnings_col} & set(df.columns)
        if clash:
            raise InvalidParameterError(f"input DataFrame already contains result columns: {sorted(clash)}")


def _assemble_results(conditions: list[Column]) -> Column:
    """``array_compact(array(*conds))`` -> null if empty
    (reference engine.py:593-602)."""
    if not conditions:
        return F.lit(None).cast(f"array<{dq_result_item_schema.simpleString()}>")
    arr = F.array_compact(F.array(*conditions))
    return F.when(F.size(arr) > 0, arr).otherwise(F.lit(None))


def _call_closure(
    closure: Callable,
    df: DataFrame,
    spark: SparkSession,
    ref_dfs: dict[str, DataFrame] | None,
    original_columns: list[str] | None = None,
    source_df: DataFrame | None = None,
) -> DataFrame:
    """Signature-inspected injection of spark/ref_dfs
    (reference executor.py:115-149).

    ``source_df`` is the ORIGINAL (pre-check) input.  Closures that build a
    stats subplan (aggregates, medians) accept it and derive the stats from
    the original rather than the threaded DataFrame: the threaded plan
    re-embeds every earlier check's join, so stats-from-current makes plan
    size EXPONENTIAL in the number of dataset checks (30 chained grouped
    checks OOM the driver analyzer); stats-from-original keeps it linear and
    is semantically identical (checks are independent of each other's hidden
    columns)."""
    params = inspect.signature(closure).parameters
    kwargs: dict[str, Any] = {}
    if "spark" in params:
        kwargs["spark"] = spark
    if "ref_dfs" in params:
        kwargs["ref_dfs"] = ref_dfs
    if "original_columns" in params and original_columns is not None:
        kwargs["original_columns"] = original_columns
    if "source_df" in params and source_df is not None:
        kwargs["source_df"] = source_df
    return closure(df, **kwargs)


def _has_column_objects(rule: DQRule) -> bool:
    """True when any rule argument is a live Column object (vs a string)."""

    def any_col(v) -> bool:
        if isinstance(v, Column):
            return True
        if isinstance(v, (list, tuple)):
            return any(any_col(x) for x in v)
        if isinstance(v, dict):
            return any(any_col(x) for x in v.values())
        return False

    return any_col(rule.column) or any_col(rule.columns) or any_col(rule.check_func_args) or any_col(
        rule.check_func_kwargs
    )


def _is_resolvable(df: DataFrame, expr: str | Column) -> bool:
    try:
        df.select(expr if isinstance(expr, Column) else F.expr(expr)).schema  # plan-only; no action
        return True
    except AnalysisException:
        return False
    except Exception:
        return False
