"""Row-level checks: every function compiles to a single pure Column
expression (message-or-null), so N checks fuse into ONE projected scan with
whole-stage codegen — no shuffles, no actions.

Semantics derived from the reference ``check_funcs.py`` §2.3 inventory
(SURVEY.md); each docstring cites the reference file:line it re-derives.
"""

from __future__ import annotations

import datetime
import ipaddress
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqx_spark.errors import InvalidParameterError
from dqx_spark.functions import iso_codes
from dqx_spark.functions._helpers import get_limit_expr, str_value
from dqx_spark.rule import make_condition, normalize_col_str, register_rule, to_col

__all__ = [
    "is_not_null_and_not_empty",
    "is_not_empty",
    "is_not_null",
    "is_null",
    "is_empty",
    "is_null_or_empty",
    "has_valid_string_case",
    "is_not_null_and_is_in_list",
    "is_in_list",
    "is_not_in_list",
    "sql_expression",
    "is_older_than_col2_for_n_days",
    "is_older_than_n_days",
    "is_not_in_future",
    "is_not_in_near_future",
    "is_equal_to",
    "is_not_equal_to",
    "is_not_less_than",
    "is_not_greater_than",
    "is_in_range",
    "is_not_in_range",
    "regex_match",
    "is_not_null_and_not_empty_array",
    "is_valid_date",
    "is_valid_timestamp",
    "is_valid_ipv4_address",
    "is_ipv4_address_in_cidr",
    "is_valid_ipv6_address",
    "is_ipv6_address_in_cidr",
    "is_valid_email",
    "is_valid_national_id",
    "is_valid_country_code",
    "is_valid_currency_code",
    "is_valid_subdivision_code",
    "is_valid_language_code",
    "is_data_fresh",
    "is_valid_json",
    "has_json_keys",
    "has_valid_json_schema",
    "is_latitude",
    "is_longitude",
    "does_not_contain_pii",
    "presidio_analyzer",
]


# ---------------------------------------------------------------------------
# null / empty family
# ---------------------------------------------------------------------------
def _fmt_literal(text) -> str:
    """Escape ``%`` so user-supplied literals (regexes, datetime formats)
    can be embedded in ``format_string`` templates — '%Y-%m-%d' previously
    blew up the message build with UnknownFormatConversionException (found
    by running the reference's sample data contract)."""
    return str(text).replace("%", "%%")


@register_rule("row")
def is_not_null_and_not_empty(column: str | Column, trim_strings: bool = False) -> Column:
    """Fail when null or empty string (reference check_funcs.py:169)."""
    col = to_col(column)
    name = normalize_col_str(column)
    col_str = F.trim(col.cast("string")) if trim_strings else col.cast("string")
    condition = col.isNull() | (col_str == F.lit(""))
    return make_condition(condition, f"Column '{name}' value is null or empty", f"{name}_is_null_or_empty")


@register_rule("row")
def is_not_empty(column: str | Column, trim_strings: bool = False) -> Column:
    """Fail when empty string; nulls pass (reference check_funcs.py:189)."""
    col = to_col(column)
    name = normalize_col_str(column)
    col_str = F.trim(col.cast("string")) if trim_strings else col.cast("string")
    return make_condition(col_str == F.lit(""), f"Column '{name}' value is empty", f"{name}_is_empty")


@register_rule("row")
def is_not_null(column: str | Column) -> Column:
    """Fail when null (reference check_funcs.py:207)."""
    col = to_col(column)
    name = normalize_col_str(column)
    return make_condition(col.isNull(), f"Column '{name}' value is null", f"{name}_is_null")


@register_rule("row")
def is_null(column: str | Column) -> Column:
    """Assert the value IS null (reference check_funcs.py:221)."""
    col = to_col(column)
    name = normalize_col_str(column)
    return make_condition(col.isNotNull(), f"Column '{name}' value is not null", f"{name}_is_not_null")


@register_rule("row")
def is_empty(column: str | Column, trim_strings: bool = False) -> Column:
    """Assert the value IS empty (reference check_funcs.py:237-250)."""
    col = to_col(column)
    name = normalize_col_str(column)
    col_str = F.trim(col.cast("string")) if trim_strings else col.cast("string")
    return make_condition(col_str != F.lit(""), f"Column '{name}' value is not empty", f"{name}_is_not_empty")


@register_rule("row")
def is_null_or_empty(column: str | Column, trim_strings: bool = False) -> Column:
    """Assert the value IS null-or-empty (reference check_funcs.py:255-268)."""
    col = to_col(column)
    name = normalize_col_str(column)
    col_str = F.trim(col.cast("string")) if trim_strings else col.cast("string")
    condition = col.isNotNull() & (col_str != F.lit(""))
    return make_condition(condition, f"Column '{name}' value is not null or empty", f"{name}_is_not_null_or_empty")


@register_rule("row")
def has_valid_string_case(column: str | Column, case: str = "upper") -> Column:
    """Fail when the string is not in the given case: upper/lower/title/sentence
    (reference check_funcs.py:277)."""
    col = to_col(column)
    name = normalize_col_str(column)
    if case == "upper":
        expected = F.upper(col)
    elif case == "lower":
        expected = F.lower(col)
    elif case == "title":
        expected = F.initcap(col)
    elif case == "sentence":
        expected = F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.expr(f"substring({_sql(col)}, 2)")))
    else:
        raise ValueError(f"unsupported case: {case!r} (use upper/lower/title/sentence)")
    return make_condition(
        col != expected,
        F.format_string(f"Value '%s' in Column '{name}' is not {case} case", str_value(col)),
        f"{name}_has_invalid_string_case",
    )


def _sql(col: Column) -> str:
    """Inline a Column back into SQL text (only used on plain column refs)."""
    raw = str(col)
    import re

    m = re.match(r"Column<'(.*)'>$", raw, re.DOTALL)
    return m.group(1) if m else raw


# ---------------------------------------------------------------------------
# list membership
# ---------------------------------------------------------------------------
def _in_list_core(col: Column, allowed: list, case_sensitive: bool) -> Column:
    lits = [F.lit(v) for v in allowed]
    if not case_sensitive:
        return F.lower(col).isin(*[F.lower(l) for l in lits])
    return col.isin(*lits)


@register_rule("row")
def is_not_null_and_is_in_list(column: str | Column, allowed: list, case_sensitive: bool = True) -> Column:
    """Fail when null or not in the allowed list (reference check_funcs.py:352)."""
    if not allowed:
        raise ValueError("allowed list must not be empty")
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNull() | ~_in_list_core(col, allowed, case_sensitive)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is null or not in the allowed list", str_value(col)),
        f"{name}_is_null_or_is_not_in_the_list",
    )


@register_rule("row")
def is_in_list(column: str | Column, allowed: list, case_sensitive: bool = True) -> Column:
    """Fail when not in the allowed list; nulls pass (reference check_funcs.py:406)."""
    if not allowed:
        raise ValueError("allowed list must not be empty")
    col = to_col(column)
    name = normalize_col_str(column)
    condition = ~_in_list_core(col, allowed, case_sensitive)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not in the allowed list", str_value(col)),
        f"{name}_is_not_in_the_list",
    )


@register_rule("row")
def is_not_in_list(column: str | Column, forbidden: list, case_sensitive: bool = True) -> Column:
    """Fail when the value IS in the forbidden list (reference check_funcs.py:464)."""
    if not forbidden:
        raise ValueError("forbidden list must not be empty")
    col = to_col(column)
    name = normalize_col_str(column)
    condition = _in_list_core(col, forbidden, case_sensitive)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is in the forbidden list", str_value(col)),
        f"{name}_is_in_the_forbidden_list",
    )


# ---------------------------------------------------------------------------
# arbitrary SQL expression
# ---------------------------------------------------------------------------
@register_rule("row")
def sql_expression(
    expression: str,
    msg: str | None = None,
    name: str | None = None,
    negate: bool = False,
    columns: list | None = None,
) -> Column:
    """Fail when the boolean SQL expression does NOT hold (or holds, if
    ``negate``) (reference check_funcs.py:521-563).  ``columns`` is
    documentation-only metadata."""
    expr_col = F.expr(expression)
    # NULL result of the user expression means "not satisfied".  Default
    # branch: not satisfied -> fail (deliberate deviation from the
    # reference, where a NULL expression silently passes).  Negate branch:
    # fail only when the expression HOLDS, so NULL -> pass — coalescing to
    # True here would invert the semantics (r4 review).
    condition = F.coalesce(expr_col, F.lit(False)) if negate else F.coalesce(~expr_col, F.lit(True))
    default_name = normalize_col_str(expression) + ("_is_true" if negate else "_is_false")
    message = msg or f"Value is {'matching' if negate else 'not matching'} expression: {expression}"
    return make_condition(condition, message, name or default_name)


# ---------------------------------------------------------------------------
# date / timestamp family
# ---------------------------------------------------------------------------
@register_rule("row")
def is_older_than_col2_for_n_days(
    column1: str | Column,
    column2: str | Column,
    days: int = 0,
    negate: bool = False,
) -> Column:
    """col1 must be at least n days older than col2 (reference check_funcs.py:567)."""
    col1, col2 = to_col(column1), to_col(column2)
    n1, n2 = normalize_col_str(column1), normalize_col_str(column2)
    diff = F.datediff(col2.try_cast("date"), col1.try_cast("date"))
    condition = (diff >= F.lit(days)) if negate else (diff < F.lit(days))
    verb = "is older" if negate else "is not older"
    return make_condition(
        condition,
        F.format_string(
            f"Value '%s' in Column '{n1}' {verb} than value '%s' in Column '{n2}' for {days} days",
            str_value(col1),
            str_value(col2),
        ),
        f"is_col_{n1}_older_than_{n2}_for_n_days",
    )


@register_rule("row")
def is_older_than_n_days(
    column: str | Column,
    days: int,
    curr_date: Column | str | datetime.date | None = None,
    negate: bool = False,
) -> Column:
    """Value must be at least n days old vs curr_date (reference check_funcs.py:617)."""
    col = to_col(column)
    name = normalize_col_str(column)
    curr = F.current_date() if curr_date is None else (F.lit(curr_date) if not isinstance(curr_date, Column) else curr_date)
    diff = F.datediff(F.to_date(curr), col.try_cast("date"))
    condition = (diff >= F.lit(days)) if negate else (diff < F.lit(days))
    verb = "is older" if negate else "is not older"
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' {verb} than {days} days", str_value(col)),
        f"{name}_is_older_than_n_days",
    )


@register_rule("row")
def is_not_in_future(
    column: str | Column,
    offset: int = 0,
    curr_timestamp: Column | str | datetime.datetime | None = None,
) -> Column:
    """Fail when ts > now + offset seconds (reference check_funcs.py:668)."""
    col = to_col(column)
    name = normalize_col_str(column)
    curr = (
        F.current_timestamp()
        if curr_timestamp is None
        else (F.lit(curr_timestamp).cast("timestamp") if not isinstance(curr_timestamp, Column) else curr_timestamp)
    )
    bound = curr + F.expr(f"INTERVAL {int(offset)} SECONDS")
    return make_condition(
        col.try_cast("timestamp") > bound,
        F.format_string(f"Value '%s' in Column '{name}' is in the future", str_value(col)),
        f"{name}_in_future",
    )


@register_rule("row")
def is_not_in_near_future(
    column: str | Column,
    offset: int = 0,
    curr_timestamp: Column | str | datetime.datetime | None = None,
) -> Column:
    """Fail when now < ts < now + offset seconds (reference check_funcs.py:702)."""
    col = to_col(column)
    name = normalize_col_str(column)
    curr = (
        F.current_timestamp()
        if curr_timestamp is None
        else (F.lit(curr_timestamp).cast("timestamp") if not isinstance(curr_timestamp, Column) else curr_timestamp)
    )
    bound = curr + F.expr(f"INTERVAL {int(offset)} SECONDS")
    return make_condition(
        (col.try_cast("timestamp") > curr) & (col.try_cast("timestamp") < bound),
        F.format_string(f"Value '%s' in Column '{name}' is in the near future", str_value(col)),
        f"{name}_in_near_future",
    )


#: Python strftime directive -> Spark datetime pattern (both public
#: conventions appear in the wild: ODCS tooling and the reference's
#: contract generator emit strftime, Spark checks expect Java-style)
_STRFTIME_TO_SPARK = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%p": "a",
    "%j": "DDD", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%z": "xx", "%Z": "zzz",
}


def _normalize_datetime_format(fmt: str | None) -> str | None:
    """Accept Python strftime patterns ('%Y-%m-%d') alongside Spark/Java
    ones ('yyyy-MM-dd'): strftime directives are rewritten to the Spark
    pattern letters ``try_to_timestamp`` understands.  The reference's
    datacontract generator emits strftime (contract_rules_generator.py:
    1009) while its own is_valid_date expects Spark patterns
    (check_funcs.py:1026) — normalizing here makes both spellings work.

    Literal runs between directives are single-quoted so letters like the
    ISO 'T' separator ('%Y-%m-%dT%H:%M:%S') survive as literals instead of
    becoming an invalid pattern that crashes at task time; unmapped
    directives raise ``InvalidParameterError`` at rule-build time rather
    than leaving a bare '%' for Spark to reject mid-job.

    Dialect selection: a RECOGNIZED strftime directive (or ``%%``)
    OUTSIDE single-quoted runs selects the strftime interpretation.  When
    every recognized directive sits inside BALANCED single-quoted runs,
    the pattern is a legal Java pattern whose quoted literal merely
    contains a %X (``"'%H' HH"``) and passes through untouched; with
    UNBALANCED quotes the quote positions are unreliable (strftime text
    may carry apostrophes — ``"o'clock %H"``) so the strftime
    interpretation wins.  Without any recognized directive, a pattern
    whose every '%' sits inside a single-quoted run is a legal Java
    literal (``"HH:mm '%'"``) and passes through; an unquoted '%' with
    no known directive is valid in NEITHER convention and falls through
    to the tokenizer's loud rejection."""
    if not fmt or "%" not in fmt:
        return fmt
    in_quote = False
    any_directive = False
    unquoted_directive = False
    has_unquoted_percent = False
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "'":
            in_quote = not in_quote
            i += 1
            continue
        if ch == "%":
            tok = fmt[i : i + 2]
            if tok == "%%" or tok in _STRFTIME_TO_SPARK:
                any_directive = True
                if not in_quote:
                    unquoted_directive = True
                i += 2
                continue
            if not in_quote:
                has_unquoted_percent = True
        i += 1
    quotes_balanced = not in_quote
    if any_directive:
        # pass through ONLY a fully legal Java pattern: directives confined
        # to balanced quoted runs AND no bare unquoted '%' anywhere (a bare
        # unquoted '%' is valid in neither convention and must fall through
        # to the tokenizer's loud build-time rejection)
        if not unquoted_directive and quotes_balanced and not has_unquoted_percent:
            return fmt
    elif not has_unquoted_percent:
        return fmt
    out: list[str] = []
    literal: list[str] = []

    def _flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        # Only letter-bearing (or quote-bearing) runs need quoting: Java
        # datetime patterns pass non-letters like '-', ':', '/' through.
        if any(ch.isalpha() for ch in run) or "'" in run:
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)
        literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            literal.append(ch)
            i += 1
            continue
        tok = fmt[i : i + 2]
        if tok == "%%":
            literal.append("%")
        elif tok in _STRFTIME_TO_SPARK:
            _flush()
            out.append(_STRFTIME_TO_SPARK[tok])
        else:
            raise InvalidParameterError(
                f"Unsupported strftime directive {tok!r} in datetime format {fmt!r}; "
                f"supported: {' '.join(sorted(_STRFTIME_TO_SPARK))} (or pass a Spark/Java pattern)"
            )
        i += 2
    _flush()
    return "".join(out)


@register_rule("row")
def is_valid_date(column: str | Column, date_format: str | None = None) -> Column:
    """Fail when the string doesn't parse as a date (reference check_funcs.py:1026).
    ``date_format`` accepts Spark/Java patterns or Python strftime."""
    col = to_col(column)
    name = normalize_col_str(column)
    spark_fmt = _normalize_datetime_format(date_format)
    parsed = F.try_to_timestamp(col, F.lit(spark_fmt)) if date_format else col.try_cast("date")
    condition = col.isNotNull() & parsed.isNull()
    fmt = f" with format '{_fmt_literal(date_format)}'" if date_format else ""
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid date{fmt}", str_value(col)),
        f"{name}_is_not_valid_date",
    )


@register_rule("row")
def is_valid_timestamp(column: str | Column, timestamp_format: str | None = None) -> Column:
    """Fail when the string doesn't parse as a timestamp (reference check_funcs.py:1050).
    ``timestamp_format`` accepts Spark/Java patterns or Python strftime."""
    col = to_col(column)
    name = normalize_col_str(column)
    spark_fmt = _normalize_datetime_format(timestamp_format)
    parsed = F.try_to_timestamp(col, F.lit(spark_fmt)) if timestamp_format else col.try_cast("timestamp")
    condition = col.isNotNull() & parsed.isNull()
    fmt = f" with format '{_fmt_literal(timestamp_format)}'" if timestamp_format else ""
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid timestamp{fmt}", str_value(col)),
        f"{name}_is_not_valid_timestamp",
    )


@register_rule("row")
def is_data_fresh(
    column: str | Column,
    max_age_minutes: int,
    base_timestamp: Column | str | datetime.datetime | None = None,
) -> Column:
    """Fail when ts is older than max_age_minutes vs base ts
    (reference check_funcs.py:1701)."""
    col = to_col(column)
    name = normalize_col_str(column)
    base = (
        F.current_timestamp()
        if base_timestamp is None
        else (F.lit(base_timestamp).cast("timestamp") if not isinstance(base_timestamp, Column) else base_timestamp)
    )
    condition = col.try_cast("timestamp") < (base - F.expr(f"INTERVAL {int(max_age_minutes)} MINUTES"))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is older than {int(max_age_minutes)} minutes", str_value(col)),
        f"{name}_is_not_fresh",
    )


# ---------------------------------------------------------------------------
# comparison family
# ---------------------------------------------------------------------------
def _eq_with_tolerance(col: Column, limit: Column, abs_tolerance, rel_tolerance) -> Column:
    """Null-safe equality, tolerance-banded when either tolerance is set
    (reference check_funcs.py:764-776 + _match_values_with_tolerance)."""
    if (abs_tolerance or 0) < 0 or (rel_tolerance or 0) < 0:
        raise ValueError("abs_tolerance and rel_tolerance must be non-negative")
    from dqx_spark.functions._helpers import within_tolerance  # noqa: PLC0415

    if abs_tolerance or rel_tolerance:
        # coalesce: one-side-null compares as NOT equal, matching the
        # null-safe exact path below
        return F.coalesce(within_tolerance(col, limit, abs_tolerance, rel_tolerance), F.lit(False))
    return col.eqNullSafe(limit)


@register_rule("row")
def is_equal_to(
    column: str | Column, value, abs_tolerance: float | None = None, rel_tolerance: float | None = None
) -> Column:
    """Fail when col != value; tolerances band numeric comparisons
    (reference check_funcs.py:739)."""
    col = to_col(column)
    name = normalize_col_str(column)
    limit = get_limit_expr(value)
    condition = ~_eq_with_tolerance(col, limit, abs_tolerance, rel_tolerance)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not equal to '%s'", str_value(col), str_value(limit)),
        f"{name}_is_not_equal_to",
    )


@register_rule("row")
def is_not_equal_to(
    column: str | Column, value, abs_tolerance: float | None = None, rel_tolerance: float | None = None
) -> Column:
    """Fail when col == value (within tolerance, when set)
    (reference check_funcs.py:794)."""
    col = to_col(column)
    name = normalize_col_str(column)
    limit = get_limit_expr(value)
    condition = _eq_with_tolerance(col, limit, abs_tolerance, rel_tolerance)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is equal to '%s'", str_value(col), str_value(limit)),
        f"{name}_is_equal_to",
    )


@register_rule("row")
def is_not_less_than(column: str | Column, limit) -> Column:
    """Fail when col < limit (reference check_funcs.py:850)."""
    col = to_col(column)
    name = normalize_col_str(column)
    limit_expr = get_limit_expr(limit)
    return make_condition(
        col < limit_expr,
        F.format_string(f"Value '%s' in Column '{name}' is less than limit: %s", str_value(col), str_value(limit_expr)),
        f"{name}_less_than_limit",
    )


@register_rule("row")
def is_not_greater_than(column: str | Column, limit) -> Column:
    """Fail when col > limit (reference check_funcs.py:880)."""
    col = to_col(column)
    name = normalize_col_str(column)
    limit_expr = get_limit_expr(limit)
    return make_condition(
        col > limit_expr,
        F.format_string(f"Value '%s' in Column '{name}' is greater than limit: %s", str_value(col), str_value(limit_expr)),
        f"{name}_greater_than_limit",
    )


@register_rule("row")
def is_in_range(column: str | Column, min_limit, max_limit) -> Column:
    """Fail when outside [min, max] (reference check_funcs.py:910)."""
    col = to_col(column)
    name = normalize_col_str(column)
    lo, hi = get_limit_expr(min_limit), get_limit_expr(max_limit)
    return make_condition(
        (col < lo) | (col > hi),
        F.format_string(
            f"Value '%s' in Column '{name}' is not in the allowed range: [%s, %s]",
            str_value(col),
            str_value(lo),
            str_value(hi),
        ),
        f"{name}_not_in_range",
    )


@register_rule("row")
def is_not_in_range(column: str | Column, min_limit, max_limit) -> Column:
    """Fail when inside [min, max] (reference check_funcs.py:948)."""
    col = to_col(column)
    name = normalize_col_str(column)
    lo, hi = get_limit_expr(min_limit), get_limit_expr(max_limit)
    return make_condition(
        (col >= lo) & (col <= hi),
        F.format_string(
            f"Value '%s' in Column '{name}' is in the forbidden range: [%s, %s]",
            str_value(col),
            str_value(lo),
            str_value(hi),
        ),
        f"{name}_in_range",
    )


# ---------------------------------------------------------------------------
# pattern family
# ---------------------------------------------------------------------------
@register_rule("row")
def regex_match(column: str | Column, regex: str, negate: bool = False) -> Column:
    """Fail when the value does not match (or matches, if negate)
    (reference check_funcs.py:986)."""
    col = to_col(column)
    name = normalize_col_str(column)
    matches = col.rlike(regex)
    condition = matches if negate else ~matches
    verb = "matching" if negate else "not matching"
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is {verb} regex: {_fmt_literal(regex)}", str_value(col)),
        f"{name}_regex_match",
    )


@register_rule("row")
def is_not_null_and_not_empty_array(column: str | Column) -> Column:
    """Fail when the array is null or empty (reference check_funcs.py:1009)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNull() | (F.size(col) == 0)
    return make_condition(condition, f"Column '{name}' array is null or empty", f"{name}_is_null_or_empty_array")


_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
IPV4_REGEX = rf"^({_IPV4_OCTET}\.){{3}}{_IPV4_OCTET}$"
# RFC-5322 subset, mirrors the reference's email pattern intent (check_funcs.py:92-107)
EMAIL_REGEX = r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$"

NATIONAL_ID_PATTERNS = {
    # US SSN (reference check_funcs.py:112)
    "US": r"^(?!000|666|9\d{2})\d{3}-(?!00)\d{2}-(?!0000)\d{4}$",
    "UK": r"^[A-CEGHJ-PR-TW-Z]{2}\d{6}[A-D]$",
    "CA": r"^\d{3}-\d{3}-\d{3}$",
    "DE": r"^\d{11}$",
    "FR": r"^[12]\d{2}(0[1-9]|1[0-2])\d{2}\d{3}\d{3}\d{2}$",
    "IN": r"^[2-9]\d{3}\s?\d{4}\s?\d{4}$",
}


@register_rule("row")
def is_valid_ipv4_address(column: str | Column) -> Column:
    """Anchored-regex IPv4 validity (reference check_funcs.py:1078)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~col.rlike(IPV4_REGEX)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid IPv4 address", str_value(col)),
        f"{name}_is_not_valid_ipv4",
    )


@register_rule("row")
def is_ipv4_address_in_cidr(column: str | Column, cidr_block: str) -> Column:
    """Pure-expression membership test: octets -> 32-bit int, compare the
    network prefix with shiftright.  Stays JVM-side/codegen (the reference
    uses binary-string math, check_funcs.py:1559, 4690-4724 — same semantics,
    different arithmetic)."""
    net = ipaddress.ip_network(cidr_block, strict=False)
    if net.version != 4:
        raise ValueError(f"not an IPv4 CIDR block: {cidr_block!r}")
    col = to_col(column)
    name = normalize_col_str(column)
    octets = F.split(col, r"\.")
    ip_int = (
        octets.getItem(0).cast("long") * F.lit(16777216)
        + octets.getItem(1).cast("long") * F.lit(65536)
        + octets.getItem(2).cast("long") * F.lit(256)
        + octets.getItem(3).cast("long")
    )
    shift = 32 - net.prefixlen
    net_int = int(net.network_address)
    outside = (
        F.shiftright(ip_int, shift) != F.lit(net_int >> shift)
        if shift < 32
        else F.lit(False)
    )
    condition = col.isNotNull() & (~col.rlike(IPV4_REGEX) | outside)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not in the CIDR block {_fmt_literal(cidr_block)}", str_value(col)),
        f"{name}_is_not_ipv4_in_cidr",
    )


def _ipv6_valid_udf():
    @F.pandas_udf(T.BooleanType())
    def _valid(s):
        def ok(v):
            if v is None:
                return None
            try:
                ipaddress.IPv6Address(v)
                return True
            except ValueError:
                return False

        return s.map(ok)

    return _valid


@register_rule("row")
def is_valid_ipv6_address(column: str | Column) -> Column:
    """IPv6 validity via an Arrow-batched pandas UDF over the ``ipaddress``
    stdlib (the reference uses a row-at-a-time Python UDF,
    check_funcs.py:4726-4779 — pandas_udf is the faster Spark-first choice)."""
    col = to_col(column)
    name = normalize_col_str(column)
    valid = _ipv6_valid_udf()(col.cast("string"))
    condition = col.isNotNull() & ~F.coalesce(valid, F.lit(False))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid IPv6 address", str_value(col)),
        f"{name}_is_not_valid_ipv6",
    )


@register_rule("row")
def is_ipv6_address_in_cidr(column: str | Column, cidr_block: str) -> Column:
    """IPv6 CIDR membership via pandas UDF (reference check_funcs.py:1641)."""
    net = ipaddress.ip_network(cidr_block, strict=False)
    if net.version != 6:
        raise ValueError(f"not an IPv6 CIDR block: {cidr_block!r}")

    @F.pandas_udf(T.BooleanType())
    def _in_cidr(s):
        net_local = ipaddress.ip_network(cidr_block, strict=False)

        def member(v):
            if v is None:
                return None
            try:
                return ipaddress.IPv6Address(v) in net_local
            except ValueError:
                return False

        return s.map(member)

    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~F.coalesce(_in_cidr(col.cast("string")), F.lit(False))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not in the CIDR block {_fmt_literal(cidr_block)}", str_value(col)),
        f"{name}_is_not_ipv6_in_cidr",
    )


@register_rule("row")
def is_valid_email(column: str | Column) -> Column:
    """RFC-5322-subset regex (reference check_funcs.py:1091)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~col.rlike(EMAIL_REGEX)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid email address", str_value(col)),
        f"{name}_is_not_valid_email",
    )


@register_rule("row")
def is_valid_national_id(column: str | Column, country: str = "US") -> Column:
    """Per-country national-id regex (reference check_funcs.py:1124)."""
    pattern = NATIONAL_ID_PATTERNS.get(country.upper())
    if pattern is None:
        raise ValueError(f"unsupported country for national id: {country!r}")
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & ~col.rlike(pattern)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid {country.upper()} national id", str_value(col)),
        f"{name}_is_not_valid_national_id",
    )


def _iso_check(column, codes: list[str], what: str, case_sensitive: bool) -> Column:
    col = to_col(column)
    name = normalize_col_str(column)
    target = col if case_sensitive else F.upper(col)
    pool = codes if case_sensitive else [c.upper() for c in codes]
    condition = col.isNotNull() & ~target.isin(*pool)
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid {what}", str_value(col)),
        f"{name}_is_not_valid_{what.replace(' ', '_')}",
    )


def _pick_code_format(code_format: str, pools: dict[str, list[str]], kind: str) -> list[str]:
    """Resolve a code_format name case-insensitively, accepting both the
    reference's hyphenated spellings ('alpha-2') and bare ones ('alpha2')."""
    if not isinstance(code_format, str):
        raise TypeError(f"code_format must be a string, got {type(code_format)!r}")
    key = code_format.lower().replace("-", "")
    if key not in pools:
        raise ValueError(
            f"unsupported code_format for {kind}: {code_format!r}; supported: {sorted(pools)}"
        )
    return pools[key]


@register_rule("row")
def is_valid_country_code(column: str | Column, code_format: str = "alpha-2", case_sensitive: bool = True) -> Column:
    """ISO 3166-1 membership in the chosen representation: alpha-2 (default),
    alpha-3 or numeric (reference check_funcs.py:1323)."""
    pools = {
        "alpha2": iso_codes.COUNTRY_ALPHA2,
        "alpha3": iso_codes.COUNTRY_ALPHA3,
        "numeric": iso_codes.COUNTRY_NUMERIC,
    }
    return _iso_check(column, _pick_code_format(code_format, pools, "country code"), "country code", case_sensitive)


@register_rule("row")
def is_valid_currency_code(column: str | Column, code_format: str = "alphabetic", case_sensitive: bool = True) -> Column:
    """ISO 4217 membership: alphabetic (default) or numeric
    (reference check_funcs.py:1367)."""
    pools = {"alphabetic": iso_codes.CURRENCY_CODES, "numeric": iso_codes.CURRENCY_NUMERIC}
    return _iso_check(column, _pick_code_format(code_format, pools, "currency code"), "currency code", case_sensitive)


@register_rule("row")
def is_valid_subdivision_code(
    column: str | Column, case_sensitive: bool = True, country_column: str | Column | None = None
) -> Column:
    """ISO 3166-2 structural validity: 'CC-SSS' with a valid country prefix
    (reference check_funcs.py:1437 validates against the full ~5,000-entry
    table; we validate structure + country — documented deviation).

    ``country_column`` cross-checks the subdivision's country prefix against
    another column on the same row (reference :1438-1508): ``US-CA`` with
    ``country='GB'`` is flagged.  A null country value passes (SQL null
    propagation, matching the reference)."""
    col = to_col(column)
    name = normalize_col_str(column)
    target = col if case_sensitive else F.upper(col)
    pool = iso_codes.COUNTRY_ALPHA2
    shape_ok = target.rlike(r"^[A-Z]{2}-[A-Z0-9]{1,3}$")
    country_ok = F.substring(target, 1, 2).isin(*pool)
    invalid = ~(shape_ok & country_ok)
    if country_column is not None:
        cc = to_col(country_column)
        cc_cmp = cc if case_sensitive else F.upper(cc)
        prefix = F.split(target, "-").getItem(0)
        # != is NULL when country is NULL -> row passes (reference :1497)
        invalid = invalid | F.coalesce(prefix != cc_cmp, F.lit(False))
    condition = col.isNotNull() & invalid
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid subdivision code", str_value(col)),
        f"{name}_is_not_valid_subdivision_code",
    )


@register_rule("row")
def is_valid_language_code(column: str | Column, code_format: str = "alpha-2", case_sensitive: bool = True) -> Column:
    """ISO 639 membership: alpha-2 = ISO 639-1 (default); alpha-3 = the
    ISO 639-2/T terminology codes for those languages — a documented subset
    of the reference's full ISO 639-3 registry (reference check_funcs.py:1516)."""
    pools = {"alpha2": iso_codes.LANGUAGE_CODES, "alpha3": iso_codes.LANGUAGE_ALPHA3}
    return _iso_check(column, _pick_code_format(code_format, pools, "language code"), "language code", case_sensitive)


# ---------------------------------------------------------------------------
# JSON family
# ---------------------------------------------------------------------------
@register_rule("row")
def is_valid_json(column: str | Column) -> Column:
    """Fail when the string is not parseable JSON (reference check_funcs.py:3338)."""
    col = to_col(column)
    name = normalize_col_str(column)
    condition = col.isNotNull() & F.try_parse_json(col).isNull()
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not valid JSON", str_value(col)),
        f"{name}_is_not_valid_json",
    )


@register_rule("row")
def has_json_keys(column: str | Column, keys: list[str], require_all: bool = True) -> Column:
    """Fail when required top-level keys are missing
    (reference check_funcs.py:3362)."""
    if not keys:
        raise ValueError("keys must not be empty")
    col = to_col(column)
    name = normalize_col_str(column)
    actual = F.json_object_keys(col)
    wanted = F.array(*[F.lit(k) for k in keys])
    if require_all:
        missing = F.array_except(wanted, F.coalesce(actual, F.array()))
        bad = F.size(missing) > 0
    else:
        bad = ~F.arrays_overlap(F.coalesce(actual, F.array()), wanted)
    condition = col.isNotNull() & (actual.isNull() | bad)
    mode = "all of" if require_all else "any of"
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' does not contain {mode} keys: {_fmt_literal(keys)}", str_value(col)),
        f"{name}_does_not_have_json_keys",
    )


@register_rule("row")
def has_valid_json_schema(column: str | Column, schema: str) -> Column:
    """Fail when the JSON doesn't conform to the DDL schema: malformed
    documents (corrupt-record probe) or NOT NULL fields missing/null
    (reference check_funcs.py:3414, 3721-3755)."""
    col = to_col(column)
    name = normalize_col_str(column)
    expected = T._parse_datatype_string(schema)  # DDL string -> StructType
    if not isinstance(expected, T.StructType):
        raise ValueError("schema must be a struct DDL string")
    corrupt = "_corrupt_record"
    probe_schema = T.StructType(list(expected.fields) + [T.StructField(corrupt, T.StringType(), True)])
    parsed = F.from_json(col, probe_schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt})
    bad = parsed.isNull() | parsed.getField(corrupt).isNotNull()
    for f_ in expected.fields:
        if not f_.nullable:
            bad = bad | parsed.getField(f_.name).isNull()
    condition = col.isNotNull() & bad
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' does not conform to schema: {_fmt_literal(schema)}", str_value(col)),
        f"{name}_has_invalid_json_schema",
    )


# ---------------------------------------------------------------------------
# geo-lite (pure math; full ST_* family is an optional extension module)
# ---------------------------------------------------------------------------
@register_rule("row")
def is_latitude(column: str | Column) -> Column:
    """try_cast(double) between ±90 (reference geo/check_funcs.py:63)."""
    col = to_col(column)
    name = normalize_col_str(column)
    v = col.try_cast("double")
    condition = col.isNotNull() & (v.isNull() | (v < -90.0) | (v > 90.0))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid latitude", str_value(col)),
        f"{name}_is_not_latitude",
    )


@register_rule("row")
def is_longitude(column: str | Column) -> Column:
    """try_cast(double) between ±180 (reference geo/check_funcs.py:86)."""
    col = to_col(column)
    name = normalize_col_str(column)
    v = col.try_cast("double")
    condition = col.isNotNull() & (v.isNull() | (v < -180.0) | (v > 180.0))
    return make_condition(
        condition,
        F.format_string(f"Value '%s' in Column '{name}' is not a valid longitude", str_value(col)),
        f"{name}_is_not_longitude",
    )


# ---------------------------------------------------------------------------
# PII (lightweight built-in; presidio engine optional)
# ---------------------------------------------------------------------------
def _luhn_ok(digits: Column) -> Column:
    """Luhn mod-10 checksum over a digit string, as a pure Column
    expression: reverse, double every second digit (subtracting 9 above
    9), sum mod 10 == 0."""
    chars = F.filter(F.split(F.reverse(digits), ""), lambda c: c.rlike("[0-9]"))
    vals = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    return (F.size(chars) >= 13) & ((F.aggregate(vals, F.lit(0), lambda a, v: a + v) % 10) == 0)


def _card_in_digit_run(d: Column) -> Column:
    """True when a digit run contains a credit-card number at ANY offset —
    pure Column arithmetic, no UDF.

    A bare windowed Luhn scan over every 13-19 digit window would flag
    ~65% of arbitrary 16+-digit runs (each window passes Luhn with p≈0.1),
    so windows are constrained to the real card-network grammar first:
    start at a valid IIN prefix, use only that network's issued lengths,
    THEN require the Luhn checksum.  Covers Visa 4- (13/16/19), Mastercard
    51-55 / 2221-2720 (16), Amex 34/37 (15), Discover 6011/65 (16-19) —
    so a valid card embedded in a longer run (e.g. preceded by a stray
    digit) is still found, and 13-15 digit formats are no longer missed.
    """
    L = F.length(d)

    def luhn_at(s, n: int) -> Column:
        return (s + F.lit(n - 1) <= L) & _luhn_ok(d.substr(s, F.lit(n)))

    def network_ok(s) -> Column:
        c1, c2, c4 = d.substr(s, F.lit(1)), d.substr(s, F.lit(2)), d.substr(s, F.lit(4))
        visa = (c1 == "4") & (luhn_at(s, 13) | luhn_at(s, 16) | luhn_at(s, 19))
        mastercard = c2.rlike("^(5[1-5]|2[2-7])") & luhn_at(s, 16)
        amex = c2.isin("34", "37") & luhn_at(s, 15)
        discover = ((c4 == "6011") | (c2 == "65")) & (
            luhn_at(s, 16) | luhn_at(s, 17) | luhn_at(s, 18) | luhn_at(s, 19)
        )
        return visa | mastercard | amex | discover

    # window starts: any offset where >=13 digits remain
    return F.when(L >= 13, F.exists(F.sequence(F.lit(1), L - 12), network_ok)).otherwise(F.lit(False))


#: CREDIT_CARD candidates: MAXIMAL separated digit runs of >=13 digits
#: (boundary lookarounds stop a run from being split one digit early —
#: non-overlapping extraction of a fixed 4x4 shape used to consume a valid
#: card preceded by a stray digit into a misaligned window)
_CARD_RUN_REGEX = r"((?<![0-9])[0-9](?:[ \-]?[0-9]){12,})(?![0-9])"

_PII_PATTERNS = {
    "EMAIL_ADDRESS": EMAIL_REGEX.strip("^$"),
    "US_SSN": r"\d{3}-\d{2}-\d{4}",
    "PHONE_NUMBER": r"(\+?\d{1,2}[\s.-]?)?(\(?\d{3}\)?[\s.-]?)\d{3}[\s.-]?\d{4}",
    "CREDIT_CARD": _CARD_RUN_REGEX,
    "IP_ADDRESS": IPV4_REGEX.strip("^$"),
}

#: per-process AnalyzerEngine cache — Presidio loads an NLP model; build it
#: once per executor, not once per Arrow batch
_PRESIDIO_ENGINES: dict = {}

#: memoized driver-side availability probe for the engine='auto' ladder
_PRESIDIO_AVAILABLE: bool | None = None


def _presidio_available() -> bool:
    """Driver-side probe: can the Presidio NER engine be imported?  Used by
    ``does_not_contain_pii(engine='auto')`` to pick NER when present —
    the same availability-ladder pattern as
    :func:`dqx_spark.pipeline.multimodal._select_image_encoder`.  Assumes
    driver and executors share the environment (true for every supported
    deployment mode); force ``engine='regex'`` where they don't."""
    global _PRESIDIO_AVAILABLE
    if _PRESIDIO_AVAILABLE is None:
        try:
            import presidio_analyzer  # noqa: F401, PLC0415

            _PRESIDIO_AVAILABLE = True
        except ImportError:
            _PRESIDIO_AVAILABLE = False
    return _PRESIDIO_AVAILABLE


def presidio_analyzer(
    entities: list[str] | None = None,
    language: str = "en",
    score_threshold: float = 0.7,
    nlp_engine_config: dict | None = None,
) -> Callable:
    """Ready-made ``analyzer=`` hook for :func:`does_not_contain_pii` backed
    by Microsoft Presidio — the NER engine the reference wraps
    (pii/pii_detection_funcs.py:118-186)::

        C.does_not_contain_pii, column="notes",
        check_func_kwargs={"analyzer": C.presidio_analyzer()}

    The ``presidio_analyzer`` package is imported lazily inside the returned
    callable, so the import cost (and the dependency itself) lives on the
    executors; where the package is absent the task raises ``ImportError``
    with an install hint.  The ``AnalyzerEngine`` is cached per process —
    NLP model load happens once per executor, then Arrow batches stream
    through it."""
    ents = tuple(entities) if entities else None

    def analyze(s):
        import pandas as pd  # noqa: PLC0415  (executor-side)

        # one engine per process: entities and score_threshold are applied
        # per analyze() call, so differently-configured adapters share the
        # same (expensive) NLP model
        key = "analyzer" if nlp_engine_config is None else f"analyzer:{sorted(nlp_engine_config.items())!r}"
        eng = _PRESIDIO_ENGINES.get(key)
        if eng is None:
            try:
                from presidio_analyzer import AnalyzerEngine  # noqa: PLC0415
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "does_not_contain_pii(analyzer=presidio_analyzer()) needs the "
                    "'presidio-analyzer' package on the executors "
                    "(pip install presidio-analyzer)"
                ) from exc
            if nlp_engine_config is not None:
                # custom NLP engine (reference pii_detection_funcs.py:52 —
                # e.g. a different spaCy model per language)
                from presidio_analyzer.nlp_engine import NlpEngineProvider  # noqa: PLC0415

                nlp_engine = NlpEngineProvider(nlp_configuration=dict(nlp_engine_config)).create_engine()
                eng = AnalyzerEngine(nlp_engine=nlp_engine)
            else:
                eng = AnalyzerEngine()
            _PRESIDIO_ENGINES[key] = eng

        def hit(v) -> bool:
            if v is None or v == "":
                return False
            results = eng.analyze(
                text=str(v), language=language, entities=list(ents) if ents else None
            )
            return any(r.score >= score_threshold for r in results)

        return pd.Series([hit(v) for v in s], index=s.index)

    return analyze


@register_rule("row")
def does_not_contain_pii(
    column: str | Column,
    language: str | None = None,
    threshold: float | None = None,
    entities: list[str] | None = None,
    nlp_engine_config: dict | None = None,
    analyzer: Callable | None = None,
    engine: str = "auto",
) -> Column:
    """Fail when the text contains PII-looking entities.

    The reference wraps Microsoft Presidio in a pandas UDF
    (pii/pii_detection_funcs.py:33-186).  Engine selection (``engine=``):

    - ``'auto'`` (default): Presidio NER when the ``presidio_analyzer``
      package is importable, else the regex battery — the same
      availability ladder as the image-encoder selection
      (multimodal.py).  With Presidio installed, free-text entities
      (person names, addresses) are caught by default, matching the
      reference's default engine; without it, structured PII is still
      caught and the message names which engine ran.
    - ``'regex'``: force the JVM-side regex battery over the same entity
      names — faster, deterministic, fully codegen'd; catches structured
      PII (emails, SSNs, phones, cards via windowed network-aware Luhn,
      IPs) but not free-text NER entities.
    - ``'ner'``: force Presidio — raises at task time if the package is
      missing from the executors.
    - ``analyzer=``: a pluggable NER hook — any
      ``Callable[[pd.Series], pd.Series]`` mapping a series of strings to
      a boolean series (True = contains PII).  Wrapped in an Arrow-batched
      pandas UDF.  :func:`presidio_analyzer` is the shipped adapter for
      Microsoft Presidio (lazy executor-side import, per-process engine
      cache)::

          analyzer=presidio_analyzer(entities=["PERSON"], score_threshold=0.6)

      The callable must be picklable (module-level function or closure over
      picklable state); it is instantiated per executor, not per row.

    ``language`` / ``threshold`` / ``nlp_engine_config`` mirror the
    reference signature (pii/pii_detection_funcs.py:33-52): passing any of
    them selects the Presidio NER engine with those settings (equivalent to
    ``analyzer=presidio_analyzer(entities, language, threshold,
    nlp_engine_config)``) — Presidio must then be installed on executors.
    """
    col = to_col(column)
    name = normalize_col_str(column)
    if engine not in ("auto", "regex", "ner"):
        raise ValueError(f"unknown engine {engine!r}: expected auto|regex|ner")
    if engine == "regex" and (analyzer is not None or language is not None
                              or threshold is not None or nlp_engine_config is not None):
        raise ValueError(
            "engine='regex' conflicts with the NER-only parameters "
            "(analyzer/language/threshold/nlp_engine_config)"
        )
    engine_label = "custom analyzer"
    if analyzer is None and (
        engine == "ner"
        or language is not None
        or threshold is not None
        or nlp_engine_config is not None
        or (engine == "auto" and _presidio_available())
    ):
        analyzer = presidio_analyzer(
            entities=entities,
            language=language or "en",
            score_threshold=0.7 if threshold is None else threshold,
            nlp_engine_config=nlp_engine_config,
        )
        engine_label = "presidio"
    if analyzer is not None:

        @F.pandas_udf(T.BooleanType())
        def _detect(s):
            return analyzer(s).astype(bool)

        condition = col.isNotNull() & F.coalesce(_detect(col.cast("string")), F.lit(False))
        return make_condition(
            condition,
            f"Column '{name}' value contains PII ({engine_label})",
            f"{name}_contains_pii",
        )
    chosen = entities or list(_PII_PATTERNS)
    unknown = [e for e in chosen if e not in _PII_PATTERNS]
    if unknown:
        raise ValueError(f"unsupported PII entities: {unknown}; supported: {sorted(_PII_PATTERNS)}")
    hit = None
    for e in chosen:
        if e == "CREDIT_CARD":
            # candidates are maximal >=13-digit runs; each must contain a
            # network-valid Luhn window (pure Column arithmetic) — a bare
            # 16-digit regex flags every order id, and a fixed 4x4 shape
            # misses cards at odd offsets or 13/15/19-digit formats
            cands = F.regexp_extract_all(col, F.lit(_PII_PATTERNS[e]), F.lit(1))
            term = F.coalesce(
                F.exists(cands, lambda c: _card_in_digit_run(F.regexp_replace(c, "[^0-9]", ""))),
                F.lit(False),
            )
        else:
            term = col.rlike(_PII_PATTERNS[e])
        hit = term if hit is None else (hit | term)
    condition = col.isNotNull() & hit
    return make_condition(
        condition,
        f"Column '{name}' value contains PII (entities checked: {sorted(chosen)})",
        f"{name}_contains_pii",
    )
