"""Regression tests for the round-6 advisor findings (ADVICE.md r6):
strftime literal quoting, hostile-MP4 stsz bound, approx-MAD estimator
gating, and composite physicalType detection."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.errors import InvalidParameterError
from dqx_spark.functions.row_checks import (
    _normalize_datetime_format,
    is_valid_date,
    is_valid_timestamp,
)


# ---------------------------------------------------------------------------
# ADVICE high: strftime literals must be quoted, unmapped directives rejected
# ---------------------------------------------------------------------------
def test_strftime_literal_runs_are_quoted():
    # the common ISO form the reference's contract generator emits: the 'T'
    # separator is a LITERAL and must be single-quoted in the Java pattern
    assert _normalize_datetime_format("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    # non-letter separators pass through unquoted (Java treats them literally)
    assert _normalize_datetime_format("%Y-%m-%d") == "yyyy-MM-dd"
    assert _normalize_datetime_format("%d/%m/%Y %H:%M") == "dd/MM/yyyy HH:mm"
    # Spark/Java patterns (no '%') are untouched
    assert _normalize_datetime_format("yyyy-MM-dd'T'HH:mm:ss") == "yyyy-MM-dd'T'HH:mm:ss"
    assert _normalize_datetime_format(None) is None
    # literal '%' via %%; embedded quote is doubled per Java pattern rules
    assert _normalize_datetime_format("%Y%%") == "yyyy%"
    assert _normalize_datetime_format("%H o'clock") == "HH' o''clock'"
    # timezone directives map instead of crashing
    assert _normalize_datetime_format("%Y-%m-%dT%H:%M:%S%z") == "yyyy-MM-dd'T'HH:mm:ss" + "xx"
    # a legal Java pattern carrying a QUOTED literal '%' is not strftime —
    # it must pass through untouched (r7 review: the strftime rewrite must
    # only trigger on an unquoted '%', which no valid Java pattern has)
    assert _normalize_datetime_format("HH:mm '%'") == "HH:mm '%'"
    assert _normalize_datetime_format("'100%' yyyy") == "'100%' yyyy"
    # ...but a RECOGNIZED directive under UNBALANCED quotes selects
    # strftime — strftime text may carry apostrophes, which a naive
    # quote-tracking scan would misread as quoting the directive
    assert _normalize_datetime_format("o'clock %H") == "'o''clock 'HH"
    # (r8 ADVICE) a directive found ONLY inside balanced quoted runs is a
    # Java pattern whose literal happens to contain %X — pass through
    assert _normalize_datetime_format("'%H' HH") == "'%H' HH"
    assert _normalize_datetime_format("HH 'at %Hrs'") == "HH 'at %Hrs'"


def test_strftime_unmapped_directive_raises_at_build_time():
    for bad in ("%Y-%m-%e", "%Q", "trailing %"):
        with pytest.raises(InvalidParameterError, match="strftime"):
            _normalize_datetime_format(bad)


def test_iso_t_format_parses_end_to_end(spark):
    """The exact failure from ADVICE: contract-emitted ISO strftime used to
    crash the whole job with INVALID_DATETIME_PATTERN at task time."""
    df = spark.createDataFrame(
        [("2024-03-01T10:30:00",), ("not a ts",), (None,)], "ts string"
    )
    out = df.select(
        is_valid_timestamp("ts", timestamp_format="%Y-%m-%dT%H:%M:%S").alias("c")
    ).collect()
    msgs = [r["c"] for r in out]
    assert msgs[0] is None  # valid value actually PARSES under the format
    assert msgs[1] is not None and "not a valid timestamp" in msgs[1]
    assert msgs[2] is None  # null passes (is_not_null is a separate check)
    # date flavor too
    out2 = df.select(is_valid_date("ts", date_format="%Y-%m-%dT%H:%M:%S").alias("c")).collect()
    assert out2[0]["c"] is None and out2[1]["c"] is not None


# ---------------------------------------------------------------------------
# ADVICE medium: hostile uniform-stsz MP4 must not allocate multi-GB lists
# ---------------------------------------------------------------------------
def _patch_stsz_uniform(mp4: bytes, uniform: int, count: int) -> bytes:
    i = mp4.index(b"stsz")
    # stsz payload after the type tag: version/flags(4) + uniform(4) + count(4)
    return (
        mp4[: i + 8]
        + uniform.to_bytes(4, "big")
        + count.to_bytes(4, "big")
        + mp4[i + 16 :]
    )


def test_hostile_uniform_stsz_count_is_bounded():
    from dqx_spark.pipeline import multimodal

    mp4 = multimodal.synthesize_mp4([4, 4, 4], sync_samples=[1], samples_per_chunk=3)
    # sanity: the unpatched file parses
    assert multimodal.parse_video_sample_table(mp4) is not None
    # n_samples near 2^32 -> must return None, not allocate a 4-billion list
    hostile = _patch_stsz_uniform(mp4, uniform=1, count=2**32 - 7)
    assert multimodal.parse_video_sample_table(hostile) is None
    # total payload exceeding the file size is equally rejected
    hostile2 = _patch_stsz_uniform(mp4, uniform=2**20, count=1000)
    assert multimodal.parse_video_sample_table(hostile2) is None
    # a PLAUSIBLE uniform table still parses (3 samples of 4 bytes)
    ok = _patch_stsz_uniform(mp4, uniform=4, count=3)
    table = multimodal.parse_video_sample_table(ok)
    assert table is not None and [sz for _, _, sz, _ in table] == [4, 4, 4]


# ---------------------------------------------------------------------------
# ADVICE low: approx MAD estimator is now an explicit, documented choice
# ---------------------------------------------------------------------------
def test_approx_mad_estimator_choices(spark):
    from dqx_spark.engine import DQEngine
    from dqx_spark.functions import dataset_checks as C
    from dqx_spark.rule import DQDatasetRule

    # heavily right-skewed column: IQR/2 and true MAD genuinely differ
    vals = [float(v) for v in [1, 1, 1, 1, 2, 2, 3, 5, 9, 20, 60, 200]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    e = DQEngine(spark)

    def fired(**kw):
        rule = DQDatasetRule(check_func=C.has_no_outliers, column="v", check_func_kwargs=kw)
        rows = e.apply_checks(df, [rule]).collect()
        return sorted(r["v"] for r in rows if r["_errors"] is not None)

    exact = fired(k=3.5)
    approx_mad = fired(k=3.5, approx=True, approx_estimator="mad")
    approx_iqr = fired(k=3.5, approx=True)  # default estimator stays 'iqr'
    # on this small column the sketches are exact: 'mad' reproduces exact
    # semantics, while the documented IQR/2 band differs on skewed data
    assert approx_mad == exact
    assert approx_iqr != exact
    with pytest.raises(InvalidParameterError, match="approx_estimator"):
        C.has_no_outliers("v", approx=True, approx_estimator="median")


# ---------------------------------------------------------------------------
# ADVICE low: composite physicalType detection requires an actual '<'
# ---------------------------------------------------------------------------
def test_composite_physical_type_spellings():
    from dqx_spark.contracts import generate_rules_from_contract
    from dqx_spark.errors import InvalidPhysicalTypeError

    def with_type(t):
        return {"schema": [{"name": "t", "properties": [{"name": "x", "physicalType": t}]}]}

    def schema_ddl(contract):
        for r in generate_rules_from_contract(contract):
            if r["check"]["function"] == "has_valid_schema":
                return r["check"]["arguments"]["expected_schema"]
        return None

    # space before '<' is accepted by Spark's DDL parser -> accepted here
    assert schema_ddl(with_type("ARRAY <INT>")) == "x ARRAY <INT>"
    assert schema_ddl(with_type("MAP <STRING, INT>")) == "x MAP <STRING, INT>"
    # a dialect simple type merely PREFIXED with a keyword takes the
    # documented logical-type fallback (default logical 'string') instead
    # of raising InvalidPhysicalTypeError
    assert schema_ddl(with_type("structured")) == "x string"
    assert schema_ddl(with_type("mapping")) == "x string"
    # real malformed composites still fail loudly, space or not
    for bad in ("ARRAY <banana>", "MAP <INT>", "ARRAY <STRING"):
        with pytest.raises(InvalidPhysicalTypeError):
            generate_rules_from_contract(with_type(bad))
