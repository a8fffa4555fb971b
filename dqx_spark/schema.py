"""Result-annotation schema shared by the engine and tests.

Semantics derived from the reference's ``schema/dq_result_schema.py:3-19`` and
``utils/reporting_columns.py:6-11``: every checked DataFrame gains two
array-of-struct columns, ``_errors`` and ``_warnings``; NULL array = row fully
passed that criticality.
"""

from __future__ import annotations

from pyspark.sql import types as T

ERRORS_COLUMN = "_errors"
WARNINGS_COLUMN = "_warnings"
INFO_COLUMN = "_dq_info"

#: One entry per failed (or skipped) check on a row.
dq_result_item_schema = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("columns", T.ArrayType(T.StringType()), True),
        T.StructField("filter", T.StringType(), True),
        T.StructField("function", T.StringType(), True),
        T.StructField("run_time", T.TimestampType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("user_metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("rule_fingerprint", T.StringType(), True),
        T.StructField("rule_set_fingerprint", T.StringType(), True),
        T.StructField("skipped", T.BooleanType(), True),
    ]
)

dq_result_schema = T.ArrayType(dq_result_item_schema)

#: Long-format summary-metrics table (reference ``metrics_observer.py:58-107``).
observation_table_schema = T.StructType(
    [
        T.StructField("run_id", T.StringType(), True),
        T.StructField("run_name", T.StringType(), True),
        T.StructField("input_location", T.StringType(), True),
        T.StructField("output_location", T.StringType(), True),
        T.StructField("quarantine_location", T.StringType(), True),
        T.StructField("checks_location", T.StringType(), True),
        T.StructField("metric_name", T.StringType(), True),
        T.StructField("metric_value", T.StringType(), True),
        T.StructField("run_time", T.TimestampType(), True),
        T.StructField("error_column_name", T.StringType(), True),
        T.StructField("warning_column_name", T.StringType(), True),
        T.StructField("user_metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
