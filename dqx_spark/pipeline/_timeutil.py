"""Time-column coercion shared by the pipeline operators.

Spark forbids a direct numeric cast of TIMESTAMP_NTZ (``CAST(ntz AS
DOUBLE)`` raises DATATYPE_MISMATCH), while plain TIMESTAMP casts to epoch
seconds.  Routing through an intermediate ``cast("timestamp")`` makes every
vintage work with one expression:

- TIMESTAMP        -> no-op -> epoch seconds
- TIMESTAMP_NTZ    -> reinterpreted in the session timezone -> epoch seconds
- DATE             -> midnight -> epoch seconds
- numeric (already epoch seconds) -> round-trips unchanged
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (kept for callers' convenience)

__all__ = ["epoch_seconds", "numeric_axis"]


def epoch_seconds(col: Column) -> Column:
    """Epoch seconds as DOUBLE for any timestamp-ish column (see module doc)."""
    return col.cast("timestamp").cast("double")


def numeric_axis(df, col_name: str) -> Column:
    """DOUBLE axis value for a point/interval-bound column by NAME: timestamp
    and date dtypes become epoch seconds; numerics cast directly (no
    timestamp round-trip, which would overflow outside the timestamp range).
    """
    dt = dict(df.dtypes).get(col_name, "")
    c = F.col(col_name)
    if dt.startswith("timestamp") or dt == "date":
        return epoch_seconds(c)
    return c.cast("double")
