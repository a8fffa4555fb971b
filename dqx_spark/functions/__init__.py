"""Check-function library: row-level checks compile to pure Column
expressions; dataset-level checks return ``(condition, apply_closure)``.
"""

from dqx_spark.functions.row_checks import *  # noqa: F401,F403
from dqx_spark.functions.dataset_checks import *  # noqa: F401,F403
from dqx_spark.functions.geo_checks import *  # noqa: F401,F403
from dqx_spark.functions import row_checks as _row, dataset_checks as _ds, geo_checks as _geo

__all__ = (
    list(getattr(_row, "__all__", []))
    + list(getattr(_ds, "__all__", []))
    + list(getattr(_geo, "__all__", []))
)
