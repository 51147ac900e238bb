from quebic_spark.plans.audit import (
    PlanTruncatedError,
    executed_plan,
    join_kinds,
    pushed_filters,
    scan_columns,
)
from quebic_spark.plans.skew import salted_agg

__all__ = [
    "PlanTruncatedError",
    "executed_plan",
    "join_kinds",
    "pushed_filters",
    "salted_agg",
    "scan_columns",
]
