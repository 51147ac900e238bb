"""Physical-plan introspection helpers.

The 100 TB discipline is checkable: filters reach the scan, scans read
only needed columns, small sides broadcast, top-k never globally sorts.
These helpers parse ``executedPlan`` so tests (tests/test_plans.py) and
interactive tuning can assert plan shape rather than eyeball it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        out.extend(
            f.strip() for f in m.group(1).split(",") if f.strip()
        )
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each FileScan (column-pruning check)."""
    return [
        [c.split("#")[0].strip() for c in m.group(1).split(",")]
        for m in re.finditer(
            r"FileScan \w+ \[([^\]]*)\]", executed_plan(df)
        )
    ]


def join_kinds(df: DataFrame) -> dict[str, int]:
    """Counts of join strategies Catalyst chose."""
    plan = executed_plan(df)
    kinds = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    return {k: plan.count(k) for k in kinds if plan.count(k)}
