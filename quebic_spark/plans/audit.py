"""Physical-plan introspection helpers.

The 100 TB discipline is checkable: filters reach the scan, scans read
only needed columns, small sides broadcast, top-k never globally sorts.
These helpers parse ``executedPlan`` so tests (tests/test_plans.py) and
interactive tuning can assert plan shape rather than eyeball it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


class PlanTruncatedError(RuntimeError):
    """The rendered plan hit ``spark.sql.debug.maxToStringFields``
    truncation (``... N more fields``), so any column/filter list
    parsed from it would be silently partial — a column-pruning
    assertion could false-pass because the extra columns were
    truncated out of the rendered string (r15 advice). Raised instead
    of returning the partial list."""


def executed_plan(df: DataFrame) -> str:
    # Render with field-count truncation effectively off: the default
    # maxToStringFields=25 elides wide scans as "... N more fields",
    # which would make scan_columns/pushed_filters silently partial
    # (r15 advice). Restored after rendering — this is an audit
    # helper, not session tuning.
    conf = df.sparkSession.conf
    key = "spark.sql.debug.maxToStringFields"
    prev = conf.get(key, None)
    conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)


def _balanced(text: str, start: int) -> str:
    """Contents of the bracket group opening at ``text[start] == '['``,
    honoring nesting — ``In(id, [1,2,3])`` closes its inner bracket
    before the group's (the naive ``[^\\]]*`` regex stopped at the
    FIRST ``]`` and truncated such filters, r14 review)."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "[":
            depth += 1
        elif text[i] == "]":
            depth -= 1
            if depth == 0:
                return text[start + 1:i]
    return text[start + 1:]


def _split_top(body: str) -> list[str]:
    """Split on TOP-LEVEL commas only (depth-aware over () and []):
    ``In(id, [1,2,3]), IsNotNull(id)`` is two filters, not five
    fragments (r14 review). Spark's field-count truncation marker
    ``... N more fields`` raises :class:`PlanTruncatedError` rather
    than being dropped (r15 advice): a list that lost entries to the
    renderer is not evidence, and silently returning it let
    column-pruning assertions false-pass. ``executed_plan`` raises
    the config so this cannot fire on plans rendered through it —
    the raise is the belt for externally-rendered strings."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in body:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    parts = [s.strip() for s in out if s.strip()]
    for s in parts:
        if re.fullmatch(r"\.\.\. \d+ more fields?", s):
            raise PlanTruncatedError(
                "plan string truncated by "
                "spark.sql.debug.maxToStringFields "
                f"({s!r}); parsed lists would be partial"
            )
    return parts


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: (?=\[)", plan):
        out.extend(_split_top(_balanced(plan, m.end())))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each FileScan (column-pruning check).
    A zero-column scan yields ``[]``, not ``['']`` (r14 review)."""
    plan = executed_plan(df)
    return [
        [c.split("#")[0].strip()
         for c in _split_top(_balanced(plan, m.end()))]
        for m in re.finditer(r"FileScan \w+ (?=\[)", plan)
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
