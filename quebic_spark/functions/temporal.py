"""Generic as-of join — the temporal operator Spark lacks, as a
reusable composition of DataFrame primitives.

``asof_join(left, right, ...)`` matches each left row with the nearest
right row at-or-before (``backward``) or at-or-after (``forward``) its
timestamp, per key — without materializing candidate pairs: both sides
are interleaved, sorted once per key, and the right side's values are
carried across with ``last(..., ignorenulls)`` /
``first(..., ignorenulls)``. One shuffle on the key columns, O(n log n)
per key, immune to key skew blowup (a naive time-inequality join is
O(left x right) per key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Return ``left`` with, per row, the ``right_values`` of the
    nearest ``right`` row per ``on`` key.

    direction='backward': right_ts <= left_ts (most recent prior).
    direction='forward':  right_ts >= left_ts (earliest following).
    Ties at equal timestamps match (<= / >= semantics). Unmatched left
    rows keep NULLs (left-join semantics).

    If the right side has several rows at the same (key, ts) the
    matched one is unspecified — pre-aggregate or dedup the right side
    when that matters (same caveat as any ASOF join).

    NULL timestamps (r15 review): right rows with NULL ``right_ts``
    never match (they are not "nearest" to anything — previously
    Spark's nulls-first ordering sorted them before every row, so
    they matched as prior to ALL left rows in backward mode), and
    left rows with NULL ``left_ts`` get NULL asof columns. The
    matched values are carried as ONE struct, so they always come
    from a single right row — the old per-column
    ``last(ignorenulls)`` carry skipped a genuinely-NULL right value
    and resurrected the previous row's, returning field mixes that
    never existed on the right side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    on = list(on)
    # fail with the real cause, not an internals-pointing
    # AnalysisException mid-plan (r13 review): _ts/_is_left/_rv are
    # this op's working columns, and each right value lands as
    # <name><suffix>
    working = {"_ts", "_is_left", "_rv"}
    reserved = working & set(left.columns) | (
        working & set(right.columns)
    )
    if reserved:
        raise ValueError(
            f"asof_join reserves column(s) {sorted(reserved)} — "
            "rename them on the input"
        )
    clashes = {c + suffix for c in right_values} & set(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join output column(s) {sorted(clashes)} collide "
            "with the left side — pass a different suffix"
        )
    # left_ts travels as _ts and is renamed back at the end — carrying
    # it through the value columns too would leave TWO columns with the
    # same name after the rename (ambiguous downstream references)
    left_vals = [c for c in left.columns if c not in on and c != left_ts]
    # the matched right row travels as ONE struct (_rv): a whole-row
    # carry is atomic, so a nearest match with a genuinely-NULL field
    # stays NULL instead of last(ignorenulls) resurrecting the value
    # from an OLDER right row and returning a cross-row field mix
    # (r15 review). The struct itself is non-null exactly on
    # right-origin rows, which is what ignorenulls keys on.
    rv_struct = F.struct(
        *[F.col(c).alias(c) for c in right_values]
    )
    rv_type = T.StructType(
        [
            T.StructField(c, right.schema[c].dataType)
            for c in right_values
        ]
    )
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_vals],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    tagged_right = right.filter(
        # NULL-ts right rows are nearest to NOTHING; under Spark's
        # nulls-first ascending order they sorted before every row
        # and matched as "prior" to all left rows (r15 review)
        F.col(right_ts).isNotNull()
    ).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_vals
        ],
        rv_struct.alias("_rv"),
    )
    merged = tagged_left.unionByName(tagged_right)

    # at equal _ts the right row must be visible to the left row:
    # backward -> right sorts first (is_left 0 < 1); forward -> right
    # sorts last and we look ahead
    base = Window.partitionBy(*on)
    if direction == "backward":
        w = base.orderBy("_ts", "_is_left").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carried = F.last(F.col("_rv"), ignorenulls=True).over(w)
    else:
        w = base.orderBy(
            "_ts", F.col("_is_left").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = F.first(F.col("_rv"), ignorenulls=True).over(w)

    out = merged.select(
        *on,
        "_ts",
        "_is_left",
        *left_vals,
        # mask NULL-ts LEFT rows: in forward mode a nulls-first left
        # row's window spans every right row, matching the first one;
        # "no timestamp" must mean "no match" in both directions
        F.when(F.col("_ts").isNotNull(), carried).alias("_rv"),
    )
    return (
        out.filter(F.col("_is_left") == 1)
        .drop("_is_left")
        .select(
            *on,
            "_ts",
            *left_vals,
            *[
                F.col("_rv").getField(c).alias(c + suffix)
                for c in right_values
            ],
        )
        .withColumnRenamed("_ts", left_ts)
    )
