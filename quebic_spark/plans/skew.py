"""Skew-safe aggregation: explicit two-stage salted groupBy.

AQE's skew-join handling covers joins; a *hot grouping key* still
funnels every row for that key through one reducer. ``salted_agg``
splits the aggregation: rows are spread across ``n_salts`` synthetic
sub-keys (deterministic hash of unique columns, not random — results
must be reproducible), partially aggregated, then merged. For algebraic
aggregates (sum/count/min/max) the result is identical to a direct
groupBy; the shuffle load per reducer drops by the salt factor.

At 100 TB this is the difference between a 10-minute stage and one
straggler task running for hours.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    salt_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over ``group_cols``.

    ``aggs`` maps output name -> (partial aggregate expression, merge
    fn name in {'sum','min','max'}); counts are expressed as
    ``F.count(...)`` partials merged with 'sum'. ``salt_col`` is any
    deterministic column with high cardinality (an id), hashed into
    the salt bucket.
    """
    salt = F.pmod(F.hash(salt_col), F.lit(n_salts)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    )
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*group_cols).agg(
        *[
            merge_fns[how](F.col(f"_p_{name}")).alias(name)
            for name, (_, how) in aggs.items()
        ]
    )
