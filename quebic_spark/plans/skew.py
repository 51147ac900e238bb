"""Skew-safe aggregation: explicit two-stage salted groupBy.

WHEN THIS PAYS (r15 review — the original docstring overclaimed):
for algebraic aggregates (sum/count/min/max) Spark's own map-side
partial aggregation already bounds a hot key's reducer load to ONE
partial row per map partition — a direct ``groupBy`` is then the
better plan, and salting adds a second exchange for nothing. Salting
is for state the partial aggregate CANNOT shrink: size-accumulating
aggregates (``collect_list``/``collect_set``, whose partials are as
big as the rows), exact distinct over a hot group (two-stage
``groupBy(k, v)`` -> ``count``), or percentile/sketch partials with
heavy per-group state. There, a hot key really does funnel its full
row volume through one reducer, and spreading it across ``n_salts``
deterministic sub-keys (hash of a unique column, not random —
results must be reproducible) divides the straggler by the salt
factor: at 100 TB the difference between a 10-minute stage and one
task running for hours.

The algebraic merge fns remain supported because they make the
rewrite oracle-checkable (``skew_safe_revenue`` proves
semantics-preservation against plain SQL); use them for that, not
as a performance device.
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
    fn name in {'sum','min','max','collect_list'}); counts are
    expressed as ``F.count(...)`` partials merged with 'sum'.
    ``collect_list`` merges by flattening the per-salt lists — the
    non-algebraic case salting actually exists for; note the merged
    list's order follows salt-bucket order, not input order (callers
    needing determinism sort the result, as with any Spark
    collect_list). ``salt_col`` is any deterministic column with high
    cardinality (an id), hashed into the salt bucket.
    """
    # reserved-column guard (r15 review, same convention as
    # quality_percentile_filter/release_corpus): withColumn would
    # silently REPLACE a caller's _salt before the partial aggregate
    # evaluates — wrong aggregates, no signal; _p_<name> would
    # collide in the partial projection
    reserved = {"_salt"} | {f"_p_{name}" for name in aggs}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"salted_agg reserves column name(s) {clash}; rename the "
            "input column(s) or the agg output(s)"
        )
    salt = F.pmod(F.hash(salt_col), F.lit(n_salts)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    )
    merge_fns = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "collect_list": lambda c: F.flatten(F.collect_list(c)),
    }
    return partial.groupBy(*group_cols).agg(
        *[
            merge_fns[how](F.col(f"_p_{name}")).alias(name)
            for name, (_, how) in aggs.items()
        ]
    )
