"""Conditional scan fan-out.

Single-file test inputs arrive as ONE partition, which serializes every
downstream expression; but an unconditional ``repartition()`` is a full
shuffle of the input — at 100 TB that is a corpus-sized shuffle paid
just to read. ``fan_out`` shuffles ONLY when the scan is actually
under-partitioned (fewer splits than the cluster's parallelism), so the
same operator code gets parallelism on tiny fixtures and a zero-shuffle
scan on real multi-file tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fan_out(
    spark: SparkSession, df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff it has fewer
    partitions than that; otherwise return it untouched (no shuffle).
    ``min_partitions=0`` is an explicit no-op floor (every frame
    already has >= 0 partitions), not "use the default" — the falsy
    `or` spelling silently substituted defaultParallelism and forced
    the exact shuffle the caller asked to avoid (r15 review)."""
    if min_partitions is None:
        target = spark.sparkContext.defaultParallelism
    else:
        target = min_partitions
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
