"""Streaming Count-Min sketch — continuous frequency monitoring with
FIXED state.

The batch sketch (``operators/sampling.py:cms_sketch``) is an
aggregation over (row, md5-bucket) cells; in Structured Streaming the
same groupBy becomes a continuously-maintained state table of at most
DEPTH * WIDTH rows — bounded by construction, whatever the feed's key
cardinality or duration. That is the whole point of sketch-shaped
streaming state: an exact per-key count state grows with distinct keys
forever; the sketch never does. Estimates read from any micro-batch's
update output obey the same never-underestimate contract as batch
(tested against the batch sketch over an identical feed)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quebic_spark.operators.sampling import CMS_DEPTH, _cms_bucket


def cms_stream(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Continuously-updated sketch cells over a streaming frame.

    Write with ``outputMode("update")``; each micro-batch emits the
    cells whose counts changed, and the sink (or an in-memory table)
    holds the current sketch. Probe with
    ``operators.sampling.cms_estimate`` against the materialized
    cells."""
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _cms_bucket(i, F.col(key_col)).alias("col"),
        )
        for i in range(CMS_DEPTH)
    ])
    return (
        stream.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"),
                 F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )
