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

from quebic_spark.operators.sampling import cms_sketch


def cms_stream(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Continuously-updated sketch cells over a streaming frame.

    Probe recipes (r15 review — the old text recommended an
    update-mode in-memory table, whose sink APPENDS each changed
    cell's new version; min-ing across a stale version underestimated,
    the one failure a CMS must never have):

    * ``outputMode("complete")`` into a memory table — the sketch is
      at most DEPTH x WIDTH rows, so complete mode is cheap and the
      table always holds exactly the current cells; or
    * ``outputMode("update")`` into any append-shaped sink —
      ``operators.sampling.cms_estimate`` now collapses duplicate
      cell versions by max (counts are monotone) before estimating,
      so stale appended versions cannot drag the min down; or
    * ``foreachBatch`` keeping latest per (row, col), as the parity
      test does.

    Delegates to the BATCH sketch (r14 review: the body was a
    character-identical copy that could silently drift from a batch
    bucketing fix, breaking the tested batch/stream estimate-parity
    contract): an unbounded groupBy aggregation on a streaming frame
    IS the continuously-maintained state table — same plan, bounded
    at DEPTH x WIDTH cells by construction.
    """
    return cms_sketch(stream, key_col)
