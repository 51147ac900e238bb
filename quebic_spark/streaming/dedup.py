"""Streaming deduplication over queue feeds.

A queue relay is at-least-once: a crashed producer re-pushes records it
already wrote, and downstream sees duplicates. ``dedup_stream`` removes
them inside the stream with bounded state —
``dropDuplicatesWithinWatermark`` keeps each key only until the
watermark passes its event time, so state size is (keys per watermark
window), not (keys ever seen). That bound is what makes streaming dedup
viable on an unbounded 100 TB/day feed; an unbounded
``dropDuplicates`` state would grow forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same ``keys``) from a streaming frame.

    Duplicates arriving within ``watermark`` of the original's event
    time are suppressed; later-than-watermark duplicates are the
    at-least-once residue the sink must tolerate (idempotent writes),
    exactly the Structured Streaming state/correctness trade.
    """
    return stream.withWatermark(event_time_col, watermark)\
        .dropDuplicatesWithinWatermark(list(keys))
