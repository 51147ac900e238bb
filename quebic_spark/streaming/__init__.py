from quebic_spark.streaming.consumer import (
    StreamingConsumer,
    queue_sink,
    read_queue_stream,
)
from quebic_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_against_snapshot,
)

__all__ = [
    "StreamingConsumer",
    "dedup_stream",
    "dedup_stream_against_snapshot",
    "queue_sink",
    "read_queue_stream",
]
