from quebic_spark.streaming.consumer import (
    StreamingConsumer,
    queue_sink,
    read_queue_stream,
)
from quebic_spark.streaming.dedup import dedup_stream

__all__ = [
    "StreamingConsumer",
    "dedup_stream",
    "queue_sink",
    "read_queue_stream",
]
