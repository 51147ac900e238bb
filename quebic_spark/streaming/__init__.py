from quebic_spark.streaming.consumer import (
    StreamingConsumer,
    read_queue_stream,
)

__all__ = ["StreamingConsumer", "read_queue_stream"]
