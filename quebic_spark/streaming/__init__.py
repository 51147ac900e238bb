from quebic_spark.streaming.consumer import (
    StreamingConsumer,
    queue_sink,
    read_queue_stream,
)

__all__ = ["StreamingConsumer", "queue_sink", "read_queue_stream"]
