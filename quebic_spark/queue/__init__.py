from quebic_spark.queue.queue import (
    DEFAULT_POLL_INTERVAL,
    Publisher,
    Queue,
    Subscriber,
)
from quebic_spark.queue.storage import QueueStorage, SYSTEM_COLUMNS

__all__ = [
    "DEFAULT_POLL_INTERVAL",
    "Publisher",
    "Queue",
    "QueueStorage",
    "SYSTEM_COLUMNS",
    "Subscriber",
]
