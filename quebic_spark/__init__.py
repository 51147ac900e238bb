"""quebic_spark — a PySpark-native analytics engine with the capabilities of
torao/quebic (durable schema-typed FIFO queues) plus large-scale
data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB-class Spark clusters.

The reference (read-only at /root/reference/) is a ~1,400-LoC Scala
journaling queue library. This package re-expresses its semantics
Spark-first — Parquet append logs + Structured Streaming instead of a
two-file journal/stack layout — and layers the analytics operators the
reference never had on top of the DataFrame API.

Layout:
    quebic_spark.schema     -- 5-type data model (INTEGER REAL TEXT BINARY TENSOR)
    quebic_spark.tensor     -- TENSOR value model (shape/values invariants)
    quebic_spark.codec      -- PLAIN / GZIP record codecs
    quebic_spark.errors     -- FormatException / IncompatibleSchemaException
    quebic_spark.queue      -- Queue / Publisher / Subscriber (durable FIFO)
    quebic_spark.streaming  -- Structured Streaming consumers over queue logs
    quebic_spark.operators  -- relational / dedup / similarity / text / events
    quebic_spark.functions  -- reusable column-expression builders
    quebic_spark.sources    -- file connectors, sharded/Z-order corpus writers
    quebic_spark.pipeline   -- release composite + versioned release registry
    quebic_spark.sql        -- temp-view facade (testdata / queues / releases)

See MIGRATION.md for the reference-API mapping and
examples/quickstart.py for a runnable end-to-end walk.
"""

from quebic_spark.errors import FormatException, IncompatibleSchemaException
from quebic_spark.schema import (
    BINARY,
    INTEGER,
    REAL,
    TENSOR,
    TEXT,
    DataType,
    Schema,
)
from quebic_spark.tensor import Tensor
from quebic_spark.codec import GZIP, PLAIN, Codec
from quebic_spark.queue import Publisher, Queue, Subscriber
from quebic_spark.cache import clear_caches
from quebic_spark.queue.typed import Converter, TypedQueue
from quebic_spark.serde import deserialize_record, serialize_record

__version__ = "0.1.0"

__all__ = [
    "BINARY",
    "Codec",
    "Converter",
    "DataType",
    "FormatException",
    "GZIP",
    "INTEGER",
    "IncompatibleSchemaException",
    "PLAIN",
    "Publisher",
    "Queue",
    "REAL",
    "Schema",
    "Subscriber",
    "TENSOR",
    "TEXT",
    "Tensor",
    "TypedQueue",
    "clear_caches",
    "deserialize_record",
    "serialize_record",
]
