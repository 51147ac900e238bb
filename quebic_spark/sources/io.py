"""File-format connectors: queue <-> CSV / JSON / ORC / Parquet.

The reference reads and writes only its own two-file binary format
(SURVEY §2.9 row 1 — no other connectors exist). The Spark engine gets
every format Spark supports; these helpers wire them to the queue
abstraction so a reference user's "dump the queue / load a file into
the queue" flows are one call.

Scale notes: export is a straight DataFrame write (partitioned,
distributed); import assigns FIFO seq via the single-shuffle
append_dataframe path. BINARY and TENSOR columns are not representable
in CSV — exporting them there raises rather than silently corrupting.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from quebic_spark.errors import IncompatibleSchemaException
from quebic_spark.queue.queue import Queue
from quebic_spark.schema import BINARY, TENSOR

_FORMATS = ("parquet", "csv", "json", "orc")


def _check_format(fmt: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None) -> DataFrame:
    """Schema-enforced scan (never inferred when a schema is given —
    the reference's fixed-schema discipline, SURVEY §1.3)."""
    _check_format(fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # inference requires an extra pass; explicit is the documented
        # default, inference the opt-in
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)


def export_queue(spark: SparkSession, queue: Queue, path: str,
                 fmt: str = "parquet", include_system: bool = False) -> int:
    """Write all pending records to ``path`` in ``fmt``; returns rows
    written. ``include_system`` keeps seq/created_at/expires_at/codec_id."""
    _check_format(fmt)
    if fmt == "csv":
        bad = [
            t.name for t in queue.schema.types if t in (BINARY, TENSOR)
        ]
        if bad:
            raise IncompatibleSchemaException(
                f"CSV cannot represent {bad}; export as parquet/orc/json"
            )
    df = queue.read_pending(spark)
    if not include_system:
        df = df.select(*queue.schema.column_names)
    n = df.count()
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    return n


def import_into_queue(spark: SparkSession, queue: Queue, path: str,
                      fmt: str = "parquet",
                      order_by: Sequence[str] | None = None,
                      lifetime_ms: int = -1) -> int:
    """Load a file into the queue (FIFO order = ``order_by``, default
    the first column). The payload arity/types must match the queue
    schema — enforced by append_dataframe."""
    _check_format(fmt)
    df = read_table(
        spark, path, fmt,
        schema=", ".join(
            f"{c} {t}" for c, t in zip(
                queue.schema.column_names,
                _ddl_types(queue),
            )
        ),
    )
    order = list(order_by) if order_by else [df.columns[0]]
    return queue.append_dataframe(df, order_by=order,
                                  lifetime_ms=lifetime_ms)


def _ddl_types(queue: Queue) -> list[str]:
    from quebic_spark.schema import INTEGER, REAL, TEXT

    m = {
        INTEGER: "BIGINT",
        REAL: "DOUBLE",
        TEXT: "STRING",
        BINARY: "BINARY",
        TENSOR: "STRUCT<shape: ARRAY<INT>, values: ARRAY<DOUBLE>>",
    }
    return [m[t] for t in queue.schema.types]
