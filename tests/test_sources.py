"""File-format connector tests: queue export/import round-trips
(SURVEY §2.9 row 1 — the connector provision the reference lacks).
"""

import pytest

from quebic_spark import BINARY, INTEGER, Queue, REAL, Schema, TEXT
from quebic_spark.errors import IncompatibleSchemaException
from quebic_spark.sources import export_queue, import_into_queue, read_table

SCHEMA = Schema(INTEGER, TEXT, REAL)


@pytest.fixture
def filled_queue(tmp_path):
    q = Queue(str(tmp_path / "q"), SCHEMA, capacity=1000)
    q.publisher().push_all(
        [[i, f"name{i}", i * 1.5] for i in range(50)]
    )
    yield q, tmp_path
    q.dispose()


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_export_import_roundtrip(filled_queue, spark, fmt):
    q, tmp_path = filled_queue
    out = str(tmp_path / f"export_{fmt}")
    n = export_queue(spark, q, out, fmt=fmt)
    assert n == 50

    q2 = Queue(str(tmp_path / f"q2_{fmt}"), SCHEMA, capacity=1000)
    m = import_into_queue(spark, q2, out, fmt=fmt, order_by=["c0"])
    assert m == 50
    popped = q2.subscriber().pop_n(50)
    assert [p[0] for p in popped] == list(range(50))  # FIFO by c0
    assert popped[7] == (7, "name7", 10.5)
    q2.dispose()


def test_csv_rejects_binary(tmp_path, spark):
    q = Queue(str(tmp_path / "qb"), Schema(INTEGER, BINARY), capacity=10)
    q.publisher().push([1, b"\x00\x01"])
    with pytest.raises(IncompatibleSchemaException):
        export_queue(spark, q, str(tmp_path / "nope"), fmt="csv")
    q.dispose()


def test_export_with_system_columns(filled_queue, spark):
    q, tmp_path = filled_queue
    out = str(tmp_path / "sys")
    export_queue(spark, q, out, fmt="parquet", include_system=True)
    df = read_table(spark, out, "parquet")
    assert set(df.columns) == {"seq", "created_at", "expires_at",
                               "codec_id", "c0", "c1", "c2"}
    assert df.count() == 50


def test_unknown_format(filled_queue, spark):
    q, tmp_path = filled_queue
    with pytest.raises(ValueError):
        export_queue(spark, q, str(tmp_path / "x"), fmt="avro")
