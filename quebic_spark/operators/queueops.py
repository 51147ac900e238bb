"""Queue semantics as an oracle-checkable query.

``queue_fifo_roundtrip`` exercises the reference-parity spine (SURVEY
§7.2 — the minimum end-to-end slice, QueueTest.scala:44-70 semantics)
under the differential gate: bulk-append 1000 orders rows in orderkey
order through the Spark ingest path, read them back through the pending
scan, and emit (seq, payload). The oracle is a plain ROW_NUMBER over
the same ordering — if FIFO seq assignment, the append commit, or the
pruned pending read were wrong, the hash would diverge.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.queue import Queue
from quebic_spark.schema import INTEGER, REAL, Schema

N_ROWS = 1000


def q_queue_fifo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .orderBy("o_orderkey")
        .limit(N_ROWS)
        .select("o_orderkey", "o_totalprice")
    )
    path = tempfile.mkdtemp(prefix="quebic_roundtrip_") + "/q"
    q = Queue(path, Schema(INTEGER, REAL), capacity=N_ROWS + 1)
    q.append_dataframe(orders, order_by=["o_orderkey"])
    pending = q.read_pending(spark).select(
        "seq",
        F.col("c0").alias("o_orderkey"),
        F.col("c1").alias("o_totalprice"),
    )
    # materialize before the temp dir can be cleaned up by the caller
    pending = spark.createDataFrame(pending.collect(), pending.schema)
    q.close()
    shutil.rmtree(path, ignore_errors=True)
    return pending


ORACLE_QUEUE_FIFO_ROUNDTRIP = f"""
SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS seq,
       o_orderkey, o_totalprice
FROM (SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT {N_ROWS})
"""


QUERIES = {
    "queue_fifo_roundtrip": q_queue_fifo_roundtrip,
}

ORACLES = {
    "queue_fifo_roundtrip": ORACLE_QUEUE_FIFO_ROUNDTRIP,
}
