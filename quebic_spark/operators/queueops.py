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

from quebic_spark.session import local_rows_frame, read_immutable_parquet

from quebic_spark.queue import Queue
from quebic_spark.schema import INTEGER, REAL, Schema

N_ROWS = 1000


def q_queue_fifo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        read_immutable_parquet(spark, f"{sf_dir}/orders.parquet")
        .orderBy("o_orderkey")
        .limit(N_ROWS)
        .select("o_orderkey", "o_totalprice")
    )
    # keep the mkdtemp ROOT for cleanup: removing only the /q child
    # leaked one empty root per invocation, and without try/finally a
    # failing append left the locked queue open for the session
    # lifetime (r15 review)
    root = tempfile.mkdtemp(prefix="quebic_roundtrip_")
    q = Queue(f"{root}/q", Schema(INTEGER, REAL), capacity=N_ROWS + 1)
    try:
        q.append_dataframe(orders, order_by=["o_orderkey"])
        pending = q.read_pending(spark).select(
            "seq",
            F.col("c0").alias("o_orderkey"),
            F.col("c1").alias("o_totalprice"),
        )
        # materialize before the temp dir is removed below
        return local_rows_frame(spark, pending.collect(), pending.schema)
    finally:
        # close() must not be able to skip the rmtree (r15 advice: an
        # exception here leaked the temp root this block exists to
        # reap); rmtree stays last so close's final compact never
        # races a half-deleted directory
        try:
            q.close()
        finally:
            shutil.rmtree(root, ignore_errors=True)


ORACLE_QUEUE_FIFO_ROUNDTRIP = f"""
SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS seq,
       o_orderkey, o_totalprice
FROM (SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT {N_ROWS})
"""


# ---------------------------------------------------------------------------
# quebic_format_roundtrip — the r10 migration connector under the
# differential gate: documents rows exported BYTE-FOR-BYTE into the
# reference's on-disk format (sources/quebic_format.py — varint fields,
# 4-bit packed schema, 32-byte chained entries, JournaledFile.scala:
# 289-326) as a half-migrated queue (.qbc queue file in PLAIN + .qbj
# journal in GZIP, exercising BOTH chain directions and both codecs),
# then re-imported through the distributed reader (binaryFile scan +
# executor-side chain parse). The oracle replays the selection, FIFO
# position, and codec assignment pure-SQL from the documents table —
# a hash match proves the byte format round-trips losslessly and the
# FIFO composition (queue chain ++ reversed journal chain) is right.
#
# Driver-side note: the EXPORT writes one pointer-chained file — a
# single-node artifact by the reference's own design — so it collects
# the bounded selection (~n/7 rows of ~300 B text) like the queue
# gate above; the IMPORT side stays fully distributed (MapInPandas on
# executors, plan-asserted in tests/test_quebic_format.py).
# ---------------------------------------------------------------------------

FORMAT_STRIDE = 7


def q_quebic_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.codec import GZIP, PLAIN
    from quebic_spark.schema import INTEGER, TEXT
    from quebic_spark.sources.quebic_format import (
        read_quebic_dir,
        write_journaled_bytes,
    )

    docs = (
        read_immutable_parquet(spark, f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % FORMAT_STRIDE == 0)
        .orderBy("doc_id")
        .select("doc_id", "text")
    )
    rows = [[r["doc_id"], r["text"]] for r in docs.collect()]
    split = len(rows) // 2
    schema = Schema(INTEGER, TEXT)
    d = tempfile.mkdtemp(prefix="quebic_format_gate_")
    try:
        with open(f"{d}/docs.qbc", "wb") as f:
            f.write(write_journaled_bytes(
                schema, rows[:split], kind="queue", codec=PLAIN
            ))
        with open(f"{d}/docs.qbj", "wb") as f:
            f.write(write_journaled_bytes(
                schema, rows[split:], kind="journal", codec=GZIP
            ))
        out = read_quebic_dir(spark, d).select(
            F.col("c0").alias("doc_id"),
            F.md5(F.col("c1")).alias("text_md5"),
            F.col("pos").alias("pos"),
            F.col("codec").alias("codec"),
        )
        # materialize before the temp dir is removed (queue-gate
        # pattern); finally so a failing read cleans up too (r15)
        return local_rows_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


ORACLE_QUEBIC_FORMAT_ROUNDTRIP = f"""
WITH sel AS (SELECT doc_id, text FROM documents
             WHERE doc_id % {FORMAT_STRIDE} = 0),
     n AS (SELECT COUNT(*) // 2 AS split FROM sel)
SELECT doc_id,
       md5(text) AS text_md5,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS pos,
       CASE WHEN ROW_NUMBER() OVER (ORDER BY doc_id) - 1
                 < (SELECT split FROM n)
            THEN 'PLAIN' ELSE 'GZIP' END AS codec
FROM sel
"""


QUERIES = {
    "queue_fifo_roundtrip": q_queue_fifo_roundtrip,
    "quebic_format_roundtrip": q_quebic_format_roundtrip,
}

ORACLES = {
    "queue_fifo_roundtrip": ORACLE_QUEUE_FIFO_ROUNDTRIP,
    "quebic_format_roundtrip": ORACLE_QUEBIC_FORMAT_ROUNDTRIP,
}
