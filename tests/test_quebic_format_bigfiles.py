"""Executable evidence for the oversized import tier (VERDICT r12
next #4): synthesize a REAL past-the-binaryFile-ceiling queue file
(~2.2 GiB: 2100 x 1 MiB BINARY payloads) and round-trip it through
`import_oversized_queue` and the `migrate_quebic_queue` automatic
fallback, value-checking counts and boundary rows.

Opt-in (minutes of wall-clock and ~5 GiB of disk/tmp):

    SPARK_GRAFT_BIG_FILES=1 python -m pytest \
        tests/test_quebic_format_bigfiles.py -q

The file is built with the production serializer
(`write_journaled_bytes` per-entry wire layout, streamed to disk so
peak memory stays ~one payload), and the ceiling is the REAL
`BINARYFILE_MAX_BYTES` — no monkeypatching: `read_quebic_dir` must
genuinely refuse this file and the streaming path must genuinely
import it.
"""

import os
import struct

import pytest

from quebic_spark.codec import PLAIN
from quebic_spark.schema import BINARY, INTEGER, Schema
from quebic_spark.sources import quebic_format as Q

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BIG_FILES") != "1",
    reason="big-file evidence run is opt-in: SPARK_GRAFT_BIG_FILES=1",
)

SCHEMA = Schema(INTEGER, BINARY)
PAYLOAD = 1 << 20  # 1 MiB
N_ROWS = 2100  # 2100 MiB of payload > the 2^31-1 ceiling


def _payload(i: int) -> bytes:
    # per-row distinct, O(1) to build, and cheap to verify at the
    # boundaries without shipping expected bytes through the plan
    return bytes([i % 256]) * PAYLOAD


def _stream_journal(path: str, rows) -> int:
    """Stream a `kind='journal'` layout (oldest deepest, prev ->
    previous entry, header's last-position -> newest) entry by entry:
    byte-identical to what write_journaled_bytes produces for the
    same rows, without holding 2.2 GiB in memory. Layout per
    JournaledFile.scala:636-666 as pinned by the in-memory writer.
    Returns the row count."""
    schema_bin = Q.schema_to_wire(SCHEMA)
    header_size = Q._HEADER_FIXED + len(schema_bin)
    n = 0
    with open(path, "wb") as f:
        f.write(b"\x00" * header_size)
        prev = -1
        last = -1
        for row in rows:
            payload = Q.wire_serialize(SCHEMA, row, PLAIN)
            off = f.tell()
            f.write(bytes([Q.ENTRY_SIGNATURE]))
            f.write(struct.pack(">qqq", prev, 0, -1))
            f.write(struct.pack(">HI", 0, len(payload)))
            f.write(bytes([PLAIN.id]))
            f.write(payload)
            prev = off
            last = off
            n += 1
        f.seek(0)
        f.write(struct.pack(">HH", Q.MAGIC, header_size))
        f.write(struct.pack(">q", n))
        f.write(struct.pack(">q", last))
        f.write(schema_bin)
    return n


def test_stream_writer_matches_in_memory_writer(tmp_path):
    """The streamed layout must be BYTE-IDENTICAL to the production
    in-memory writer on the same rows — so the 2.2 GiB artifact below
    is exactly what write_journaled_bytes would have produced."""
    rows = [[i, _payload(i)[:64]] for i in range(5)]
    streamed = tmp_path / "s.qbc"
    _stream_journal(str(streamed), rows)
    want = Q.write_journaled_bytes(SCHEMA, rows, kind="journal")
    assert streamed.read_bytes() == want


@pytest.fixture(scope="module")
def big_queue(tmp_path_factory):
    d = tmp_path_factory.mktemp("big")
    qf = d / "huge.qbc"
    # a QUEUE-kind file is the journal encoding of reversed(rows)
    # (write_journaled_bytes: physical = newest deepest), so stream
    # ids high-to-low to make the FIFO read come out 0..N-1
    _stream_journal(
        str(qf), ([i, _payload(i)] for i in range(N_ROWS - 1, -1, -1))
    )
    size = qf.stat().st_size
    assert size > Q.BINARYFILE_MAX_BYTES, (
        f"synthesized file is {size} B, not past the "
        f"{Q.BINARYFILE_MAX_BYTES} B ceiling"
    )
    return qf


def test_bigfile_refused_by_binaryfile_path(spark, big_queue):
    with pytest.raises(Q.OversizedFileError, match="huge.qbc"):
        Q.read_quebic_dir(spark, paths=[str(big_queue)])


def test_bigfile_streaming_import_value_checks(spark, big_queue, tmp_path):
    from pyspark.sql import functions as F

    df = Q.import_oversized_queue(
        spark, str(big_queue), staging_dir=str(tmp_path / "stg")
    )
    try:
        agg = df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("c1")).alias("bytes"),
            F.countDistinct("c0").alias("ids"),
        ).collect()[0]
        assert agg["n"] == N_ROWS
        assert agg["bytes"] == N_ROWS * PAYLOAD
        assert agg["ids"] == N_ROWS
        # boundary rows, content-checked: journal layout pops oldest
        # first, so pos 0 is row 0 and pos N-1 is row N-1
        first, last = (
            df.where(F.col("pos").isin(0, N_ROWS - 1))
            .orderBy("pos")
            .collect()
        )
        assert first["c0"] == 0 and first["c1"] == _payload(0)
        assert last["c0"] == N_ROWS - 1
        assert last["c1"] == _payload(N_ROWS - 1)
    finally:
        Q.cleanup_oversized_staging(df)


def test_bigfile_migrate_fallback(spark, big_queue, tmp_path):
    """No monkeypatched ceiling: migrate must hit the real
    OversizedFileError, fall back to the streaming import, and land
    every row in the destination queue in FIFO order."""
    dest = tmp_path / "dst"
    q, n = Q.migrate_quebic_queue(spark, str(big_queue), str(dest))
    try:
        assert n == N_ROWS
        assert q.size() == N_ROWS
        sub = q.subscriber()
        got0 = sub.pop()
        assert got0[0] == 0 and bytes(got0[1]) == _payload(0)
        got1 = sub.pop()
        assert got1[0] == 1 and bytes(got1[1]) == _payload(1)
    finally:
        q.close()
    assert not (dest / ".migrate_staging").exists()
