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
    """Stream the physical (deepest-first) layout entry by entry via
    the PRODUCTION single-pass writer — never holding 2.2 GiB in
    memory. Physical order semantics per
    `stream_journaled_entries`'s contract (JournaledFile.scala
    :636-666): rows newest-first = a queue file. Returns the count."""
    with open(path, "wb") as f:
        return Q.stream_journaled_entries(f, SCHEMA, rows, codec=PLAIN)


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


def test_bigfile_sharded_export_streams(spark, tmp_path):
    """The write twin at scale: export ~2.4 GiB as 2 reference-
    readable shard files through the streaming writer (task memory is
    one Arrow batch, not the shard — the old path held each shard in
    memory twice), then verify counts, FIFO order, shard key ranges,
    and boundary rows via the mmap chain walk."""
    from pyspark.sql import functions as F

    from quebic_spark.schema import TEXT, Schema

    n = 2400
    pay = PAYLOAD  # 1 MiB per row
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(
            F.format_string("%05d:", F.col("id")),
            F.repeat(F.lit("x"), pay - 6),
        ).alias("body"),
    )
    out = tmp_path / "shards"
    shards = Q.export_quebic_shards(
        df, str(out), Schema(INTEGER, TEXT), n_shards=2,
        order_by=["k"],
    )
    assert shards == ["shard-00000.qbc", "shard-00001.qbc"]
    seen = 0
    prev_last = -1
    for name in shards:
        path = str(out / name)
        size = os.path.getsize(path)
        # each shard holds ~half the corpus: well past what the old
        # in-memory writer could sanely double-buffer, still under
        # the binaryFile ceiling so the reference AND our distributed
        # importer can read it
        assert size > 1 << 30
        assert size < Q.BINARYFILE_MAX_BYTES
        _, entries = Q.iter_quebic_fifo(path, None)
        ids = []
        first = last = None
        for e in entries:
            if first is None:
                first = e["values"]
            last = e["values"]
            ids.append(e["values"][0])
        assert ids == sorted(ids)  # FIFO pop order == key order
        assert ids[0] > prev_last  # contiguous, disjoint shard ranges
        prev_last = ids[-1]
        assert first[1].startswith(f"{first[0]:05d}:")
        assert last[1] == f"{last[0]:05d}:" + "x" * (pay - 6)
        assert len(first[1]) == pay
        seen += len(ids)
    assert seen == n
