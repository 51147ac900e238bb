"""Cross-implementation golden tests: every fixture under
``tests/fixtures/quebic_golden/`` was produced by the REAL reference
implementation (its unmodified Scala sources compiled and driven
through its own APIs — provenance + reproduction programs in the
fixture dir's README). Three evidence tiers:

* BYTES — the connector reads reference-written files exactly: FIFO
  after the reference's own migrate+pop, all five types byte-faithful,
  both codecs, the retained ``latest`` marker, TTL deadlines and
  error counters stamped by real failing consumes, and the
  empty-initialized queue file; plus the full distributed Spark
  import and a migration into a live Queue.
* BEHAVIOR — committed transcripts from the reference's Queue API
  (an 80-op push/tryPop/latest/size script; a capacity-3
  backpressure/pushAll script) that ``quebic_spark.Queue`` must
  replay line for line.
* (The reverse direction — the reference popping connector-exported
  files with hex-identical bytes — was verified at fixture-creation
  time; see the README.)
"""

from __future__ import annotations

import os

import pytest

from quebic_spark.sources import quebic_format as Q

FIXTURES = os.path.join(
    os.path.dirname(__file__), "fixtures", "quebic_golden"
)


def _load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_golden_queue_file_reads_exactly():
    data = _load("golden.qbc")
    schema, entries = Q.parse_chain(data)
    assert [t.name for t in schema.types] == [
        "INTEGER", "REAL", "TEXT", "BINARY", "TENSOR",
    ]
    # the reference pushed rows 0..5, migrated, popped twice: rows
    # 2..5 remain, in FIFO order
    assert len(entries) == 4
    for i, e in zip(range(2, 6), entries):
        v = e["values"]
        assert v[0] == i * 1_000_000_000 + 7
        assert v[1] == pytest.approx(i * 0.5 - 1.25, abs=0)
        assert v[2] == f"döc-{i} ünïcode ☃"
        assert v[3] == bytes((j * 37 + i) & 0xFF for j in range(i + 1))
        shape, vals = v[4]
        assert list(shape) == [2, 2]
        assert list(vals) == [i + 0.25, -i - 0.5, 3.5, 4.75]
        # alternating codecs, exactly as pushed
        assert e["codec_id"] == i % 2
        assert e["errors"] == 0 and e["expires_at"] == -1
        assert e["created_at"] > 0  # reference stamped wall clock

    # truncation guard: the deepest entry (newest row, 5) backs
    # Publisher.latest even though two rows were consumed
    latest = Q.parse_latest(data)
    assert latest[0] == 5_000_000_007 and latest[2].startswith("döc-5")

    # inspect triple over the LIVE chain only
    n, total, mx = Q.inspect_quebic_file(data)
    assert n == 4
    assert total == sum(len(e["payload"]) for e in entries)
    assert mx == max(len(e["payload"]) for e in entries)


def test_golden_journal_and_empty_queue_file():
    jdata = _load("fresh.qbj")
    _, fifo = Q.read_fifo(None, jdata)
    assert [e["values"][0] for e in fifo] == [100, 101, 102]
    v = fifo[0]["values"]
    # edge values straight from the reference's serializers
    assert v[1] == 0.0 and str(v[1]) == "-0.0"  # signed zero survives
    assert v[2] == "" and v[3] == b""
    assert list(v[4][0]) == [1] and list(v[4][1]) == [9.5]

    qdata = _load("fresh.qbc")
    schema, hsize, items, last = Q.parse_header(qdata)
    assert items == 0 and last == -1 and len(qdata) == hsize
    assert Q.parse_chain(qdata)[1] == []
    assert Q.parse_latest(qdata) is None


def test_golden_dir_through_spark_import(spark):
    """The full distributed import path over REAL reference bytes:
    both queues in one scan, FIFO pos per queue, codec column."""
    # the provenance README and the 2-type ttl fixture share the dir:
    # scope the glob to the two 5-type queues (mixed-schema imports
    # fail loudly by design, like the reference's open validation)
    df = Q.read_quebic_dir(spark, FIXTURES, pattern="[gf]*.qb[cj]")
    rows = sorted(
        (r["queue"], r["pos"], r["c0"], r["codec"])
        for r in df.collect()
    )
    assert rows == sorted(
        [("golden", p, (i * 1_000_000_000 + 7),
          "PLAIN" if i % 2 == 0 else "GZIP")
         for p, i in enumerate(range(2, 6))]
        + [("fresh", p, 100 + p, "PLAIN") for p in range(3)]
    )


def test_golden_ttl_and_error_entries(spark, tmp_path):
    """Reference-written TTL + error machinery: an already-expired
    row, a far-future row, a no-TTL row, and a row whose error
    counter the reference incremented in place via a failing consume.
    The default import drops exactly the expired row (consume-time
    TTL parity); forensic mode surfaces everything with the error
    count intact."""
    import shutil

    jdata = _load("ttl.qbj")
    _, fifo = Q.read_fifo(None, jdata)
    by_id = {e["values"][0]: e for e in fifo}
    assert sorted(by_id) == [1, 2, 3, 4]
    assert 0 < by_id[1]["expires_at"] < 2_000_000_000_000  # past
    assert by_id[2]["expires_at"] > 4_000_000_000_000      # ~2126
    assert by_id[3]["expires_at"] == -1
    assert by_id[4]["errors"] == 1  # real failing consume, in place
    assert all(e["errors"] == 0 for k, e in by_id.items() if k != 4)

    # Spark import: TTL filter mirrors consume; forensic keeps all
    d = tmp_path / "ttlq"
    d.mkdir()
    (d / "ttl.qbj").write_bytes(jdata)
    live = Q.read_quebic_dir(spark, str(d))
    assert sorted(r["c0"] for r in live.collect()) == [2, 3, 4]
    everything = Q.read_quebic_dir(spark, str(d), include_expired=True)
    rows = {r["c0"]: r for r in everything.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[4]["errors"] == 1
    shutil.rmtree(d, ignore_errors=True)


def test_golden_files_migrate_into_live_queue(spark, tmp_path):
    """The complete engine switch on REAL reference bytes: the
    golden queue file (migrated + twice-popped by the reference
    itself) lands in a live quebic_spark Queue with FIFO and all five
    types intact, ready to pop."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    for name in ("golden.qbc", "fresh.qbc", "fresh.qbj"):
        (src / name).write_bytes(_load(name))
    q, n = Q.migrate_quebic_queue(
        spark, str(src / "golden.qbc"), str(tmp_path / "dst")
    )
    try:
        assert n == 4
        sub = q.subscriber()
        rows = [sub.pop() for _ in range(4)]
        assert [r[0] for r in rows] == [
            i * 1_000_000_000 + 7 for i in range(2, 6)
        ]
        assert rows[0][2] == "döc-2 ünïcode ☃"
        # our queue pops TENSOR as its value object
        assert rows[-1][4].as_row() == ([2, 2], [5.25, -5.5, 3.5, 4.75])
        assert q.is_empty()
    finally:
        q.close()
        shutil.rmtree(tmp_path / "dst", ignore_errors=True)


def test_reference_transcript_replays_identically(tmp_path):
    """Behavioral lockstep with the REAL reference: an 80-op seeded
    script (interleaved push/tryPop/latest/size, including pops on
    empty and a full drain) was executed against the reference's
    Queue API — its transcript is the committed fixture. Replaying
    the same script against quebic_spark.Queue must produce the SAME
    transcript line for line: FIFO order, None-on-empty, size
    accounting, and latest-survives-drain all agree."""
    import json

    from quebic_spark import INTEGER, Queue, Schema

    ops = json.loads(_load("opscript.json").decode())
    want = _load("reference_transcript.txt").decode().splitlines()

    q = Queue(str(tmp_path / "replay"), Schema(INTEGER),
              capacity=10_000)
    pub, sub = q.publisher(), q.subscriber()
    got = []
    for op in ops:
        if op[0] == "push":
            pub.push([op[1]])
            got.append(f"push {op[1]} -> ok")
        elif op[0] == "tryPop":
            row = sub.try_pop()
            got.append(
                "tryPop -> " + ("None" if row is None else str(row[0]))
            )
        elif op[0] == "latest":
            row = pub.latest()
            got.append(
                "latest -> " + ("None" if row is None else str(row[0]))
            )
        elif op[0] == "size":
            got.append(f"size -> {q.size()}")
        else:  # pragma: no cover
            raise AssertionError(op)
    q.close()
    assert got == want, next(
        (f"first divergence at op {i}: ours={g!r} ref={w!r}"
         for i, (g, w) in enumerate(zip(got, want)) if g != w),
        f"length {len(got)} vs {len(want)}",
    )


def test_reference_capacity_transcript_replays_identically(tmp_path):
    """Backpressure lockstep with the REAL reference: a fixed script
    against a capacity-3 reference Queue — tryPush refusals at
    capacity, pushAll partial admission with exact remainders, and
    FIFO across admission waves — produced the committed transcript.
    quebic_spark.Queue must replay it line for line."""
    from quebic_spark import INTEGER, Queue, Schema

    want = _load("capacity_transcript.txt").decode().splitlines()
    q = Queue(str(tmp_path / "cap"), Schema(INTEGER), capacity=3)
    pub, sub = q.publisher(), q.subscriber()
    got = []

    def try_push(v):
        got.append(f"tryPush {v} -> " + str(pub.try_push([v])).lower())

    def push_all(vs):
        rem = pub.push_all([[v] for v in vs], limit_ms=0)
        got.append(
            f"pushAll [{','.join(map(str, vs))}] -> remainder "
            f"[{','.join(str(r[0]) for r in rem)}]"
        )

    def try_pop():
        row = sub.try_pop()
        got.append(
            "tryPop -> " + ("None" if row is None else str(row[0]))
        )

    def size():
        got.append(f"size -> {q.size()}")

    def latest():
        row = pub.latest()
        got.append(
            "latest -> " + ("None" if row is None else str(row[0]))
        )

    try_push(1); try_push(2); try_push(3); try_push(4)
    size()
    push_all([5, 6, 7])
    try_pop(); try_pop()
    push_all([5, 6, 7])
    size()
    try_pop(); try_pop(); try_pop(); try_pop()
    latest()
    try_push(8); latest(); try_pop(); try_pop(); latest(); size()
    q.close()

    assert got == want, next(
        (f"first divergence at line {i}: ours={g!r} ref={w!r}"
         for i, (g, w) in enumerate(zip(got, want)) if g != w),
        f"length {len(got)} vs {len(want)}",
    )


def test_reference_consume_transcript_replays_identically(tmp_path):
    """Error-counter/DLQ-path lockstep with the REAL reference: a
    35-op script of push / migrate / failing-consume / succeeding-
    consume / size was executed against the reference's JournaledFile
    consume machinery (opened per-op exactly as its own Queue does —
    a long-lived handle breaks after migrateTo truncates the journal)
    and the transcript committed. Every failing run stays BELOW the
    livelock threshold (errors <= permit-1 before a success):
    the reference's discard-at-permit branch recurses without
    unlinking (JournaledFile.scala:254-266) and spins forever, so
    only the sub-threshold state machine is reference-drivable. What
    this pins lockstep (not just via the ttl.qbj fixture): error
    counters PERSIST across consume calls (Left, Left, then success),
    the errored head is REDELIVERED with its value intact, counters
    are per-entry (a new head starts at zero), and the machinery
    composes with interleaved pushes/migrations and FIFO across
    waves. The reference returns Left(ex) where our consume re-raises
    — mapped 1:1 in the replay."""
    import json

    from quebic_spark import INTEGER, Queue, Schema

    ops = json.loads(_load("consume_opscript.json").decode())
    want = _load("consume_transcript.txt").decode().splitlines()

    q = Queue(str(tmp_path / "consume_replay"), Schema(INTEGER),
              capacity=10_000)
    pub, sub = q.publisher(), q.subscriber()
    got = []

    def _boom(_record):
        raise RuntimeError("induced")

    for op in ops:
        if op[0] == "push":
            pub.push([op[1]])
            got.append(f"push {op[1]} -> ok")
        elif op[0] == "migrate":
            # the reference moves journal->queue; our log is already
            # unified, so the analogous maintenance op is compaction
            q.compact()
            got.append("migrate -> ok")
        elif op[0] == "consumeOk":
            r = sub.consume(lambda rec: rec[0], error_permit=3)
            got.append(
                "consumeOk -> " + ("None" if r is None else f"Some({r})")
            )
        elif op[0] == "consumeFail":
            try:
                r = sub.consume(_boom, error_permit=3)
            except RuntimeError as ex:
                got.append(f"consumeFail -> Left({ex})")
            else:
                got.append(
                    "consumeFail -> "
                    + ("None" if r is None else f"Some({r})")
                )
        elif op[0] == "size":
            got.append(f"size -> {q.size()}")
        else:  # pragma: no cover
            raise AssertionError(op)
    q.close()
    assert got == want, next(
        (f"first divergence at op {i}: ours={g!r} ref={w!r}"
         for i, (g, w) in enumerate(zip(got, want)) if g != w),
        f"length {len(got)} vs {len(want)}",
    )
