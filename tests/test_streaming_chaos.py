"""Chaos under a live / restarting Structured Streaming listing
(VERDICT r17 next #6): the lock-free listing tier must never deliver
BOTH copies of a row across a torn compaction commit — neither within
one listing (the r16 ordering guarantee) nor ACROSS listings separated
by a crash heal (the direction this file pins).

The repro test builds the r18-found shape by hand: an undiscovered-
merge compactor dies after writing the commit manifest but BEFORE
removing the originals; a stream that restarts in the SAME process
(queue object still open, so no open-time recover()) used to list and
deliver the originals, and the next heal then published the merged
file under a brand-new name — the following listing redelivered every
row. Fixed by healing (replay_pending_compaction) at stream start in
read_queue_stream.

The chaos test then sweeps the same invariant across randomized
SIGKILL points inside real victim compactor processes interleaved
with run_available cycles.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from quebic_spark import INTEGER, TEXT, Queue, Schema  # noqa: E402
from quebic_spark.streaming import StreamingConsumer  # noqa: E402

SCHEMA = Schema(INTEGER, TEXT)


def _torn_merge_state(q: Queue, file_range: tuple[int, int]) -> None:
    """Hand-build the crash window: a complete staged merge of the
    batch files covering seqs [s, e], commit manifest written,
    originals NOT yet removed — exactly what a compactor SIGKILLed
    between manifest write and the first removal leaves
    (queue/queue.py:850-859)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    st = q._storage
    s, e = file_range
    olds = [
        (bs, be, p) for bs, be, p in st.list_batches()
        if bs >= s and be <= e
    ]
    assert len(olds) >= 2, "need a real run to merge"
    merged = pa.concat_tables(
        [pq.read_table(p) for _, _, p in olds]
    ).sort_by("seq")
    staged = st.batch_path(s, e) + ".compact"
    pq.write_table(merged, staged + ".tmp")
    os.replace(staged + ".tmp", staged)
    with open(st.compact_manifest_path, "w") as f:
        json.dump(
            {"staged": [staged], "remove": [p for _, _, p in olds]}, f
        )
    st.drop_row_cache()


def test_restarted_stream_never_sees_both_copies_of_torn_merge(
    tmp_path, spark
):
    """Same-process stream restart over a torn merge: the first
    run_available after the crash must NOT deliver the originals and
    then, after the heal publishes the merged file, deliver the same
    rows again under the new name."""
    q = Queue(str(tmp_path / "q"), SCHEMA, auto_compact_files=None)
    pub = q.publisher()
    got: list[tuple[int, int]] = []  # (batch_id, id)
    consumer = StreamingConsumer(spark, q)

    def f(df, bid):
        got.extend((bid, r["c0"]) for r in df.collect())

    # cycle 1: a consumed prefix so the log has history
    for i in range(4):
        pub.push([i, f"v{i}"])
    consumer.run_available(f)
    assert sorted(i for _, i in got) == list(range(4))

    # push 6 more rows the stopped stream has never listed, then die
    # mid-merge with originals still on disk
    for i in range(4, 10):
        pub.push([i, f"v{i}"])
    olds = q._storage.list_batches()
    _torn_merge_state(q, (olds[4][0], olds[-1][1]))

    # stream restarts in the SAME process (no reopen, no recover())
    consumer.run_available(f)
    # a later writer heals the torn commit (r17 liveness tier) —
    # publishing the merged file under a name the source never saw
    pub.push([10, "v10"])
    consumer.run_available(f)

    ids = [i for _, i in got]
    dupes = sorted({i for i in ids if ids.count(i) > 1})
    assert dupes == [], f"rows delivered twice across the heal: {dupes}"
    assert sorted(ids) == list(range(11))
    q.verify()
    q.close()


@pytest.mark.parametrize("seed", [181, 907])
def test_streaming_chaos_cycles(tmp_path, spark, seed):
    """Randomized version: run_available cycles interleaved with real
    victim compactor processes SIGKILLed at random mutation points
    inside the stream-safe delete + undiscovered-merge protocols,
    healing sometimes via a push (write_batch replay) and sometimes
    only via the next stream start. Every pushed row must be
    delivered EXACTLY once across all cycles."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from chaos_drive import count_mutations, run_victim

    rng = random.Random(seed)
    qdir = str(tmp_path / "q")
    q = Queue(qdir, SCHEMA, auto_compact_files=None)
    pub = q.publisher()
    got: list[tuple[int, int]] = []
    consumer = StreamingConsumer(spark, q)

    def f(df, bid):
        got.extend((bid, r["c0"]) for r in df.collect())

    next_id = 0

    def push(n: int) -> None:
        nonlocal next_id
        for _ in range(n):
            pub.push([next_id, f"v{next_id}"])
            next_id += 1

    cycles = int(os.environ.get("CHAOS_STREAM_CYCLES", "5"))
    for _ in range(cycles):
        push(rng.randint(2, 6))
        consumer.run_available(f)
        # backlog the stopped stream has never listed -> merge fodder
        push(rng.randint(3, 7))
        t = count_mutations(qdir, "merge_undiscovered")
        kill_at = rng.randint(1, t)
        p = run_victim(qdir, "merge_undiscovered", kill_at)
        assert p.returncode == -9, (p.returncode, p.stderr[-300:])
        if rng.random() < 0.5:
            push(1)  # heal via the producer's write_batch replay
        # else: the next run_available's stream-start heal does it
    consumer.run_available(f)

    ids = [i for _, i in got]
    dupes = sorted({i for i in ids if ids.count(i) > 1})
    assert dupes == [], f"double delivery: {dupes}"
    assert sorted(ids) == list(range(next_id)), (
        f"missing: {sorted(set(range(next_id)) - set(ids))[:10]}"
    )
    q.verify()
    q.close()
