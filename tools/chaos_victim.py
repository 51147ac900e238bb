"""Fault-injection victim for the queue crash-point chaos drive.

Runs ONE queue operation (a commit protocol from
``quebic_spark/queue/queue.py:629-668,716-727,844-862`` or the push
path's ``write_batch``) with every mutating filesystem call gated by a
counter, and SIGKILLs ITSELF immediately BEFORE the ``kill_at``-th
mutation — enumerating, one process death at a time, every
between-syscall state the commit protocols can leave on disk. With
``kill_at=0`` it instead runs to completion and prints ``MUTATIONS
<n>`` so the sweep (tools/chaos_drive.py) can sample kill points that
actually land inside the operation.

Gated boundaries: ``os.replace`` (every rename/publish step),
``os.remove`` (old-file deletions, manifest removal), ``os.write``
(control-pointer flips, manifest/batch payload writes — the torn-write
entry points; pyarrow's own C-level writes are not os.write, so a kill
mid-parquet-write lands on the same directory state as killing just
before the following rename, which the sweep already covers).

Patching happens BEFORE importing quebic_spark so module-level default
bindings (``storage._write_all(..., write=os.write)``) capture the
gated versions. The generalization of the r16/r17 hand-built crash
windows (VERDICT r17 next #1); modeled on the single-point
``test_live_consumer_survives_real_sigkilled_compactor_process``.

Usage::

    python tools/chaos_victim.py QDIR SCENARIO KILL_AT [FIRST N]

Scenarios: full_compact | stream_safe | merge_undiscovered | push
(plus push_all, consume, dlq, dlq_replay, bulk_append*, heal).
``push`` prints ``ACK <i>`` after each push RETURNS (flushed), so the
parent knows exactly which pushes were acknowledged before death.
``heal`` makes the HEALER itself the victim (r19): the parent
fabricates a torn post-manifest compaction state and this process is
killed inside the ``Queue(...)`` open — ``recover()`` /
``replay_pending_compaction`` mid-replay — proving empirically that
the heal is idempotent over its own partial progress (a second open
must finish it).
"""

from __future__ import annotations

import os
import signal
import sys


def main() -> None:
    qdir, scenario, kill_at = sys.argv[1], sys.argv[2], int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    calls = {"n": 0}
    # bulk_append scenarios launch a Spark JVM whose Python-side
    # plumbing makes unrelated os.write calls: their gates arm only
    # around the append itself, so kill points land inside the
    # commit protocol, not inside py4j bootstrap
    armed = {"on": not scenario.startswith("bulk_append")}
    real_replace, real_remove, real_write, real_pwrite = (
        os.replace, os.remove, os.write, os.pwrite,
    )

    def gate() -> None:
        if not armed["on"]:
            return
        calls["n"] += 1
        if kill_at and calls["n"] == kill_at:
            os.kill(os.getpid(), signal.SIGKILL)

    def replace(src, dst, **kw):
        gate()
        return real_replace(src, dst, **kw)

    def remove(p, **kw):
        gate()
        return real_remove(p, **kw)

    def write(fd, data):
        gate()
        return real_write(fd, data)

    def pwrite(fd, data, offset):
        # the control-pointer flip (set_next_seq) writes via pwrite —
        # without this gate the "pointer advanced, rows not yet
        # published" state had no kill point (r18)
        gate()
        return real_pwrite(fd, data, offset)

    os.replace, os.remove, os.write, os.pwrite = (
        replace, remove, write, pwrite,
    )
    # patch BEFORE import: _write_all binds os.write as a default arg
    from quebic_spark import INTEGER, TEXT, Queue, Schema

    q = Queue(qdir, Schema(INTEGER, TEXT), auto_compact_files=None,
              fsync=(scenario == "bulk_append_fsync"
                     or os.environ.get("CHAOS_FSYNC") == "1"))
    if scenario == "full_compact":
        q.compact(target_file_rows=8, small_file_rows=100)
    elif scenario == "stream_safe":
        # qdir/checkpoint (fabricated by the parent) attaches the
        # stream and routes compact() to _compact_stream_safe
        q.compact()
    elif scenario == "merge_undiscovered":
        q.compact(merge_undiscovered=True, target_file_rows=8,
                  small_file_rows=100)
    elif scenario == "push":
        first, n = int(sys.argv[4]), int(sys.argv[5])
        pub = q.publisher()
        for i in range(first, first + n):
            pub.push([i, f"v{i}"])
            print(f"ACK {i}", flush=True)
    elif scenario == "push_all":
        # one bulk batch: a single write_batch commit (pointer flip +
        # tmp publish) — crash atomicity is all-or-nothing
        first, n = int(sys.argv[4]), int(sys.argv[5])
        rest = q.publisher().push_all(
            [[i, f"v{i}"] for i in range(first, first + n)]
        )
        if not rest:
            print("ACKALL", flush=True)
    elif scenario in ("bulk_append", "bulk_append_fsync"):
        # the bulk Spark ingest tier's two commit orderings
        # (queue/queue.py:1404-1414 default flip-then-publish;
        # :1360-1403 fsync publish-then-flip behind the sweep-intent
        # marker). small_batch_rows=0 forces the scalable multi-part
        # path so the publish loop has several rename boundaries.
        from quebic_spark.session import get_spark

        spark = get_spark(
            app_name="chaos_bulk", master="local[2]",
            shuffle_partitions=2,
        )
        df = spark.range(40).selectExpr(
            "cast(id as int) AS c0", "concat('v', id) AS c1"
        )
        armed["on"] = True
        q.append_dataframe(df, order_by=["c0"], small_batch_rows=0)
        armed["on"] = False
        print("ACKBULK", flush=True)
        spark.stop()
    elif scenario == "consume":
        # the ack-flip protocol: print AFTER consume returns, so the
        # parent knows exactly which records were acked before death;
        # a kill between the state write and the print leaves at most
        # ONE record acked-but-unprinted (the at-least-once window)
        sub = q.subscriber()
        while True:
            r = sub.consume(lambda rec: rec)
            if r is None:
                break
            print(f"ACK {r[0]}", flush=True)
    elif scenario == "dlq_replay":
        # DLQ re-ingest: per file, re-commit as a fresh batch THEN
        # remove the file — a crash in between redelivers on retry
        # (documented at-least-once), never loses the record
        q.replay_dlq()
    elif scenario == "heal":
        # the gated operation already ran: the Queue(...) constructor
        # above executed recover() -> replay_pending_compaction over
        # the parent's fabricated torn state, with every os.replace /
        # os.remove / pointer write counted by the gate
        pass
    elif scenario == "dlq":
        # poison every record: two failing visits then the DLQ route
        # (write_dlq BEFORE the ack flip — the ordering under test)
        sub = q.subscriber()

        def boom(rec):
            raise RuntimeError("poison")

        while True:
            try:
                if sub.consume(boom, error_permit=2) is None:
                    break
            except RuntimeError:
                pass
    else:
        raise SystemExit(f"unknown scenario: {scenario}")
    # restore so interpreter shutdown never trips the gate
    os.replace, os.remove, os.write, os.pwrite = (
        real_replace, real_remove, real_write, real_pwrite,
    )
    print(f"MUTATIONS {calls['n']}", flush=True)


if __name__ == "__main__":
    main()
