"""Whole-driver fault-injection victim for the streaming-relay chaos
tier (r19).

The queue chaos drive (tools/chaos_victim.py) kills single queue
operations; the streaming chaos kills compactors between micro-batches.
This victim is an ENTIRE Spark driver running the queue -> transform ->
queue relay (or a DLQ-routing StreamingConsumer), killed at a random
point INSIDE a micro-batch — and the kill is ``os.killpg(SIGKILL)``, so
the Python driver AND its py4j JVM (which owns the streaming checkpoint
commit) die together, like a power-off of the driver machine. That
makes the "foreachBatch returned, checkpoint commit never happened"
window real: Spark re-runs the batch on restart, and ``queue_sink``'s
commit-marker protocol must no-op it (exactly-once into the sink
queue).

Gated boundaries (armed only inside ``foreachBatch`` — driver/py4j
bootstrap makes unrelated os calls): ``os.replace`` / ``os.remove`` /
``os.write`` / ``os.pwrite`` — the sink's marker writes, the append's
publishes and pointer flip, the consumer's durable failure-count
persist — plus one synthetic boundary at ``foreachBatch`` RETURN (the
append-committed / checkpoint-uncommitted window, VERDICT r18 #1-#2).

Scenarios::

    python tools/chaos_relay_victim.py SRC DST CK relay    KILL_AT
    python tools/chaos_relay_victim.py SRC OUT CK consumer KILL_AT

``relay``: stream SRC through ``upper(c1)`` into queue DST via
``queue_sink`` (exactly-once markers), availableNow with
maxFilesPerTrigger=2. Prints ``RELAYDONE`` when the backlog drains.

``consumer``: ``StreamingConsumer`` over SRC with ``error_permit=2``;
rows whose id is in the poison batch raise, the rest append their ids
to the OUT file (at-least-once side effect). Prints ``CONSUMERDONE``
when drained, ``QUERYFAIL <type>`` when the poison batch fails the
query (the operator-restarts-the-stream contract).

``KILL_AT=0`` runs to completion and prints ``MUTATIONS <n>`` so the
sweep samples kill points that land inside micro-batch commits.

The parent must spawn this with ``start_new_session=True`` so the
process group is the victim's own and the killpg cannot reach the
test runner.
"""

from __future__ import annotations

import os
import signal
import sys


def main() -> None:
    src_dir, other, ck_dir, scenario, kill_at = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
        int(sys.argv[5]),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    calls = {"n": 0}
    armed = {"on": False}
    real_replace, real_remove, real_write, real_pwrite = (
        os.replace, os.remove, os.write, os.pwrite,
    )

    def gate() -> None:
        if not armed["on"]:
            return
        calls["n"] += 1
        if kill_at and calls["n"] == kill_at:
            # the whole session dies: Python driver AND the JVM that
            # holds the streaming checkpoint commit — no half of the
            # relay survives to tidy up
            os.killpg(os.getpid(), signal.SIGKILL)

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
        gate()
        return real_pwrite(fd, data, offset)

    os.replace, os.remove, os.write, os.pwrite = (
        replace, remove, write, pwrite,
    )
    from pyspark.sql import functions as F

    from quebic_spark import INTEGER, TEXT, Queue, Schema
    from quebic_spark.session import get_spark
    from quebic_spark.streaming import (
        StreamingConsumer,
        queue_sink,
        read_queue_stream,
    )

    spark = get_spark(
        app_name="chaos_relay", master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.driver.memory": "1g"},
    )
    src = Queue(src_dir, Schema(INTEGER, TEXT), auto_compact_files=None)

    if scenario == "relay":
        dst = Queue(other, Schema(INTEGER, TEXT),
                    auto_compact_files=None)
        inner = queue_sink(dst, order_by=["c0"])

        def on_batch(df, batch_id):
            armed["on"] = True
            try:
                inner(
                    df.select(
                        "c0", F.upper(F.col("c1")).alias("c1")
                    ),
                    batch_id,
                )
                # the synthetic boundary: append committed, marker
                # committed, Spark's checkpoint commit NOT yet run —
                # dying here forces a replay of this very batch
                gate()
            finally:
                armed["on"] = False

        q = (
            read_queue_stream(spark, src, max_files_per_trigger=2)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        print("RELAYDONE", flush=True)
    elif scenario == "relay_compact":
        # the full composition: StreamingConsumer (external checkpoint
        # -> durable registry) + exactly-once queue_sink + stream-safe
        # source compaction every 2 batches, all in one driver — kill
        # points land across sink markers, durable appends, pointer
        # flips, AND the in-foreachBatch compaction's deletes
        dst = Queue(other, Schema(INTEGER, TEXT),
                    auto_compact_files=None)
        inner = queue_sink(dst, order_by=["c0"])
        cons = StreamingConsumer(
            spark, src, checkpoint_dir=ck_dir,
            compact_every_batches=2,
        )
        orig_wrap = cons._wrap

        def wrap(f):
            handler = orig_wrap(f)

            def on_batch(df, batch_id):
                armed["on"] = True
                try:
                    handler(df, batch_id)
                    gate()  # post-batch, pre-checkpoint-commit
                finally:
                    armed["on"] = False

            return on_batch

        cons._wrap = wrap

        def relay(df, batch_id):
            inner(
                df.select("c0", F.upper(F.col("c1")).alias("c1")),
                batch_id,
            )

        cons.run_available(relay, max_files_per_trigger=2,
                           timeout_s=240)
        print("RELAYDONE", flush=True)
    elif scenario == "consumer":
        out_path = other
        # compact_every_batches: the stream-safe compaction runs
        # INSIDE foreachBatch, so its os.replace/os.remove boundaries
        # become kill points too — driver death mid-compact must heal
        # on the next open with the same delivery invariants
        cons = StreamingConsumer(
            spark, src, checkpoint_dir=ck_dir, error_permit=2,
            compact_every_batches=2,
        )
        orig_wrap = cons._wrap

        def wrap(f):
            handler = orig_wrap(f)

            def on_batch(df, batch_id):
                armed["on"] = True
                try:
                    handler(df, batch_id)
                    gate()  # post-batch, pre-checkpoint-commit
                finally:
                    armed["on"] = False

            return on_batch

        cons._wrap = wrap

        def f(df, batch_id):
            ids = [r["c0"] for r in df.collect()]
            if any(i == 3 for i in ids):
                raise RuntimeError("poison")
            with open(out_path, "a") as fh:
                fh.write("".join(f"{i}\n" for i in ids))

        try:
            # generous drain budget: chaos sweeps run on a loaded host
            cons.run_available(f, max_files_per_trigger=2,
                               timeout_s=240)
            print("CONSUMERDONE", flush=True)
        except Exception as exc:  # noqa: BLE001 — poison fails the query
            print(f"QUERYFAIL {type(exc).__name__}", flush=True)
    else:
        raise SystemExit(f"unknown scenario: {scenario}")
    os.replace, os.remove, os.write, os.pwrite = (
        real_replace, real_remove, real_write, real_pwrite,
    )
    print(f"MUTATIONS {calls['n']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
