"""Power-loss sweep over the fsync-mode durability protocols
(VERDICT r19 next #1 — the class the SIGKILL chaos drive cannot
reach: metadata reordering and content loss across a power cut).

For each scenario the drive:

1. builds real pre-crash queue state (reusing tools/chaos_drive's
   ``build_state`` fabrications — fabricated checkpoints, torn heal
   manifests — so the power-loss tier sweeps the same protocol space
   as the SIGKILL tier);
2. runs the protocol ONCE to completion under ``tools.powerloss.
   Tracer``, recording the durability journal;
3. for every sampled crash point, reconstructs candidate on-platter
   states (one deterministic adversarial worst case + seeded random
   coin-flip states) and runs the chaos-drive invariants on each:
   the must-survive rows delivered exactly once, FIFO order, queue
   liveness, ``verify()`` clean.

Scenarios (all with ``fsync=True`` — the mode that PROMISES power-loss
durability; the default mode documents process-crash consistency
only):

* ``push``        — per-record pushes; every push that RETURNED
                    (its mark precedes the crash point) must survive.
* ``push_all``    — one bulk write_batch commit; all-or-nothing.
* ``full_compact``          — tiered compaction's staged→manifest→
                    publish chain (the 8f33b02 ordering under test).
* ``merge_undiscovered``    — the in-stream merge tier's chain.
* ``heal``        — recovery REPLAY over a fabricated torn manifest
                    as the traced protocol (power loss mid-heal).
* ``sink_append`` — queue_sink's durable append + marker protocol;
                    after reconstruction the micro-batch is REPLAYED
                    (the restart shape): the replay must land every
                    row exactly once or fail loud — never silently
                    lose or duplicate.

CLI::

    python tools/powerloss_drive.py [--seed 90210] [--points 24]
        [--rand 2] [--scenarios push,full_compact,...] [--root DIR]

Prints one JSON summary line; exit 1 on any violation. The committed
CI gate is tests/test_powerloss.py (smaller point counts, plus the
8f33b02 canary proving the harness catches the r19 bug mechanically).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import chaos_drive  # noqa: E402  (tools/chaos_drive.py)
import powerloss  # noqa: E402  (tools/powerloss.py)

from quebic_spark import INTEGER, TEXT, Queue, Schema  # noqa: E402

SCHEMA = Schema(INTEGER, TEXT)
SCENARIOS = (
    "push", "push_all", "full_compact", "merge_undiscovered", "heal",
    "consume", "dlq", "stream_safe", "dlq_replay", "sink_append",
)


def _release(q: Queue) -> None:
    q._closed = True
    q._storage.close_handles()


def trace_scenario(scenario: str, qdir: str, rng: random.Random,
                   spark=None) -> tuple[list, dict, dict]:
    """Build pre-state, run the protocol under the tracer, return
    (journal, pre_files, spec). ``spec`` is the chaos-drive invariant
    spec template; marks in the journal refine it per crash point."""
    if scenario in ("push", "push_all"):
        spec = {"must": [], "allowed": list(range(8)), "consumer": None}
        with powerloss.Tracer(qdir) as tr:
            q = Queue(qdir, SCHEMA, capacity=10**6,
                      auto_compact_files=None, fsync=True)
            tr.mark("CREATED")
            pub = q.publisher()
            if scenario == "push":
                for i in range(8):
                    pub.push([i, f"v{i}"])
                    tr.mark(f"ACK {i}")
            else:
                rest = pub.push_all([[i, f"v{i}"] for i in range(8)])
                if not rest:
                    tr.mark("ACKALL")
            _release(q)
        return tr.journal, tr.pre_files, spec
    if scenario == "sink_append":
        assert spark is not None, "sink_append needs a SparkSession"
        from quebic_spark.streaming import queue_sink

        # a durable pre-existing queue (creation is not under test)
        q0 = Queue(qdir, SCHEMA, capacity=10**6,
                   auto_compact_files=None, fsync=True)
        _release(q0)
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "c0 int, c1 string"
        )
        spec = {"must": [], "allowed": list(range(6)),
                "consumer": None, "sink_rows": list(range(6))}
        with powerloss.Tracer(qdir) as tr:
            q = Queue(qdir, SCHEMA, capacity=10**6,
                      auto_compact_files=None, fsync=True)
            queue_sink(q, order_by=["c0"])(df, 0)
            tr.mark("SINKDONE")
            _release(q)
        return tr.journal, tr.pre_files, spec
    if scenario == "dlq_replay":
        # partial-admission shape: 6 poison rows in the DLQ plus 7
        # unacked live rows against capacity 10, so replay_dlq admits
        # only 3 and must durably SHRINK the DLQ file to the remainder
        # — the rewrite path whose power-loss ordering is under test
        # (full-admission replay is already covered by the chaos
        # SIGKILL tier; the rewrite only runs at capacity)
        q = Queue(qdir, SCHEMA, capacity=10, auto_compact_files=None)
        pub = q.publisher()
        for i in range(6):
            pub.push([i, f"p{i}"])
        sub = q.subscriber()

        def _boom(rec):
            raise RuntimeError("poison")

        while True:
            try:
                if sub.consume(_boom, error_permit=1) is None:
                    break
            except RuntimeError:
                pass
        # merge the per-record DLQ files into ONE multi-row file (the
        # shape StreamingConsumer's batch DLQ route writes): partial
        # admission then has to SHRINK the file, not just remove it
        import pyarrow as pa
        import pyarrow.parquet as pq

        dlq_dir = q._storage.dlq_dir
        parts = sorted(
            os.path.join(dlq_dir, n) for n in os.listdir(dlq_dir)
            if n.endswith(".parquet")
        )
        merged = pa.concat_tables([pq.read_table(p) for p in parts])
        pq.write_table(merged, parts[0] + ".tmp")
        os.replace(parts[0] + ".tmp", parts[0])
        for p in parts[1:]:
            os.remove(p)
        for i in range(100, 107):
            pub.push([i, f"v{i}"])
        _release(q)
        spec = {
            "must": list(range(6)) + list(range(100, 107)),
            "allowed": list(range(6)) + list(range(100, 107)),
            "consumer": None,
            "dlq_union": True,
            "allow_duplicates": True,
            "retry_replay": True,
        }
        with powerloss.Tracer(qdir) as tr:
            q = Queue(qdir, SCHEMA, capacity=10,
                      auto_compact_files=None, fsync=True)
            q.replay_dlq()
            _release(q)
        return tr.journal, tr.pre_files, spec
    # consume / DLQ / stream-safe / compaction-family scenarios reuse
    # the chaos drive's state fabrications (including the heal
    # scenario's torn manifest, stream_safe's fabricated checkpoint
    # with committed/discovered files, and merge_undiscovered's empty
    # checkpoint)
    spec = chaos_drive.build_state(qdir, scenario, rng,
                                   keep_open=False)
    with powerloss.Tracer(qdir) as tr:
        q = Queue(qdir, SCHEMA, capacity=10**6,
                  auto_compact_files=None, fsync=True)
        if scenario == "full_compact":
            q.compact(target_file_rows=8, small_file_rows=100)
        elif scenario == "stream_safe":
            # fabricated checkpoint attaches the stream: compact takes
            # the delete-only path (whole committed files removed, ack
            # advanced over the contiguous deleted prefix)
            q.compact()
        elif scenario == "merge_undiscovered":
            q.compact(merge_undiscovered=True, target_file_rows=8,
                      small_file_rows=100)
        elif scenario == "consume":
            # the fsynced ack-flip chain: a power loss may regress the
            # ack (legal redelivery) but never tear it, and never
            # loses an un-acked row
            sub = q.subscriber()
            while True:
                r = sub.consume(lambda rec: rec)
                if r is None:
                    break
                tr.mark(f"ACK {r[0]}")
        elif scenario == "dlq":
            # poison routing: write_dlq's fsync chain lands BEFORE the
            # ack flip, so no power loss leaves a record in NEITHER
            # the log nor the DLQ
            sub = q.subscriber()

            def boom(rec):
                raise RuntimeError("poison")

            while True:
                try:
                    if sub.consume(boom, error_permit=1) is None:
                        break
                except RuntimeError:
                    pass
        # heal: the Queue open above already ran recover() /
        # replay_pending_compaction over the torn state — that IS the
        # traced protocol
        _release(q)
    return tr.journal, tr.pre_files, spec


def _spec_at(scenario: str, spec: dict, journal: list,
             c: int) -> dict:
    """Refine the invariant spec for a crash at journal index c."""
    marks = powerloss.marks_before(journal, c)
    out = dict(spec)
    out["consumer"] = None
    if scenario == "push":
        out["must"] = [int(m.split()[1]) for m in marks
                       if m.startswith("ACK ")]
        out["accept_unopenable"] = "CREATED" not in marks
    elif scenario == "push_all":
        out["all_or_nothing"] = list(out["allowed"])
        out["must"] = (
            list(out["allowed"]) if "ACKALL" in marks else []
        )
        out["accept_unopenable"] = "CREATED" not in marks
    elif scenario == "sink_append":
        out["must"] = (
            list(out["allowed"]) if "SINKDONE" in marks else []
        )
        out["all_or_nothing"] = list(out["allowed"])
    elif scenario == "consume":
        # marked acks were REPORTED to the application; a durable ack
        # may legally suppress redelivery, a reverted one redelivers
        # (at-least-once). The single record between its ack write and
        # its mark at the crash point is the usual in-flight allowance
        # (consumption is FIFO, so it is exactly the next id).
        acked = [int(m.split()[1]) for m in marks
                 if m.startswith("ACK ")]
        inflight = acked[-1] + 1 if acked else 0
        out["must"] = [
            i for i in out["must"] if i not in acked and i != inflight
        ]
    return out


def check_candidate(scenario: str, cand_dir: str, spec: dict,
                    spark=None) -> list[str]:
    """Run the chaos invariants on one reconstructed state. For
    ``sink_append``, first REPLAY the micro-batch (the post-power-loss
    restart): a successful replay must leave every row exactly once; a
    RuntimeError is the documented fail-loud outcome for genuinely
    ambiguous states (e.g. a torn-then-repaired pointer landing
    mid-batch) and is accepted — silent loss or duplication is not."""
    spec = dict(spec)
    if scenario == "sink_append":
        from quebic_spark.streaming import queue_sink

        try:
            q = Queue(cand_dir, SCHEMA, capacity=10**6,
                      auto_compact_files=None, fsync=True)
        except Exception as exc:  # noqa: BLE001
            return [f"queue unopenable after power loss: {exc!r}"]
        try:
            df = spark.createDataFrame(
                [(i, f"v{i}") for i in spec["sink_rows"]],
                "c0 int, c1 string",
            )
            queue_sink(q, order_by=["c0"])(df, 0)
            spec["must"] = list(spec["sink_rows"])
            spec["all_or_nothing"] = list(spec["sink_rows"])
        except RuntimeError:
            # fail-loud: exactly-once is unprovable from this platter
            # state and the sink refused to guess — the accepted
            # contract. The drain below still polices duplicates.
            spec["must"] = []
            spec.pop("all_or_nothing", None)
        finally:
            _release(q)
    try:
        return chaos_drive.check_invariants(cand_dir, spec)
    except Exception as exc:  # noqa: BLE001
        if spec.get("accept_unopenable"):
            # the queue's CREATION never returned to the caller —
            # an unopenable directory is an acceptable outcome
            return []
        return [f"invariant check raised: {exc!r}"]


def sample_points(n_ops: int, points: int,
                  rng: random.Random) -> list[int]:
    """Crash points 0..n_ops: all of them when few, else an
    even-spaced spine plus random fill (always including the final
    index — the completed-op-then-power-loss state)."""
    allpts = list(range(n_ops + 1))
    if len(allpts) <= points:
        return allpts
    step = max(1, n_ops // max(1, points - 1))
    spine = set(range(0, n_ops + 1, step)) | {n_ops}
    while len(spine) < points:
        spine.add(rng.randrange(n_ops + 1))
    return sorted(spine)


def run_scenario(scenario: str, root: str, seed: int,
                 points: int = 24, rand_candidates: int = 2,
                 spark=None, trial: int = 0,
                 journal_filter=None) -> dict:
    """Trace once, sweep crash points × candidates. Returns a summary
    dict with any violations. ``trial`` varies the fabricated
    pre-state (the heal scenario's torn-manifest shapes and compact's
    consumed prefix are rng-drawn). ``journal_filter`` (tests only)
    edits the recorded journal before reconstruction — the 8f33b02
    canary strips fsync events to resurrect the pre-fix ordering."""
    rng = random.Random(f"{seed}:{scenario}:{trial}")
    qdir = os.path.join(root, f"pl-{scenario}-{trial}")
    os.makedirs(qdir, exist_ok=True)
    journal, pre_files, spec = trace_scenario(scenario, qdir, rng,
                                              spark=spark)
    if journal_filter is not None:
        journal = journal_filter(journal)
    pts = sample_points(len(journal), points, rng)
    violations: list[dict] = []
    n_cand = 0
    for c in pts:
        spec_c = _spec_at(scenario, spec, journal, c)
        cands = [("adversarial", True, random.Random(f"{seed}:a:{c}"))]
        for k in range(rand_candidates):
            cands.append(
                (f"rand{k}", False,
                 random.Random(f"{seed}:r:{c}:{k}"))
            )
        for label, adv, crng in cands:
            n_cand += 1
            files = powerloss.build_candidate(
                pre_files, journal, c, crng, adversarial=adv
            )
            # materialize IN PLACE: fabricated manifests/checkpoints
            # record absolute paths (the r19 chaos-drive rebasing
            # gotcha), so every candidate must live at the traced
            # directory's own path for its replay to act on itself
            shutil.rmtree(qdir, ignore_errors=True)
            powerloss.materialize(files, qdir, qdir)
            errs = check_candidate(scenario, qdir, spec_c,
                                   spark=spark)
            if errs:
                violations.append(
                    {"crash_at": c, "candidate": label,
                     "errors": errs}
                )
    shutil.rmtree(qdir, ignore_errors=True)
    return {
        "scenario": scenario,
        "trial": trial,
        "journal_ops": len(journal),
        "crash_points": len(pts),
        "candidates": n_cand,
        "violations": violations,
    }


def sweep(seed: int = 90210, points: int = 24,
          rand_candidates: int = 2,
          scenarios=SCENARIOS, root: str | None = None,
          trials: int = 2) -> dict:
    own_root = root is None
    root = root or tempfile.mkdtemp(prefix="quebic_powerloss_")
    spark = None
    try:
        if "sink_append" in scenarios:
            from quebic_spark.session import get_spark

            spark = get_spark(app_name="powerloss", master="local[2]",
                              shuffle_partitions=2)
        results = [
            run_scenario(s, root, seed, points=points,
                         rand_candidates=rand_candidates, spark=spark,
                         trial=t)
            for s in scenarios
            for t in range(trials)
        ]
    finally:
        if own_root:
            shutil.rmtree(root, ignore_errors=True)
    by_scenario: dict[str, dict] = {}
    for r in results:
        agg = by_scenario.setdefault(
            r["scenario"],
            {"journal_ops": 0, "crash_points": 0, "candidates": 0,
             "violations": []},
        )
        for k in ("journal_ops", "crash_points", "candidates"):
            agg[k] += r[k]
        agg["violations"].extend(
            {**v, "trial": r["trial"]} for v in r["violations"]
        )
    return {
        "seed": seed,
        "trials_per_scenario": trials,
        "scenarios": by_scenario,
        "total_candidates": sum(r["candidates"] for r in results),
        "total_violations": sum(
            len(r["violations"]) for r in results
        ),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=90210)
    ap.add_argument("--points", type=int, default=24)
    ap.add_argument("--rand", type=int, default=2)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    summary = sweep(args.seed, args.points, args.rand,
                    tuple(args.scenarios.split(",")), args.root,
                    trials=args.trials)
    print(json.dumps(summary))
    sys.exit(1 if summary["total_violations"] else 0)


if __name__ == "__main__":
    main()
