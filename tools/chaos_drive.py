"""Randomized cross-process crash-point chaos drive for the queue
commit protocols (VERDICT r17 next #1).

r16 proved hand-reasoned crash orderings can miss a reader tier; r17
fixed that instance and wrote a checklist. This drive generalizes the
checklist empirically: for each trial it builds real queue state,
spawns a victim process (tools/chaos_victim.py) that SIGKILLs itself
immediately before a randomly chosen mutating-filesystem call
(os.replace / os.remove / os.write / os.pwrite — the last is the
control-pointer flip) inside one of the commit protocols —

* ``Queue.compact`` full mode        (queue/queue.py:629-668)
* ``Queue._compact_stream_safe``     (queue/queue.py:716-727)
* ``Queue._merge_undiscovered``      (queue/queue.py:844-862)
* ``QueueStorage.write_batch``       (queue/storage.py:983-1018, the
  push path: pointer flip, tmp publish, manifest replay liveness)
* ``Publisher.push_all``             (one bulk write_batch commit —
  crash atomicity is all-or-nothing, never a partial batch)
* ``Subscriber.consume`` ack flip    (at-least-once: at most ONE
  acked-but-unreported in-flight record may vanish)
* ``Subscriber.consume`` DLQ route   (write_dlq BEFORE the ack flip —
  a poison record survives a crash in pop-or-DLQ, never in neither)
* ``Queue.replay_dlq``               (re-commit THEN remove per DLQ
  file: a crash redelivers on retry, never loses; the retry itself
  must complete over the torn state and drain the DLQ)
* ``recover``/``replay_pending_compaction`` — the HEALER itself as
  the victim (r19): a fabricated torn post-manifest merge (random
  replay prefix pre-applied) killed mid-heal inside Queue open; a
  second open must finish the heal — rename-idempotence proven
  empirically, not just by design

Serial trials randomly run their victim in fsync=True mode, whose
push-path commit ORDERING differs (durable data before the fsynced
pointer flip), so both durability contracts collect kill points.

— then checks the at-least-once invariants from the OTHER side of the
crash:

* every row that must survive is delivered, in order, exactly once
  (no row behind the ack pointer, no double delivery);
* for half the compaction trials the checking consumer was ALREADY
  OPEN before the crash (the r16/r17 torn-window shape: no open-time
  recovery runs — the read-path ``replay_pending_compaction`` must
  heal), for the other half it is a fresh open (recover() tier);
* the queue stays live (a post-crash push/pop round-trip works);
* ``verify()`` is clean.

Kill points are sampled 1..T where T is the operation's actual
mutation count, measured by a counting run of the same victim against
a throwaway copy of the state — every sampled point lands INSIDE the
operation, so a 200-trial sweep is 200 real crash states, not 200
coin flips. Victims die by real SIGKILL in a real separate process
(the kernel drops the flock, exactly like production death).

CLI::

    python tools/chaos_drive.py [--trials 200] [--seed 1800]
                                [--jobs 16] [--root DIR]

Prints one JSON summary line; exit code 1 on any invariant violation.
The committed pytest gate is tests/test_chaos_drive.py.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import subprocess
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from quebic_spark import INTEGER, TEXT, Queue, Schema  # noqa: E402

SCHEMA = Schema(INTEGER, TEXT)
SCENARIOS = (
    "full_compact", "stream_safe", "merge_undiscovered", "push",
    "push_all", "dlq", "consume", "dlq_replay", "heal",
)
_VICTIM = os.path.join(_REPO, "tools", "chaos_victim.py")


def _release(q: Queue) -> None:
    """Release handles WITHOUT close(): close() runs a final
    compaction, which would consume the very state the victim is
    meant to crash inside."""
    q._closed = True
    q._storage.close_handles()


def _write_checkpoint(
    qdir: str, committed: list[str], discovered: list[str]
) -> None:
    """Fabricate a minimal Structured Streaming file-source checkpoint
    in the public on-disk format ``_parse_stream_file_sets`` reads:
    ``commits/0`` marks batch 0 committed; ``sources/0/0`` lists
    ``committed`` basenames at batchId 0 (<= last commit -> safe to
    delete) and ``discovered`` at batchId 1 (listed, NOT committed —
    must never be removed or merged)."""
    ck = os.path.join(qdir, "checkpoint")
    os.makedirs(os.path.join(ck, "commits"))
    os.makedirs(os.path.join(ck, "sources", "0"))
    with open(os.path.join(ck, "commits", "0"), "w") as f:
        f.write("v1\n{}")
    lines = ["v1"]
    data_dir = os.path.join(qdir, "data")
    for name in committed:
        lines.append(json.dumps(
            {"path": f"file://{os.path.join(data_dir, name)}",
             "timestamp": 1, "batchId": 0}
        ))
    for name in discovered:
        lines.append(json.dumps(
            {"path": f"file://{os.path.join(data_dir, name)}",
             "timestamp": 2, "batchId": 1}
        ))
    with open(os.path.join(ck, "sources", "0", "0"), "w") as f:
        f.write("\n".join(lines))


def build_state(qdir: str, scenario: str, rng: random.Random,
                keep_open: bool) -> dict:
    """Create the pre-crash queue state. Returns the trial spec:
    ``must`` (ids that MUST be delivered post-crash), ``allowed``
    (ids that MAY appear — a superset when a stream is the consumer
    of record for part of the log), and the still-open consumer when
    ``keep_open`` (the r16 already-open-reader shape)."""
    if scenario in ("push", "push_all"):
        # the victim creates the queue itself; its ACK lines define
        # `must` (filled in by the caller from victim stdout)
        return {"must": [], "allowed": list(range(12)), "consumer": None}
    if scenario in ("bulk_append", "bulk_append_fsync"):
        # bulk Spark ingest: the victim creates the queue and runs
        # append_dataframe over ids 0..39. Crash contract differs by
        # mode: default flip-then-publish commits a FIFO PREFIX of
        # the batch; fsync publish-then-flip is all-or-nothing (parts
        # beyond an unflipped pointer are invisible and swept)
        spec = {"must": [], "allowed": list(range(40)),
                "consumer": None}
        if scenario == "bulk_append":
            spec["fifo_prefix"] = list(range(40))
        else:
            spec["all_or_nothing"] = list(range(40))
        return spec
    if scenario == "consume":
        q = Queue(qdir, SCHEMA, capacity=10**6,
                  auto_compact_files=None)
        pub = q.publisher()
        for i in range(10):
            pub.push([i, f"v{i}"])
        spec = {
            # filled by run_trial from the victim's ACK lines: the
            # parent must still see every UNACKED record, except at
            # most one acked-but-unprinted in-flight (the legal
            # at-least-once window between the state write and the
            # victim's print)
            "must": list(range(10)),
            "allowed": list(range(10)),
            "consumer": None,
            "ack_scenario": True,
        }
        if keep_open:
            spec["consumer"] = q
        else:
            _release(q)
        return spec
    if scenario == "dlq_replay":
        q = Queue(qdir, SCHEMA, capacity=10**6,
                  auto_compact_files=None)
        pub = q.publisher()
        for i in range(6):
            pub.push([i, f"v{i}"])
        sub = q.subscriber()

        def _boom(rec):
            raise RuntimeError("poison")

        # route all six to the DLQ (error_permit=1: one failing visit
        # then the poison route on the next)
        while True:
            try:
                if sub.consume(_boom, error_permit=1) is None:
                    break
            except RuntimeError:
                pass
        spec = {
            # post-crash each id must be deliverable OR still in the
            # DLQ (dlq_union); a crash between a file's re-commit and
            # its removal leaves it in BOTH, and the parent's retry
            # may re-ingest it again — duplicates are the documented
            # at-least-once outcome, loss never is
            "must": list(range(6)),
            "allowed": list(range(6)),
            "consumer": None,
            "dlq_union": True,
            "allow_duplicates": True,
            "retry_replay": True,
        }
        if keep_open:
            spec["consumer"] = q
        else:
            _release(q)
        return spec
    if scenario == "dlq":
        q = Queue(qdir, SCHEMA, capacity=10**6,
                  auto_compact_files=None)
        pub = q.publisher()
        for i in range(6):
            pub.push([i, f"v{i}"])
        spec = {
            # every pushed id must survive SOMEWHERE: deliverable via
            # pop OR present in the DLQ (write_dlq lands BEFORE the
            # ack flip, so a crash in between may leave it in both —
            # at-least-once — but never in neither). check_invariants
            # subtracts the DLQed ids from `must` after the crash.
            "must": list(range(6)),
            "allowed": list(range(6)),
            "consumer": None,
            "dlq_union": True,
        }
        if keep_open:
            spec["consumer"] = q
        else:
            _release(q)
        return spec
    if scenario == "heal":
        # every prior scenario kills an ORIGINAL commit protocol; this
        # one makes the RECOVERY REPLAY the victim (r19): fabricate a
        # torn post-manifest merge — a complete staged chunk covering
        # m adjacent committed files, the commit manifest in place,
        # and a random prefix of the replay already applied (the
        # mid-replay resume states a previously-killed heal leaves) —
        # then the victim dies inside Queue open's
        # recover()/replay_pending_compaction. The heal must be
        # idempotent over its own partial progress: a second open
        # finishes it with zero loss and zero double delivery.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from quebic_spark.queue.storage import write_json_atomic

        q = Queue(qdir, SCHEMA, capacity=10**6,
                  auto_compact_files=None)
        pub = q.publisher()
        n = 18
        for i in range(n):
            pub.push([i, f"v{i}"])  # one committed file per push
        k = rng.randint(0, 5)
        sub = q.subscriber()
        for _ in range(k):
            sub.try_pop()
        batches = q._storage.list_batches()
        m = rng.randint(2, 5)
        i0 = rng.randint(0, len(batches) - m)
        run = batches[i0:i0 + m]
        merged = pa.concat_tables([pq.read_table(p) for _, _, p in run])
        staged_path = (
            q._storage.batch_path(run[0][0], run[-1][1]) + ".compact"
        )
        pq.write_table(merged, staged_path)
        removes = [p for _, _, p in run]
        write_json_atomic(
            q._storage.compact_manifest_path,
            {"remove": removes, "staged": [staged_path]},
        )
        # pre-apply a replay prefix, in the replay's own order (olds
        # out first, then the staged rename) — the states a first
        # killed heal leaves behind
        j = rng.randint(0, len(removes))
        for p in removes[:j]:
            os.remove(p)
        if j == len(removes) and rng.random() < 0.5:
            os.replace(staged_path, staged_path[: -len(".compact")])
        spec = {
            "must": list(range(k, n)),
            "allowed": list(range(k, n)),
            "consumer": None,
        }
        if keep_open:
            spec["consumer"] = q
        else:
            _release(q)
        return spec
    q = Queue(qdir, SCHEMA, capacity=10**6, auto_compact_files=None)
    pub = q.publisher()
    n = 24
    for i in range(n):
        pub.push([i, f"v{i}"])  # one committed file per push
    spec: dict = {"consumer": None}
    if scenario == "full_compact":
        k = rng.randint(0, n // 2)
        sub = q.subscriber()
        for _ in range(k):
            sub.try_pop()
        spec["must"] = spec["allowed"] = list(range(k, n))
    elif scenario == "stream_safe":
        batches = q._storage.list_batches()
        names = [os.path.basename(p) for _, _, p in batches]
        m = rng.randint(1, len(names) - 1)
        committed = sorted(rng.sample(names, m))
        rest = [nm for nm in names if nm not in committed]
        listed = rng.sample(rest, min(len(rest), rng.randint(0, 4)))
        _write_checkpoint(qdir, committed, listed)
        committed_set = set(committed)
        max_file = os.path.basename(batches[-1][2])
        must = []
        for (s, e, p) in batches:
            nm = os.path.basename(p)
            if nm not in committed_set or nm == max_file:
                # seq is 1-based and ids are 0-based (id = seq-1)
                must.extend(range(s - 1, e))
        spec["must"] = sorted(must)
        # committed-but-not-yet-removed files may still deliver:
        # at-least-once allows it, the stream was the consumer of
        # record, so `allowed` is everything
        spec["allowed"] = list(range(n))
        # rows the fabricated checkpoint marks stream-consumed: the
        # concurrent trial must NOT require them — once a racing
        # producer pushes past the old max seq, the last pre-crash
        # file loses its latest-survives protection and a committed
        # row in it may legitimately be deleted
        committed_rows = []
        for (s, e, p) in batches:
            if os.path.basename(p) in committed_set:
                committed_rows.extend(range(s - 1, e))
        spec["stream_committed_ids"] = sorted(committed_rows)
    elif scenario == "merge_undiscovered":
        k = rng.randint(0, 6)
        sub = q.subscriber()
        for _ in range(k):
            sub.try_pop()
        # parseable checkpoint with NOTHING committed or discovered:
        # the remove tier no-ops and every small file is mergeable —
        # isolates _merge_undiscovered's staged/manifest protocol
        _write_checkpoint(qdir, [], [])
        spec["must"] = spec["allowed"] = list(range(k, n))
    else:
        raise ValueError(scenario)
    if keep_open:
        spec["consumer"] = q
    else:
        _release(q)
    return spec


def run_victim(qdir: str, scenario: str, kill_at: int,
               push_args: tuple[int, int] | None = None,
               fsync: bool = False,
               ) -> subprocess.CompletedProcess:
    cmd = [sys.executable, _VICTIM, qdir, scenario, str(kill_at)]
    if push_args:
        cmd += [str(push_args[0]), str(push_args[1])]
    env = dict(os.environ)
    if fsync:
        env["CHAOS_FSYNC"] = "1"
    else:
        env.pop("CHAOS_FSYNC", None)
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=120, env=env)


def count_mutations(qdir: str, scenario: str,
                    push_args: tuple[int, int] | None = None,
                    fsync: bool = False) -> int:
    """Mutation count T of the victim op, measured on a throwaway
    COPY of the state (the counting run completes the op, and the
    real state must stay pre-crash). Offset-log checkpoint entries
    carry absolute paths, but only basenames are parsed, so the copy
    behaves identically."""
    tmp = qdir + "__count"
    if scenario == "push":
        os.makedirs(tmp)  # push builds its own queue in an empty dir
    else:
        shutil.copytree(qdir, tmp)
        manifest = os.path.join(tmp, "compact-commit.json")
        if os.path.exists(manifest):
            # the compact commit manifest records ABSOLUTE paths and
            # replay uses them verbatim — without rebasing, the count
            # run's heal would mutate the ORIGINAL queue through the
            # copied manifest and leave the real victim almost
            # nothing to be killed inside (found by the first heal
            # sweep: 9/12 victims completed)
            with open(manifest) as f:
                m = json.load(f)
            for key in ("remove", "staged"):
                m[key] = [
                    os.path.join(tmp, os.path.relpath(p, qdir))
                    for p in m.get(key, [])
                ]
            with open(manifest, "w") as f:
                json.dump(m, f)
    try:
        p = run_victim(tmp, scenario, 0, push_args, fsync=fsync)
        if p.returncode != 0:
            raise RuntimeError(
                f"count run failed rc={p.returncode}: "
                f"{p.stderr.strip()[-400:]}"
            )
        for line in p.stdout.splitlines():
            if line.startswith("MUTATIONS "):
                return int(line.split()[1])
        raise RuntimeError(f"no MUTATIONS line in: {p.stdout[-200:]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def check_invariants(qdir: str, spec: dict) -> list[str]:
    """Post-crash at-least-once audit; returns violations (empty =
    green). Drains FIRST (the read path must heal torn state without
    any reopen — the r17 fix), then proves liveness, then verify()."""
    errors: list[str] = []
    consumer = spec.get("consumer")
    q = consumer or Queue(qdir, SCHEMA, auto_compact_files=None)
    if spec.get("retry_replay"):
        # the crashed operator's retry: must complete cleanly over
        # whatever torn state the victim left, after which the DLQ
        # is drained and EVERY id is deliverable (the dlq_union
        # subtraction below then subtracts nothing)
        try:
            q.replay_dlq()
        except Exception as exc:  # noqa: BLE001
            errors.append(f"replay_dlq retry failed: {exc!r}")
    if spec.get("dlq_union"):
        # poison records route to the DLQ and ack; they are no longer
        # poppable, so the survival requirement becomes pop OR DLQ
        import glob as _glob

        import pyarrow.parquet as _pq

        dlq_ids: set[int] = set()
        for p in _glob.glob(os.path.join(qdir, "dlq", "*.parquet")):
            try:
                dlq_ids.update(
                    _pq.read_table(p, columns=["c0"])
                    .column("c0").to_pylist()
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(f"unreadable DLQ file {p}: {exc!r}")
        spec = dict(spec)
        spec["must"] = [i for i in spec["must"] if i not in dlq_ids]
    sub = q.subscriber()
    got: list[int] = []
    while True:
        r = sub.try_pop()
        if r is None:
            break
        got.append(r[0])
    if spec.get("allow_duplicates"):
        # at-least-once replay scenarios: re-ingested copies carry
        # fresh seqs, so repeats and id-order inversions are legal —
        # only loss (checked below) is a violation
        pass
    else:
        for a, b in zip(got, got[1:]):
            if b <= a:
                errors.append(
                    f"order/duplicate violation: {a} then {b}"
                )
                break
    aon = spec.get("all_or_nothing")
    if aon is not None and got and sorted(got) != sorted(aon):
        # a single bulk write_batch is one tmp-publish commit: a crash
        # may lose the whole batch (no push returned) but never
        # expose part of it
        errors.append(f"bulk batch partially visible: {got}")
    fp = spec.get("fifo_prefix")
    if fp is not None and got != fp[:len(got)]:
        # default-mode bulk ingest: flip first, publish ascending —
        # a crash commits a contiguous FIFO prefix, never a
        # mid-batch subset
        errors.append(f"bulk ingest not a FIFO prefix: {got[:10]}")
    already = set(spec.get("already_delivered", ()))
    if already & set(got):
        errors.append(
            f"re-delivered rows a racing consumer already took: "
            f"{sorted(already & set(got))[:8]}"
        )
    got_set = set(got)
    missing = [i for i in spec["must"] if i not in got_set]
    if missing:
        errors.append(
            f"lost rows (at-least-once violated): {missing[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    extra = sorted(got_set - set(spec["allowed"]))
    if extra:
        errors.append(f"unexpected rows delivered: {extra[:8]}")
    try:
        base = (max(spec["allowed"]) if spec["allowed"] else 0) + 1000
        pub = q.publisher()
        pub.push([base, "live0"])
        pub.push([base + 1, "live1"])
        live = [sub.try_pop(), sub.try_pop()]
        if [r[0] if r else None for r in live] != [base, base + 1]:
            errors.append(f"liveness round-trip failed: {live}")
    except Exception as exc:  # noqa: BLE001 — any crash is a finding
        errors.append(f"liveness raised: {exc!r}")
    try:
        q.verify()
    except Exception as exc:  # noqa: BLE001
        errors.append(f"verify() failed: {exc!r}")
    _release(q)
    return errors


def run_trial(root: str, scenario: str, seed: int, idx: int) -> dict:
    rng = random.Random(f"{seed}:{scenario}:{idx}")
    qdir = os.path.join(root, f"{scenario}-{idx}")
    os.makedirs(qdir, exist_ok=True)
    push_args = (
        (0, 12) if scenario in ("push", "push_all") else None
    )
    keep_open = (
        scenario not in ("push", "push_all", "bulk_append",
                         "bulk_append_fsync")
        and rng.random() < 0.5
    )
    spec = build_state(qdir, scenario, rng, keep_open)
    result = {"scenario": scenario, "trial": idx, "errors": []}
    try:
        fsync = rng.random() < 0.5
        result["fsync"] = fsync
        t = count_mutations(qdir, scenario, push_args, fsync=fsync)
        kill_at = rng.randint(1, t)
        result.update(mutations=t, kill_at=kill_at)
        p = run_victim(qdir, scenario, kill_at, push_args,
                       fsync=fsync)
        result["rc"] = p.returncode
        if p.returncode != -9:
            result["errors"].append(
                f"victim not SIGKILLed (rc={p.returncode}, kill_at="
                f"{kill_at}/{t}): {p.stderr.strip()[-200:]}"
            )
        if scenario == "push":
            spec["must"] = [
                int(line.split()[1])
                for line in p.stdout.splitlines()
                if line.startswith("ACK ")
            ]
        elif scenario == "push_all":
            spec["all_or_nothing"] = list(spec["allowed"])
            if "ACKALL" in p.stdout:
                spec["must"] = list(spec["allowed"])
        elif scenario.startswith("bulk_append"):
            if "ACKBULK" in p.stdout:
                spec["must"] = list(spec["allowed"])
        elif scenario == "consume":
            acked = [
                int(line.split()[1])
                for line in p.stdout.splitlines()
                if line.startswith("ACK ")
            ]
            # at most one acked-but-unprinted in-flight record may
            # also be gone: consumption is FIFO, so it is exactly the
            # next id after the last printed ack
            inflight = acked[-1] + 1 if acked else 0
            spec["must"] = [
                i for i in spec["must"]
                if i not in acked and i != inflight
            ]
        result["errors"].extend(check_invariants(qdir, spec))
    except Exception as exc:  # noqa: BLE001 — harness faults are red too
        result["errors"].append(f"harness: {exc!r}")
    finally:
        consumer = spec.get("consumer")
        if consumer is not None and not consumer._closed:
            _release(consumer)
        shutil.rmtree(qdir, ignore_errors=True)
    return result


def run_concurrent_trial(root: str, scenario: str, seed: int,
                         idx: int) -> dict:
    """Crash-point trial with a LIVE producer racing the victim: a
    second real process pushes 15 records against the same queue
    while the compactor victim runs and dies at its sampled mutation
    boundary. The flock serializes their critical sections and the
    kernel drops the victim's lock at death; the surviving producer's
    next write_batch replays the torn commit (the r17 liveness tier)
    — under real contention, not after it. Invariants: every
    pre-crash row AND every producer-acked row delivered in order,
    no duplicates, liveness, verify() clean."""
    import threading

    rng = random.Random(f"{seed}:conc:{scenario}:{idx}")
    qdir = os.path.join(root, f"conc-{scenario}-{idx}")
    os.makedirs(qdir, exist_ok=True)
    spec = build_state(qdir, scenario, rng, keep_open=False)
    # under the race the old max-seq file loses latest-survives
    # protection (a producer row becomes max seq), so every stream-
    # committed row becomes legitimately deletable
    committed = set(spec.pop("stream_committed_ids", []))
    spec["must"] = [i for i in spec["must"] if i not in committed]
    result = {"scenario": f"concurrent:{scenario}", "trial": idx,
              "errors": []}
    try:
        # count on the PRE-RACE state (a copy during the race would
        # tear); the racing compactor sees >= these mutations, so a
        # point in 1..T still lands inside the protocol
        t = count_mutations(qdir, scenario)
        kill_at = rng.randint(1, t)
        result.update(mutations=t, kill_at=kill_at)
        producer: dict = {}

        def produce() -> None:
            producer["p"] = run_victim(qdir, "push", 0, (1000, 15))

        th = threading.Thread(target=produce)
        th.start()
        p = run_victim(qdir, scenario, kill_at)
        result["rc"] = p.returncode
        if p.returncode != -9:
            result["errors"].append(
                f"victim not SIGKILLed (rc={p.returncode}): "
                f"{p.stderr.strip()[-200:]}"
            )
        th.join(timeout=120)
        pp = producer.get("p")
        if pp is None or pp.returncode != 0:
            result["errors"].append(
                "producer died during the race: "
                f"{getattr(pp, 'stderr', '')[-300:]}"
            )
        else:
            acked = [
                int(line.split()[1])
                for line in pp.stdout.splitlines()
                if line.startswith("ACK ")
            ]
            if len(acked) != 15:
                result["errors"].append(
                    f"producer acked {len(acked)}/15"
                )
            spec["must"] = list(spec["must"]) + acked
            spec["allowed"] = list(spec["allowed"]) + acked
        result["errors"].extend(check_invariants(qdir, spec))
    except Exception as exc:  # noqa: BLE001
        result["errors"].append(f"harness: {exc!r}")
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    return result


def run_live_consumer_trial(root: str, scenario: str, seed: int,
                            idx: int) -> dict:
    """Crash-point trial with a LIVE consumer popping throughout the
    victim's death: the reads contend for the flock against the dying
    compactor in real time — every pop either sees the pre-commit
    state, blocks on the flock, or replays the torn manifest (the r17
    read-path tier) the instant the kernel drops the dead victim's
    lock. Invariants: rows taken during the race plus rows drained
    after it equal the must-survive set EXACTLY once, in order."""
    import threading
    import time as _time

    rng = random.Random(f"{seed}:live:{scenario}:{idx}")
    qdir = os.path.join(root, f"live-{scenario}-{idx}")
    os.makedirs(qdir, exist_ok=True)
    spec = build_state(qdir, scenario, rng, keep_open=True)
    q: Queue = spec["consumer"]
    result = {"scenario": f"live_consumer:{scenario}", "trial": idx,
              "errors": []}
    raced: list[int] = []
    stop = threading.Event()

    def race() -> None:
        sub = q.subscriber()
        while not stop.is_set():
            r = sub.try_pop()
            if r is not None:
                raced.append(r[0])
            _time.sleep(0.002)

    th = threading.Thread(target=race)
    try:
        t = count_mutations(qdir, scenario)
        # the racing consumer SHRINKS the victim's work (popped rows
        # turn rewrites into drops), so the real mutation count can
        # fall below the pre-race estimate: bias the sample low and
        # accept a completed victim as a valid (unkilled) trial — the
        # sweep-level assertion requires a minimum kill rate instead
        kill_at = rng.randint(1, max(1, (2 * t) // 3))
        result.update(mutations=t, kill_at=kill_at)
        th.start()
        p = run_victim(qdir, scenario, kill_at)
        result["rc"] = p.returncode
        if p.returncode not in (-9, 0):
            result["errors"].append(
                f"victim failed (rc={p.returncode}): "
                f"{p.stderr.strip()[-200:]}"
            )
    except Exception as exc:  # noqa: BLE001
        result["errors"].append(f"harness: {exc!r}")
    finally:
        stop.set()
        if th.is_alive() or th.ident is not None:
            th.join(timeout=30)
    try:
        for a, b in zip(raced, raced[1:]):
            if b <= a:
                result["errors"].append(
                    f"racing consumer order/dup: {a} then {b}"
                )
                break
        raced_set = set(raced)
        extra = sorted(raced_set - set(spec["allowed"]))
        if extra:
            result["errors"].append(
                f"racing consumer got unexpected rows: {extra[:8]}"
            )
        spec = dict(spec)
        spec["must"] = [i for i in spec["must"] if i not in raced_set]
        spec["already_delivered"] = sorted(raced_set)
        result["raced"] = len(raced)
        result["errors"].extend(check_invariants(qdir, spec))
    except Exception as exc:  # noqa: BLE001
        result["errors"].append(f"harness: {exc!r}")
    finally:
        shutil.rmtree(qdir, ignore_errors=True)
    return result


def sweep(trials: int = 200, seed: int = 1800, jobs: int = 16,
          root: str | None = None) -> dict:
    own_root = root is None
    root = root or tempfile.mkdtemp(prefix="quebic_chaos_")
    work = [
        (SCENARIOS[i % len(SCENARIOS)], i) for i in range(trials)
    ]
    try:
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            results = list(pool.map(
                lambda w: run_trial(root, w[0], seed, w[1]), work
            ))
    finally:
        if own_root:
            shutil.rmtree(root, ignore_errors=True)
    failures = [r for r in results if r["errors"]]
    by_scenario: dict[str, int] = {}
    for r in results:
        by_scenario[r["scenario"]] = by_scenario.get(r["scenario"], 0) + 1
    return {
        "trials": trials,
        "seed": seed,
        "killed": sum(1 for r in results if r.get("rc") == -9),
        "by_scenario": by_scenario,
        "kill_points": sorted(
            {(r["scenario"], r.get("kill_at")) for r in results},
        ).__len__(),
        "failures": failures,
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=1800)
    ap.add_argument("--jobs", type=int, default=16)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    summary = sweep(args.trials, args.seed, args.jobs, args.root)
    print(json.dumps(summary))
    sys.exit(1 if summary["failures"] else 0)


if __name__ == "__main__":
    main()
