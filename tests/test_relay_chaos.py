"""Whole-driver streaming-relay chaos tier (VERDICT r18 next #1/#2).

Each victim is an ENTIRE Spark driver running the queue -> transform ->
queue relay (or a DLQ-routing StreamingConsumer), killed by
``os.killpg(SIGKILL)`` at a random gated mutation inside a micro-batch
— Python driver and checkpoint-committing JVM die together, like a
power-off of the driver machine (tools/chaos_relay_victim.py). The
synthetic boundary at foreachBatch-return makes the
"append committed, checkpoint commit never ran" window a first-class
kill point: Spark re-runs that batch on restart and ``queue_sink``'s
commit-marker protocol must no-op it.

Invariants:

* relay: after any number of kills plus one clean restart, the sink
  queue holds every source row EXACTLY once, transformed —
  exactly-once end-to-end, as the module docstring promises. (Global
  seq order across a pre-offset-WAL kill is NOT invariant: the
  restart re-lists and the file source's mtime sort breaks ties
  arbitrarily, regrouping micro-batches — found by this tier's first
  run and documented at read_queue_stream.)
* consumer: durable failure counts never regress across driver
  deaths; terminally the poison row is DLQ-routed and never consumed,
  and every other row reaches the side effect or the DLQ (its
  batch's fate — WHICH rows ride with the poison is not fixed, since
  a restart may regroup not-yet-WALed batches; at-least-once allows
  a row in both places, never in neither).

Victims are expensive (a Spark session each), so the sweep is small
(~10-20 kills, per the adjudicated budget); RELAY_CHAOS_POINTS /
CONSUMER_CHAOS_POINTS override for local iteration.
"""

from __future__ import annotations

import glob
import json
import os
import random
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from quebic_spark import INTEGER, TEXT, Queue, Schema  # noqa: E402

SCHEMA = Schema(INTEGER, TEXT)
VICTIM = os.path.join(REPO, "tools", "chaos_relay_victim.py")
SEED = 1900


def _run_victim(src: str, other: str, ck: str, scenario: str,
                kill_at: int) -> subprocess.CompletedProcess:
    # start_new_session: the victim killpg's its own group — it must
    # not share one with the test runner
    return subprocess.run(
        [sys.executable, VICTIM, src, other, ck, scenario,
         str(kill_at)],
        capture_output=True, text=True, timeout=420,
        start_new_session=True,
    )


def _fill_src(src: str, n: int) -> None:
    q = Queue(src, SCHEMA, capacity=10**6, auto_compact_files=None)
    pub = q.publisher()
    for i in range(n):
        pub.push([i, f"v{i}"])  # one file per row -> several batches
    q._closed = True
    q._storage.close_handles()


def _drain(qdir: str) -> list[tuple]:
    q = Queue(qdir, SCHEMA, auto_compact_files=None)
    sub = q.subscriber()
    got = []
    while True:
        r = sub.try_pop()
        if r is None:
            break
        got.append(r)
    q._closed = True
    q._storage.close_handles()
    return got


def _count_mutations(root: str, scenario: str, n_rows: int) -> int:
    """One clean run on scratch state measures the gated mutation
    count T; all trials start from identical state, so kill points
    sampled in 1..T land inside real micro-batch commits."""
    base = os.path.join(root, f"count-{scenario}")
    src, other, ck = (os.path.join(base, d)
                      for d in ("src", "other", "ck"))
    os.makedirs(base)
    _fill_src(src, n_rows)
    p = _run_victim(src, other, ck, scenario, 0)
    shutil.rmtree(base, ignore_errors=True)
    assert p.returncode == 0, p.stderr[-500:]
    for line in p.stdout.splitlines():
        if line.startswith("MUTATIONS "):
            return int(line.split()[1])
    raise AssertionError(f"no MUTATIONS line: {p.stdout[-200:]}")


def _relay_trial(root: str, idx: int, t: int) -> dict:
    rng = random.Random(f"{SEED}:relay:{idx}")
    base = os.path.join(root, f"relay-{idx}")
    src, dst, ck = (os.path.join(base, d) for d in ("src", "dst", "ck"))
    os.makedirs(base)
    _fill_src(src, 8)
    res = {"trial": idx, "killed": 0, "errors": []}
    try:
        # one or two kill rounds (the second crashes the RESTART —
        # the marker protocol must survive repeated deaths), then a
        # clean restart drains the backlog
        for _ in range(rng.randint(1, 2)):
            kill_at = rng.randint(1, t)
            p = _run_victim(src, dst, ck, "relay", kill_at)
            if p.returncode == -9:
                res["killed"] += 1
            elif "RELAYDONE" in p.stdout:
                break  # a restart replays less work than T covers
            else:
                res["errors"].append(
                    f"victim neither killed nor done "
                    f"(rc={p.returncode}): {p.stderr[-300:]}"
                )
        p = _run_victim(src, dst, ck, "relay", 0)
        if "RELAYDONE" not in p.stdout:
            res["errors"].append(
                f"clean restart failed (rc={p.returncode}): "
                f"{p.stderr[-300:]}"
            )
        got = _drain(dst)
        want = [(i, f"V{i}") for i in range(8)]
        # exactly-once is the invariant: every row once, transformed.
        # GLOBAL seq order is not — a kill landing before the
        # in-flight batch's offset WAL makes the restart re-list, and
        # the file source's mtime sort breaks ties arbitrarily, so
        # same-mtime files can regroup into different micro-batches
        # (each batch is still appended seq-ordered; see
        # read_queue_stream's ordering note)
        if sorted(got) != want:
            res["errors"].append(
                f"sink lost or duplicated rows: {sorted(got)}"
            )
    except Exception as exc:  # noqa: BLE001
        res["errors"].append(f"harness: {exc!r}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return res


def _consumer_trial(root: str, idx: int, t: int) -> dict:
    rng = random.Random(f"{SEED}:consumer:{idx}")
    base = os.path.join(root, f"consumer-{idx}")
    src, ck = os.path.join(base, "src"), os.path.join(base, "ck")
    out = os.path.join(base, "consumed.txt")
    os.makedirs(base)
    _fill_src(src, 6)  # mftt=2 -> batches {0,1} {2,3} {4,5}; 3 poisons
    res = {"trial": idx, "killed": 0, "errors": [],
           "saw_counts": False}
    failures_path = os.path.join(ck, "quebic-failures.json")
    prev: dict[str, int] = {}
    done = False
    try:
        # random-kill attempts first, then GUARANTEED clean runs to
        # the terminal state (mirrors the relay trial's final
        # kill_at=0 — the first suite run under a loaded host showed
        # ten random draws can keep landing kills and never let a
        # drain finish, a harness flake, not an invariant breach; a
        # clean run can still legitimately QUERYFAIL while the poison
        # batch works toward its permit, so allow a few)
        attempts = [rng.randint(1, t + 4) for _ in range(7)] + [0] * 4
        for kill_at in attempts:
            p = _run_victim(src, out, ck, "consumer", kill_at)
            if p.returncode == -9:
                res["killed"] += 1
            elif "CONSUMERDONE" in p.stdout:
                done = True
            elif "QUERYFAIL" not in p.stdout:
                res["errors"].append(
                    f"victim in unknown state (rc={p.returncode}): "
                    f"{p.stderr[-300:]}"
                )
                break
            cur: dict[str, int] = {}
            if os.path.exists(failures_path):
                with open(failures_path) as f:
                    cur = {k: int(v) for k, v in json.load(f).items()}
            if cur:
                res["saw_counts"] = True
            for b, c in prev.items():
                # absent = popped after the DLQ route; present must
                # never have LOST progress across the driver death
                if b in cur and cur[b] < c:
                    res["errors"].append(
                        f"failure count regressed for batch {b}: "
                        f"{c} -> {cur[b]}"
                    )
            prev = cur
            if done:
                break
        if not done:
            res["errors"].append(
                "backlog never drained (incl. 4 clean runs)"
            )
        consumed = set()
        if os.path.exists(out):
            with open(out) as f:
                consumed = {int(x) for x in f.read().split()}
        dlq_ids: set[int] = set()
        import pyarrow.parquet as pq

        for f in glob.glob(os.path.join(src, "dlq", "*.parquet")):
            dlq_ids.update(
                pq.read_table(f, columns=["c0"]).column("c0")
                .to_pylist()
            )
        # grouping-AGNOSTIC invariants (found by this sweep's own
        # first full run: a kill can make the restart re-list and
        # REGROUP the not-yet-WALed batches, so WHICH rows ride with
        # poison id 3 is not fixed — one trial DLQ'd {3,5} and
        # consumed 2). What must hold regardless: the poison row is
        # DLQ'd and never consumed; every other row reaches the side
        # effect or the DLQ (its batch's fate) — no row vanishes. A
        # row may appear in BOTH (consumed in a killed run whose
        # checkpoint never committed, then DLQ'd with a regrouped
        # poison batch) — that is at-least-once, not a violation.
        if 3 not in dlq_ids:
            res["errors"].append(
                f"poison row never DLQ-routed: {sorted(dlq_ids)}"
            )
        if 3 in consumed:
            res["errors"].append("poison row leaked into side effect")
        lost = {0, 1, 2, 4, 5} - (consumed | dlq_ids)
        if lost:
            res["errors"].append(
                f"rows neither consumed nor DLQ-routed: {sorted(lost)}"
            )
    except Exception as exc:  # noqa: BLE001
        res["errors"].append(f"harness: {exc!r}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return res


def test_relay_driver_chaos_exactly_once(tmp_path):
    """SIGKILL the whole relay driver at sampled micro-batch commit
    points (including foreachBatch-return: append committed,
    checkpoint not), restart, drain — the sink must hold every source
    row exactly once, in order. The end-to-end proof of queue_sink's
    commit-marker protocol under real process death."""
    points = int(os.environ.get("RELAY_CHAOS_POINTS", "6"))
    t = _count_mutations(str(tmp_path), "relay", 8)
    assert t > 10, t  # several batches' worth of gated boundaries
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(
            lambda i: _relay_trial(str(tmp_path), i, t),
            range(points),
        ))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    # most victims must actually have died mid-batch — otherwise the
    # sweep proved completions, not crash recovery
    killed = sum(r["killed"] for r in results)
    assert killed >= points // 2, (killed, results)


def test_consumer_driver_chaos_failure_counts_and_dlq(tmp_path):
    """SIGKILL the StreamingConsumer driver around the durable
    failure-count persist and the DLQ route: counts never regress
    across deaths, non-poison rows reach the side effect, the poison
    batch reaches the DLQ."""
    points = int(os.environ.get("CONSUMER_CHAOS_POINTS", "3"))
    t = _count_mutations(str(tmp_path), "consumer", 6)
    assert t >= 2, t
    with ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(
            lambda i: _consumer_trial(str(tmp_path), i, t),
            range(points),
        ))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    assert any(r["saw_counts"] for r in results), results
    assert sum(r["killed"] for r in results) >= 1, results


def test_relay_with_source_compaction_chaos(tmp_path):
    """The full composition in one driver: StreamingConsumer with an
    external checkpoint (exercising the durable registry across
    process deaths), exactly-once queue_sink, and stream-safe source
    compaction every 2 batches. Kill points span sink markers,
    durable appends, pointer flips, and the in-foreachBatch
    compaction; the sink must still hold every row exactly once."""
    points = int(os.environ.get("RELAY_COMPACT_CHAOS_POINTS", "4"))
    t = _count_mutations(str(tmp_path), "relay_compact", 8)
    assert t > 10, t
    rng = random.Random(f"{SEED}:relay_compact")
    results = []

    def trial(idx: int) -> dict:
        base = os.path.join(str(tmp_path), f"rc-{idx}")
        src, dst, ck = (
            os.path.join(base, d) for d in ("src", "dst", "ck")
        )
        os.makedirs(base)
        _fill_src(src, 8)
        res = {"trial": idx, "killed": 0, "errors": []}
        try:
            kill_at = rng.randint(1, t)
            p = _run_victim(src, dst, ck, "relay_compact", kill_at)
            if p.returncode == -9:
                res["killed"] = 1
            elif "RELAYDONE" not in p.stdout:
                res["errors"].append(
                    f"victim neither killed nor done "
                    f"(rc={p.returncode}): {p.stderr[-300:]}"
                )
            p = _run_victim(src, dst, ck, "relay_compact", 0)
            if "RELAYDONE" not in p.stdout:
                res["errors"].append(
                    f"clean restart failed: {p.stderr[-300:]}"
                )
            got = _drain(dst)
            want = [(i, f"V{i}") for i in range(8)]
            if sorted(got) != want:
                res["errors"].append(
                    f"sink lost or duplicated rows: {sorted(got)}"
                )
        except Exception as exc:  # noqa: BLE001
            res["errors"].append(f"harness: {exc!r}")
        finally:
            shutil.rmtree(base, ignore_errors=True)
        return res

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(trial, range(points)))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    assert sum(r["killed"] for r in results) >= 1, results
