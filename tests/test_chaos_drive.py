"""Pytest gate for the randomized cross-process crash-point chaos
drive (VERDICT r17 next #1; tools/chaos_drive.py).

Sweeps SIGKILL points inside all nine queue commit protocols
(full compact, stream-safe delete, undiscovered-merge, push/write_batch,
bulk push_all, consume's ack flip, consume's DLQ route, replay_dlq,
and — r19 — the recovery HEALER itself, killed mid-replay over a
fabricated torn post-manifest state)
with real process death at real mutation boundaries, then audits
at-least-once delivery, no-double-delivery, liveness, and verify()
from both an already-open consumer (the r16 torn-window shape) and a
fresh open. 320 points at the committed seed (40 per protocol); CHAOS_TRIALS overrides
for quick local iteration.

First sweep of this drive (r18) found a real defect on day one: a
victim killed between initialize()'s meta and consumer writes left a
queue that opened fine but raised FileNotFoundError on every consume
— fixed by writing meta.json last (storage.py initialize docstring);
test_initialize_crash_window_reopens_fresh pins it cross-process.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.chaos_drive import sweep  # noqa: E402


def test_chaos_sweep_all_commit_protocols_green():
    trials = int(os.environ.get("CHAOS_TRIALS", "320"))
    summary = sweep(trials=trials, seed=1800, jobs=16)
    # every victim must really have died by SIGKILL at a point INSIDE
    # the operation — otherwise the sweep is sampling completions, not
    # crash states, and a green result proves nothing
    assert summary["killed"] == trials, summary
    assert summary["failures"] == [], summary["failures"][:3]


def test_initialize_crash_window_reopens_fresh(tmp_path):
    """A process SIGKILLed during Queue creation — after ctrl/consumer
    land but immediately BEFORE meta.json's atomic rename — must leave
    a directory that the next open treats as NOT yet a queue and
    re-initializes cleanly (r18 chaos-drive finding: with meta written
    first, this state opened fine and then every consume raised
    FileNotFoundError on the missing consumer.json)."""
    qdir = str(tmp_path / "q")
    victim_src = f"""
import os, signal, sys
sys.path.insert(0, {REPO!r})
real_replace = os.replace
def dying_replace(src, dst):
    if dst.endswith("meta.json"):
        os.kill(os.getpid(), signal.SIGKILL)
    return real_replace(src, dst)
os.replace = dying_replace
from quebic_spark import Queue, Schema, INTEGER, TEXT
Queue({qdir!r}, Schema(INTEGER, TEXT), auto_compact_files=None)
"""
    proc = subprocess.run(
        [sys.executable, "-c", victim_src],
        capture_output=True, timeout=60,
    )
    assert proc.returncode == -9, (proc.returncode, proc.stderr[-300:])
    assert not os.path.exists(os.path.join(qdir, "meta.json"))

    from quebic_spark import INTEGER, TEXT, Queue, Schema

    q = Queue(qdir, Schema(INTEGER, TEXT), auto_compact_files=None)
    q.publisher().push([1, "v1"])
    assert q.subscriber().try_pop() == (1, "v1")
    q.verify()
    q.dispose()


def test_bulk_append_chaos_both_orderings(tmp_path):
    """append_dataframe's two commit orderings under the same
    randomized SIGKILL sweep (the one protocol the main rotation
    skips — each victim needs its own Spark session): default
    flip-then-publish must leave a contiguous FIFO PREFIX of the
    batch (never a mid-batch subset), fsync publish-then-flip must be
    all-or-nothing (parts beyond an unflipped pointer stay invisible
    and are swept). Liveness and verify() audited per trial as in the
    main sweep."""
    from concurrent.futures import ThreadPoolExecutor

    from tools.chaos_drive import run_trial

    points = int(os.environ.get("CHAOS_BULK_POINTS", "4"))
    work = [
        (mode, i)
        for mode in ("bulk_append", "bulk_append_fsync")
        for i in range(points)
    ]
    with ThreadPoolExecutor(max_workers=2) as pool:
        results = list(pool.map(
            lambda w: run_trial(str(tmp_path), w[0], 1800, w[1]), work
        ))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    assert all(r.get("rc") == -9 for r in results), results


def test_concurrent_producer_chaos_sweep(tmp_path):
    """Crash points under REAL contention: a live producer process
    pushes against the queue while each compactor victim runs and
    dies at its sampled boundary — the surviving producer's
    write_batch replays the torn commit mid-race instead of after
    it. Every pre-crash row and every producer-acked row must
    deliver exactly once, in order, with verify() clean."""
    from concurrent.futures import ThreadPoolExecutor

    from tools.chaos_drive import run_concurrent_trial

    per = int(os.environ.get("CHAOS_CONCURRENT_POINTS", "6"))
    work = [
        (scen, i)
        for scen in ("full_compact", "stream_safe",
                     "merge_undiscovered")
        for i in range(per)
    ]
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(
            lambda w: run_concurrent_trial(
                str(tmp_path), w[0], 1800, w[1]
            ),
            work,
        ))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    assert all(r.get("rc") == -9 for r in results)


def test_live_consumer_chaos_sweep(tmp_path):
    """Crash points with a LIVE consumer popping throughout the
    victim's death: reads contend for the flock against the dying
    compactor in real time, replaying the torn manifest the instant
    the kernel drops the dead victim's lock. Rows taken during the
    race plus rows drained after it must equal the must-survive set
    exactly once, in order — no loss, no re-delivery of a row the
    racer already took."""
    from concurrent.futures import ThreadPoolExecutor

    from tools.chaos_drive import run_live_consumer_trial

    per = int(os.environ.get("CHAOS_LIVE_POINTS", "6"))
    work = [
        (scen, i)
        for scen in ("full_compact", "stream_safe",
                     "merge_undiscovered")
        for i in range(per)
    ]
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(
            lambda w: run_live_consumer_trial(
                str(tmp_path), w[0], 1800, w[1]
            ),
            work,
        ))
    bad = [r for r in results if r["errors"]]
    assert bad == [], bad[:2]
    # the racing consumer shrinks the victim's work, so a low-biased
    # kill point can still land past the real mutation count — a
    # completed victim is a valid sample, but MOST must really die
    killed = sum(1 for r in results if r.get("rc") == -9)
    assert killed >= len(results) // 2, (killed, len(results))
    # and the race must actually have raced: the live consumer took
    # rows mid-crash across the sweep
    assert sum(r.get("raced", 0) for r in results) > 0
