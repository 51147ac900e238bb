"""Pytest gate for the journal-replay power-loss harness
(VERDICT r19 next #1; tools/powerloss.py + tools/powerloss_drive.py).

The SIGKILL chaos drive (tests/test_chaos_drive.py) proves the commit
protocols survive process death; it cannot reorder metadata the way a
power cut does — the r19 fsync-ordering bug in fsync-mode compaction
(commit 8f33b02) was found by a read-audit precisely because no test
could build an adversarial on-platter state. This gate closes that
class empirically:

* every fsync-mode protocol (per-record push, bulk push_all,
  full compaction, undiscovered-merge, recovery heal, queue_sink's
  durable append) is traced once and swept across crash points ×
  reconstructed platter candidates (adversarial worst case + seeded
  coin-flips) with the chaos-drive invariants green on every one;
* the 8f33b02 CANARY: stripping the r19 fsync events from a recorded
  compaction journal (staged-chunk fsync + data-dir fsyncs — the
  pre-fix ordering) must make the sweep FIND the old data-loss bug —
  proof the harness detects this class mechanically, not just that
  today's code passes it.

POWERLOSS_POINTS overrides the crash-point budget for local
iteration.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import powerloss  # noqa: E402
from tools.powerloss_drive import run_scenario, sweep  # noqa: E402


def _points() -> int:
    return int(os.environ.get("POWERLOSS_POINTS", "16"))


def test_powerloss_sweep_push_family(tmp_path):
    summary = sweep(
        seed=90210, points=_points(), rand_candidates=2,
        scenarios=("push", "push_all"), root=str(tmp_path), trials=2,
    )
    assert summary["total_violations"] == 0, summary
    assert summary["total_candidates"] > 0


def test_powerloss_sweep_compaction_family(tmp_path):
    summary = sweep(
        seed=90210, points=_points(), rand_candidates=2,
        scenarios=("full_compact", "merge_undiscovered", "heal"),
        root=str(tmp_path), trials=2,
    )
    assert summary["total_violations"] == 0, summary
    # the heal scenario's fabricated tears vary per trial; require the
    # sweep actually exercised replay work (not only degenerate draws)
    assert summary["scenarios"]["heal"]["journal_ops"] > 0


def test_powerloss_sweep_consume_family(tmp_path):
    """The fsynced ack-flip and DLQ-route chains: a power loss may
    regress an ack (legal at-least-once redelivery) but never tears
    consumer state into an unusable queue, never loses an un-acked
    row, and never leaves a poison record in NEITHER the log nor the
    DLQ (write_dlq's fsync chain lands before the ack flip)."""
    summary = sweep(
        seed=90210, points=_points(), rand_candidates=2,
        scenarios=("consume", "dlq"), root=str(tmp_path), trials=2,
    )
    assert summary["total_violations"] == 0, summary


def test_powerloss_sweep_stream_safe_and_dlq_replay(tmp_path):
    """stream-safe delete-only compaction (fabricated checkpoint,
    whole-file deletes + ack advance) and replay_dlq's re-commit /
    shrink chain under power loss. The dlq_replay sweep's FIRST run
    found a real bug in then-current code: the capacity-shrink rewrite
    renamed over unsynced remainder bytes, and a persisted rename over
    lost content garbaged the only copy of the un-admitted rows
    (fixed: tmp fsync -> rename -> dlq-dir fsync, pinned by
    test_queue.py::test_fsync_mode_dlq_replay_shrink_power_loss_ordering)."""
    summary = sweep(
        seed=90210, points=_points(), rand_candidates=2,
        scenarios=("stream_safe", "dlq_replay"), root=str(tmp_path),
        trials=2,
    )
    assert summary["total_violations"] == 0, summary


def test_powerloss_sweep_sink_append(spark, tmp_path):
    """queue_sink's durable append + marker protocol under power loss:
    after every reconstructed state the micro-batch is REPLAYED (the
    restart shape) and must land every row exactly once or fail loud —
    never silently lose or duplicate."""
    summary = sweep(
        seed=90210, points=10, rand_candidates=1,
        scenarios=("sink_append",), root=str(tmp_path), trials=1,
    )
    assert summary["total_violations"] == 0, summary


def test_powerloss_canary_catches_r19_compaction_bug(tmp_path):
    """Strip the 8f33b02 fsync chain from a recorded fsync-mode
    compaction journal — no staged-chunk fsync, no data-dir fsyncs —
    and the sweep must find the r19 bug (a torn staged chunk committed
    over the only copy of rows). If this ever goes quiet, the harness
    has lost the power to see the defect class it exists for."""

    def strip_r19_fsyncs(journal):
        out = []
        for op in journal:
            if op[0] == "fsync_file" and ".compact" in op[1]:
                continue
            if op[0] == "fsync_dir" and op[1].endswith(
                os.sep + "data"
            ):
                continue
            out.append(op)
        return out

    r = run_scenario(
        "full_compact", str(tmp_path), 4242, points=_points(),
        rand_candidates=1, trial=0, journal_filter=strip_r19_fsyncs,
    )
    assert r["violations"], (
        "canary went quiet: the pre-8f33b02 ordering produced no "
        f"power-loss violation in {r['candidates']} candidates"
    )


# -- reconstruction-model unit tests ------------------------------------


def test_candidate_durable_rename_exposes_limbo_inode(tmp_path):
    """A rename covered by a destination-directory fsync must expose
    the file even when the SOURCE directory's creating entry never
    persisted (the inode moves; the staging entry is irrelevant) —
    the exact false positive the first tuple-based model produced on
    queue_sink's staging→data publish."""
    root = str(tmp_path)
    src = os.path.join(root, "_staging-x", "part.parquet")
    dst = os.path.join(root, "data", "batch-1-1.parquet")
    journal = [
        ("content", src, b"DATA"),
        ("fsync_file", src),
        ("replace", src, dst),
        ("fsync_dir", os.path.join(root, "data")),
    ]
    for _ in range(32):
        files = powerloss.build_candidate(
            {}, journal, len(journal), random.Random(os.urandom(8)),
        )
        assert files.get(dst) == b"DATA", files


def test_candidate_per_directory_prefix_order(tmp_path):
    """Within one directory, metadata persists as a PREFIX: a later
    applied op implies every earlier op in the same directory (no
    remove-before-rename reorderings inside a dir)."""
    root = str(tmp_path)
    d = os.path.join(root, "data")
    a, b = os.path.join(d, "a"), os.path.join(d, "b")
    pre = {a: b"OLD"}
    journal = [
        ("remove", a),
        ("content", b, b"NEW"),
    ]
    for seed in range(64):
        files = powerloss.build_candidate(
            pre, journal, 2, random.Random(seed)
        )
        if b in files:
            # the create persisted -> the earlier remove must have too
            assert a not in files, files


def test_candidate_unsynced_inplace_overwrite_can_tear(tmp_path):
    """An in-place overwrite (the ctrl-pointer pwrite) without a
    following fsync degrades to old, new, or a torn byte-mix — never
    to garbage of unrelated length (the file existed durably)."""
    root = str(tmp_path)
    p = os.path.join(root, "ctrl.json")
    old, new = b"AAAAAAAA", b"BBBBBBBB"
    pre = {p: old}
    journal = [("content", p, new)]
    seen = set()
    for seed in range(200):
        files = powerloss.build_candidate(
            pre, journal, 1, random.Random(seed)
        )
        data = files[p]
        assert len(data) == 8
        assert all(ch in b"AB" for ch in data), data
        seen.add(data)
    assert old in seen and new in seen and len(seen) > 2, seen


def test_candidate_adversarial_is_deterministic_worst_case(tmp_path):
    """adversarial=True applies every issued metadata op and garbles
    every unsynced content — no coin flips, reproducible given the
    rng seed."""
    root = str(tmp_path)
    tmp = os.path.join(root, "f.tmp")
    final = os.path.join(root, "f")
    journal = [
        ("content", tmp, b"PAYLOAD"),
        ("replace", tmp, final),
    ]
    f1 = powerloss.build_candidate(
        {}, journal, 2, random.Random(7), adversarial=True
    )
    f2 = powerloss.build_candidate(
        {}, journal, 2, random.Random(7), adversarial=True
    )
    assert f1 == f2
    assert final in f1 and f1[final] != b"PAYLOAD"  # garbled content


def test_candidate_fsynced_content_survives_adversary(tmp_path):
    """fsync_file then a dir-fsynced rename: even the adversarial
    candidate keeps the bytes — the durability chain the r19 fix
    installs must be sufficient, not just helpful."""
    root = str(tmp_path)
    tmp = os.path.join(root, "data", "f.tmp")
    final = os.path.join(root, "data", "f")
    journal = [
        ("content", tmp, b"PAYLOAD"),
        ("fsync_file", tmp),
        ("replace", tmp, final),
        ("fsync_dir", os.path.join(root, "data")),
    ]
    files = powerloss.build_candidate(
        {}, journal, 4, random.Random(7), adversarial=True
    )
    assert files.get(final) == b"PAYLOAD", files
