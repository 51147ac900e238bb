"""Journal-replay power-loss simulator for the queue durability
protocols (VERDICT r19 next #1).

The crash-point chaos drive (tools/chaos_drive.py) kills processes,
which can never REORDER metadata the way a power loss does: the page
cache dies with the machine, renames revert, unsynced file content
degrades to garbage, and cross-directory metadata persists in any
order the journal allows. The r19 fsync-ordering bug in fsync-mode
compaction (commit 8f33b02) was found by a targeted read-audit for
exactly that reason. This module makes the class empirically
sweepable:

1. **Trace** — run one durability protocol to COMPLETION in-process
   with ``os.replace`` / ``os.remove`` / ``os.fsync`` / ``os.pwrite``
   / ``os.ftruncate`` patched to record an ordered journal of
   durability-relevant operations on paths under the queue root.
   Content written by untraced writers (pyarrow's C-level parquet
   writes, ``_write_all``'s import-time-bound ``os.write``) is
   snapshotted lazily at its first traced touch — the following
   fsync/rename/remove — which folds a kill inside an untraced write
   into the same on-platter state as a kill just before the next
   traced call (the same argument as tools/chaos_victim.py's gate).

2. **Reconstruct** — for a crash point ``c`` (a journal index), build
   candidate on-platter states from the pre-trace snapshot plus
   ``journal[:c]`` under an adversarial persistence model:

   * a metadata op (rename / remove / file creation) is durable iff
     an ``fsync`` of its DIRECTORY follows it before ``c``; volatile
     metadata ops are coin-flipped (an op whose precondition was
     dropped is dropped too — per-entry ordering);
   * file content is durable up to its last ``fsync``; an unsynced
     tail degrades to {made-it-anyway, empty, garbage, truncated
     prefix} for never-synced files and {new, last-synced, torn
     byte-mix} for in-place overwrites (the ctrl-pointer tear model
     from ``set_next_seq``);
   * ``adversarial=True`` builds the single worst case — every
     issued metadata op persisted, every unsynced content garbaged /
     torn — which is exactly the shape of the r19 compaction bug
     (durable manifest authorizing deletion of originals over a
     never-synced staged chunk).

3. **Check** — materialize each candidate into a real directory and
   run the existing chaos-drive invariants (exactly-once delivery of
   the must-survive set, liveness, ``verify()``).

Only ``fsync=True`` (control_sync) protocols are swept: the default
mode documents process-crash consistency only, so power-loss tears
are legitimate there by contract (write_batch's docstring).

Used by tools/powerloss_drive.py (CLI sweep) and tests/test_powerloss.py
(the CI gate, including the 8f33b02 canary: stripping the fsync events
from a recorded journal must make the sweep find the old data-loss
bug mechanically).
"""

from __future__ import annotations

import os
import random
from collections import defaultdict

# journal ops are plain tuples:
#   ("content", path, bytes)   in-place or creating write, bytes = the
#                              file's full content after the op
#   ("replace", src, dst)      atomic rename
#   ("remove", path)           unlink
#   ("fsync_file", path)       content barrier for one file
#   ("fsync_dir", path)        metadata barrier for one directory
#   ("mark", label)            protocol progress marker (e.g. an ack
#                              printed after a push RETURNED) — lets
#                              the checker compute what the caller was
#                              promised as of a crash point


def snapshot_tree(root: str) -> dict[str, bytes]:
    """path -> bytes for every regular file under root (absent root ->
    empty). The pre-trace state is treated as fully durable: the drive
    builds it, and a real deployment's pre-op state has survived
    arbitrarily long."""
    out: dict[str, bytes] = {}
    if not os.path.isdir(root):
        return out
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            p = os.path.join(dirpath, name)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    out[p] = f.read()
    return out


class Tracer:
    """Context manager that records the durability journal of
    everything the current process does under ``root``."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.journal: list[tuple] = []
        self.pre_files: dict[str, bytes] = {}
        self._known: set[str] = set()
        self._real: dict[str, object] = {}

    # -- recording helpers -------------------------------------------------
    def _in_root(self, path: str) -> bool:
        p = os.path.abspath(path)
        return p == self.root or p.startswith(self.root + os.sep)

    def _ensure_known(self, path: str) -> None:
        """Record an implicit creation for a file written by an
        untraced writer (pyarrow, import-time-bound os.write) at its
        first traced touch."""
        p = os.path.abspath(path)
        if p in self._known or not os.path.isfile(p):
            return
        with open(p, "rb") as f:
            self.journal.append(("content", p, f.read()))
        self._known.add(p)

    def _fd_path(self, fd: int) -> str | None:
        try:
            return os.readlink(f"/proc/self/fd/{fd}")
        except OSError:
            return None

    def mark(self, label: str) -> None:
        self.journal.append(("mark", label))

    # -- patching ----------------------------------------------------------
    def __enter__(self) -> "Tracer":
        self.pre_files = snapshot_tree(self.root)
        self._known = set(self.pre_files)
        self._real = {
            "replace": os.replace,
            "remove": os.remove,
            "fsync": os.fsync,
            "pwrite": os.pwrite,
            "ftruncate": os.ftruncate,
        }
        tracer = self

        def replace(src, dst, **kw):
            if tracer._in_root(dst) or tracer._in_root(src):
                src_a, dst_a = os.path.abspath(src), os.path.abspath(dst)
                tracer._ensure_known(src_a)
                tracer.journal.append(("replace", src_a, dst_a))
                tracer._known.discard(src_a)
                tracer._known.add(dst_a)
            return tracer._real["replace"](src, dst, **kw)

        def remove(path, **kw):
            if tracer._in_root(path):
                p = os.path.abspath(path)
                tracer._ensure_known(p)
                tracer.journal.append(("remove", p))
                tracer._known.discard(p)
            return tracer._real["remove"](path, **kw)

        def fsync(fd):
            p = tracer._fd_path(fd)
            r = tracer._real["fsync"](fd)
            if p is not None and tracer._in_root(p):
                if os.path.isdir(p):
                    tracer.journal.append(("fsync_dir", p))
                else:
                    tracer._ensure_known(p)
                    tracer.journal.append(("fsync_file", p))
            return r

        def pwrite(fd, data, offset):
            p = tracer._fd_path(fd)
            r = tracer._real["pwrite"](fd, data, offset)
            if p is not None and tracer._in_root(p):
                with open(p, "rb") as f:
                    tracer.journal.append(("content", p, f.read()))
                tracer._known.add(p)
            return r

        def ftruncate(fd, length):
            p = tracer._fd_path(fd)
            r = tracer._real["ftruncate"](fd, length)
            if p is not None and tracer._in_root(p):
                with open(p, "rb") as f:
                    tracer.journal.append(("content", p, f.read()))
                tracer._known.add(p)
            return r

        os.replace, os.remove, os.fsync = replace, remove, fsync
        os.pwrite, os.ftruncate = pwrite, ftruncate
        return self

    def __exit__(self, *exc) -> None:
        os.replace = self._real["replace"]
        os.remove = self._real["remove"]
        os.fsync = self._real["fsync"]
        os.pwrite = self._real["pwrite"]
        os.ftruncate = self._real["ftruncate"]


def _garbage(rng: random.Random, n: int) -> bytes:
    return bytes(rng.randrange(256) for _ in range(max(n, 1)))


def _torn(rng: random.Random, old: bytes, new: bytes) -> bytes:
    """Unordered byte mix of two in-place versions (the sub-sector
    tear model from set_next_seq's docstring)."""
    n = min(len(old), len(new))
    mixed = bytes(
        old[i] if rng.random() < 0.5 else new[i] for i in range(n)
    )
    tail_src = old if rng.random() < 0.5 else new
    return mixed + tail_src[n:]


class _Inode:
    __slots__ = ("content", "synced", "prev_synced")

    def __init__(self, content: bytes, synced: bool,
                 prev_synced: bytes | None):
        self.content = content
        self.synced = synced
        self.prev_synced = prev_synced


def build_candidate(
    pre_files: dict[str, bytes],
    journal: list[tuple],
    c: int,
    rng: random.Random,
    adversarial: bool = False,
) -> dict[str, bytes]:
    """One on-platter state a power loss at journal index ``c`` could
    leave.

    Persistence model (matching the threat model the queue's own
    fsync-ordering comments assume — ext4/xfs-like):

    * **Metadata is ordered WITHIN a directory, reorderable ACROSS
      directories**: each directory persists a PREFIX of its entry
      operations (creates, rename-links, rename-unlinks, removes),
      cut at a point no earlier than its last ``fsync_dir``.
      ``adversarial=True`` sets every cut to ``c`` (all issued
      metadata persisted); otherwise the cut is drawn per directory.
    * **Files are inodes**: a rename moves the inode, so a durable
      destination link exposes the file even when the SOURCE
      directory's entry never persisted (the bug the first tuple
      model had: it dropped a durable ``fsync_dir``-covered rename
      because the staging dir's create was coin-skipped). A rename's
      link (dst dir) and unlink (src dir) persist under their own
      directories' cuts, so a crash can transiently expose BOTH
      names — recovery's sweeps must tolerate stray sources.
    * **Content is durable up to the inode's last ``fsync_file``**;
      an unsynced tail degrades to {made-it, empty, garbage,
      truncated} for never-synced inodes and {new, last-synced,
      torn byte-mix} for in-place overwrites (the ctrl-pointer tear
      model from ``set_next_seq``). ``adversarial`` always picks
      garbage / torn.
    """
    ops = journal[:c]
    # per-directory metadata cut: ops at index <= cut persist
    dir_op_idx: dict[str, list[int]] = defaultdict(list)
    last_sync: dict[str, int] = {}
    for i, op in enumerate(ops):
        kind = op[0]
        if kind == "fsync_dir":
            last_sync[op[1]] = i
        elif kind == "content":
            dir_op_idx[os.path.dirname(op[1])].append(i)
        elif kind == "remove":
            dir_op_idx[os.path.dirname(op[1])].append(i)
        elif kind == "replace":
            dir_op_idx[os.path.dirname(op[2])].append(i)
            if os.path.dirname(op[1]) != os.path.dirname(op[2]):
                dir_op_idx[os.path.dirname(op[1])].append(i)
    cut: dict[str, int] = {}
    for d in dir_op_idx:
        lo = last_sync.get(d, -1)
        cut[d] = c if adversarial else rng.randint(lo, c)

    def applied(i: int, path: str) -> bool:
        return i <= cut.get(os.path.dirname(path), c)

    names: dict[str, _Inode] = {
        p: _Inode(b, True, b) for p, b in pre_files.items()
    }
    # inodes whose creating entry did not persist but whose data was
    # issued — reachable by a later durable rename
    limbo: dict[str, _Inode] = {}

    def lookup(path: str) -> _Inode | None:
        return names.get(path) or limbo.get(path)

    for i, op in enumerate(ops):
        kind = op[0]
        if kind in ("mark", "fsync_dir"):
            continue
        if kind == "fsync_file":
            ino = lookup(op[1])
            if ino is not None:
                ino.synced = True
                ino.prev_synced = ino.content
        elif kind == "content":
            p, data = op[1], op[2]
            ino = lookup(p)
            if ino is not None:
                # in-place overwrite (ctrl pwrite/ftruncate, rewrite
                # after a swept name): the entry already exists
                ino.content = data
                ino.synced = False
            else:
                ino = _Inode(data, False, None)
                if applied(i, p):
                    names[p] = ino
                else:
                    limbo[p] = ino
        elif kind == "replace":
            src, dst = op[1], op[2]
            ino = lookup(src)
            if ino is None:
                continue  # no data was ever issued under src
            if applied(i, dst):
                names[dst] = ino
                # the unlink half persists under the SOURCE dir's cut
                if applied(i, src):
                    names.pop(src, None)
                limbo.pop(src, None)
            # dst link not persisted: the inode stays where it was
        elif kind == "remove":
            p = op[1]
            if p in names and applied(i, p):
                names.pop(p)
            limbo.pop(p, None)  # an unlinked limbo inode is gone
    # degrade unsynced content on visible inodes (memoized per inode:
    # a rename whose unlink half did not persist exposes ONE inode
    # under two names — both must show the same bytes)
    degraded: dict[int, bytes] = {}
    files: dict[str, bytes] = {}
    for p, ino in names.items():
        if id(ino) in degraded:
            files[p] = degraded[id(ino)]
            continue
        data = ino.content
        if not ino.synced:
            prev = ino.prev_synced
            if adversarial:
                data = (_garbage(rng, len(data)) if prev is None
                        else _torn(rng, prev, data))
            else:
                r = rng.random()
                if prev is None:
                    if r < 0.40:
                        pass  # made it to the platter anyway
                    elif r < 0.60:
                        data = b""
                    elif r < 0.85:
                        data = _garbage(rng, len(data))
                    else:
                        data = data[: rng.randrange(len(data) + 1)]
                else:
                    if r < 0.40:
                        pass
                    elif r < 0.70:
                        data = prev
                    else:
                        data = _torn(rng, prev, data)
        degraded[id(ino)] = data
        files[p] = data
    return files


def materialize(files: dict[str, bytes], src_root: str,
                dst_root: str) -> None:
    """Write a candidate state (keyed by src_root-absolute paths) into
    dst_root. Standard queue skeleton directories are created even
    when empty — directory entries that existed pre-op are durable."""
    src_root = os.path.abspath(src_root)
    os.makedirs(dst_root, exist_ok=True)
    for sub in ("data", "dlq"):
        os.makedirs(os.path.join(dst_root, sub), exist_ok=True)
    for p, data in files.items():
        rel = os.path.relpath(p, src_root)
        out = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "wb") as f:
            f.write(data)


def marks_before(journal: list[tuple], c: int) -> list[str]:
    return [op[1] for op in journal[:c] if op[0] == "mark"]
