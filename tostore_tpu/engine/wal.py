"""Write-ahead log + checkpointed snapshots.

Durability contract matches the reference (SURVEY.md §2.3): every mutation
is WAL-appended before it is acknowledged; a checkpoint persists a full
consistent snapshot (tables + vector corpora + meta) and truncates the log;
crash recovery = load snapshot + replay the WAL tail, discarding any torn
tail frame (reference wal_manager.dart:608 initializeAndRecover +
parallel_journal_manager.dart:1209-1228 flushAll->advanceCheckpoint).

The reference needs an A/B parallel journal, page redo logs and pending-
batch registries because it mutates thousands of 16 KB pages in place; here
a snapshot is written to a temp file and atomically renamed, so the redo
machinery collapses to "rename is the commit point".
"""

from __future__ import annotations

import os
import threading

from ..utils import codec


class WalWriter:
    """Append-only framed WAL with group-commit flushing.

    `wrap` transforms each payload before framing (encryption envelope,
    reference encoder.dart prefixed formats)."""

    def __init__(self, path: str, sync: bool = False, wrap=None):
        self.path = path
        self.sync = sync
        self.wrap = wrap or (lambda b: b)
        self._lock = threading.Lock()
        self._f = open(path, "ab")
        self.entries_since_checkpoint = 0

    def append(self, entry: dict):
        data = codec.frame(self.wrap(codec.dumps(entry)))
        with self._lock:
            self._f.write(data)
            self._f.flush()
            if self.sync:
                os.fsync(self._f.fileno())
            self.entries_since_checkpoint += 1

    def append_many(self, entries: list[dict]):
        data = b"".join(codec.frame(self.wrap(codec.dumps(e))) for e in entries)
        with self._lock:
            self._f.write(data)
            self._f.flush()
            if self.sync:
                os.fsync(self._f.fileno())
            self.entries_since_checkpoint += len(entries)

    def truncate(self):
        """Checkpoint advanced: start a fresh log."""
        with self._lock:
            self._f.close()
            self._f = open(self.path, "wb")
            self._f.flush()
            os.fsync(self._f.fileno())
            self.entries_since_checkpoint = 0

    def close(self):
        with self._lock:
            try:
                self._f.flush()
                os.fsync(self._f.fileno())
            except (ValueError, OSError):
                pass
            self._f.close()


def read_wal(path: str, unwrap=None) -> list[dict]:
    """Replay: all intact entries; torn tail silently dropped."""
    if not os.path.exists(path):
        return []
    unwrap = unwrap or (lambda b: b)
    with open(path, "rb") as f:
        data = f.read()
    out = []
    for p in codec.iter_frames(data):
        try:
            out.append(codec.loads(unwrap(p)))
        except (ValueError, IndexError):
            break  # undecryptable/corrupt entry: stop at the intact prefix
    return out


def atomic_write(path: str, data: bytes):
    """Write + fsync + rename (the snapshot commit point; reference
    replaceFileAtomic, storage_interface.dart:94)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
