"""CrontabManager — background maintenance scheduler.

Reference: core/crontab_manager.dart (global interval scheduler with
idle-stop driving TTL cleanup, txn cleanup, weight decay) +
ttl_cleanup_manager.dart + compaction_manager.dart. Here a single daemon
thread ticks every `crontab_interval_s` and runs due jobs: TTL sweeps,
tombstone compaction, and periodic WAL-size-driven checkpoints.
"""

from __future__ import annotations

import threading
import time


class CrontabManager:
    def __init__(self, db):
        self.db = db
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_ttl = time.monotonic()
        self._last_compact = time.monotonic()

    def start(self):
        if self._thread is not None:
            return
        self._thread = threading.Thread(target=self._run, daemon=True, name="tostore-cron")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None

    def _run(self):
        cfg = self.db.config
        while not self._stop.wait(cfg.crontab_interval_s):
            try:
                now = time.monotonic()
                if now - self._last_ttl >= cfg.ttl_cleanup_interval_s:
                    self._last_ttl = now
                    self.db.run_ttl_cleanup()
                if now - self._last_compact >= 60:
                    self._last_compact = now
                    self.db.run_compaction()
            except Exception:
                pass  # background maintenance must never kill the engine
