"""Resource monitoring, access weights, integrity checking.

Parity components (SURVEY.md §2.5):
  - ResourceManager (core/resource_manager.dart): memory/disk monitor with
    normal/warning/critical escalation and write blocking at critical
    (reference dsi:1536). Here it watches host RSS/available memory and
    device HBM (when the runtime reports it).
  - WeightManager (core/weight_manager.dart): access-frequency weights
    (0-100 with decay) driving hot/cold reporting and prewarm ordering.
  - IntegrityChecker (core/integrity_checker.dart): structural checks +
    sampled record validation (first/last N rather than full scans).
"""

from __future__ import annotations

import os
import shutil
import time


class ResourceManager:
    """Levels: normal | warning | critical. Critical blocks writes."""

    WARNING_FRACTION = 0.85
    CRITICAL_FRACTION = 0.95

    def __init__(self, db_dir: str | None = None):
        self.db_dir = db_dir
        self._last_check = 0.0
        self._level = "normal"

    @staticmethod
    def memory_info() -> dict:
        total = avail = None
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        total = int(line.split()[1]) * 1024
                    elif line.startswith("MemAvailable:"):
                        avail = int(line.split()[1]) * 1024
        except OSError:
            pass
        return {"total_bytes": total, "available_bytes": avail}

    def device_memory_info(self) -> dict:
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            if stats:
                return {
                    "hbm_in_use": stats.get("bytes_in_use"),
                    "hbm_limit": stats.get("bytes_limit"),
                }
        except Exception:
            pass
        return {}

    def disk_info(self) -> dict:
        if not self.db_dir or not os.path.exists(self.db_dir):
            return {}
        u = shutil.disk_usage(self.db_dir)
        return {"disk_total": u.total, "disk_free": u.free}

    def level(self, max_age_s: float = 2.0) -> str:
        now = time.monotonic()
        if now - self._last_check < max_age_s:
            return self._level
        self._last_check = now
        m = self.memory_info()
        lvl = "normal"
        if m["total_bytes"] and m["available_bytes"] is not None:
            used = 1.0 - m["available_bytes"] / m["total_bytes"]
            if used >= self.CRITICAL_FRACTION:
                lvl = "critical"
            elif used >= self.WARNING_FRACTION:
                lvl = "warning"
        dev = self.device_memory_info()
        if dev.get("hbm_limit") and dev.get("hbm_in_use"):
            frac = dev["hbm_in_use"] / dev["hbm_limit"]
            if frac >= self.CRITICAL_FRACTION:
                lvl = "critical"
            elif frac >= self.WARNING_FRACTION and lvl == "normal":
                lvl = "warning"
        self._level = lvl
        return lvl

    def writes_blocked(self) -> bool:
        return self.level() == "critical"

    def status(self) -> dict:
        return {
            "level": self.level(),
            **self.memory_info(),
            **self.device_memory_info(),
            **self.disk_info(),
        }


class WeightManager:
    """Access-frequency weights 0-100 with periodic decay (reference
    weight_manager.dart:10-50). Sampled: tracks per-(table, pk) hits."""

    MAX_WEIGHT = 100.0
    HIT_BONUS = 4.0
    DECAY = 0.5

    def __init__(self, max_entries: int = 100_000):
        self._w: dict[tuple, float] = {}
        self.max_entries = max_entries

    def record_access(self, table: str, pk):
        key = (table, pk)
        self._w[key] = min(self.MAX_WEIGHT, self._w.get(key, 0.0) + self.HIT_BONUS)
        if len(self._w) > self.max_entries:
            self.decay(evict=True)

    def decay(self, evict: bool = False):
        dead = []
        for k in self._w:
            self._w[k] *= self.DECAY
            if self._w[k] < 1.0:
                dead.append(k)
        if evict or dead:
            for k in dead:
                del self._w[k]

    def weight(self, table: str, pk) -> float:
        return self._w.get((table, pk), 0.0)

    def top_hot(self, table: str, n: int = 100) -> list:
        items = [(pk, w) for (t, pk), w in self._w.items() if t == table]
        items.sort(key=lambda x: -x[1])
        return items[:n]


class IntegrityChecker:
    """Structure + sampled record validation (reference
    integrity_checker.dart:36-40 first/last-N sampling)."""

    def __init__(self, sample_n: int = 32):
        self.sample_n = sample_n

    def check_table(self, table) -> dict:
        from .table import ValidationError

        issues = []
        store = table.store
        # 1. pk map <-> rowid consistency
        for pk, row in store._pk_row.items():
            if not store.valid[row]:
                issues.append(f"pk {pk!r} maps to tombstoned row {row}")
            elif store.pk_col.get(row) != pk:
                issues.append(f"pk {pk!r} row {row} holds {store.pk_col.get(row)!r}")
        # 2. unique maps point at live pks
        for name, m in table.unique_maps.items():
            for key, pk in m.items():
                if pk not in store:
                    issues.append(f"unique map {name!r} key {key!r} -> missing pk {pk!r}")
        # 3. vector corpora pk maps subset of table pks
        for field, vi in table.vector_indexes.items():
            for pk in list(vi.corpus._pk_slot)[: self.sample_n]:
                if pk not in store and pk not in {
                    p for p, v in table._vec_pending.get(field, {}).items()
                }:
                    issues.append(f"vector index {field!r} holds pk {pk!r} not in table")
        # 4. sampled record re-validation
        pks = store.pks()
        sample = pks[: self.sample_n] + pks[-self.sample_n :]
        for pk in sample:
            rec = store.get(pk)
            try:
                table.validate(
                    {k: v for k, v in rec.items()
                     if k in table.schema.field_map},
                    is_insert=False,
                )
            except ValidationError as e:
                issues.append(f"record {pk!r} fails validation: {e}")
        return {
            "table": table.schema.name,
            "records": len(store),
            "issues": issues,
            "ok": not issues,
        }

    def check_database(self, db) -> dict:
        reports = [
            self.check_table(t)
            for (space, name), t in db._tables.items()
            if not name.startswith("_system_")
        ]
        return {"ok": all(r["ok"] for r in reports), "tables": reports}
