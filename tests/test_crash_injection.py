"""Power-loss fault injection through the Storage seam.

The reference's crash model is kill-at-any-point (SURVEY.md §5: WAL +
checkpoint pointer + torn-tail discard, wal_manager.dart:608); its own
validation is a manual kill-loop demo (README.md:1533-1537). This suite is
the programmatic version the reference lacks: a Storage backend with a
mutation BUDGET that dies mid-write — torn appends keep a random prefix,
un-fsynced bytes survive only as a random prefix, never-synced files may
vanish — swept over random workloads. Recovery must land on a
PREFIX-CONSISTENT state: exactly some per-operation snapshot (every op
here is a single WAL group frame, so half-applied ops are forbidden), and
under the "commit" fsync policy specifically the LAST completed op (no
committed-durable op may be lost).
"""

import copy

import numpy as np
import pytest

from tostore_tpu import ToStoreTPU
from tostore_tpu.engine.storage import MemoryStorage, _norm

from tests.test_differential import NaiveModel, random_condition, random_value, schema


class InjectedCrash(RuntimeError):
    pass


class _CrashAppender:
    def __init__(self, store, key):
        self._store = store
        self._key = key
        with store._lock:
            store._files.setdefault(key, bytearray())

    def write(self, data: bytes):
        st = self._store
        with st._lock:
            if st.disarmed:
                st._files[self._key].extend(data)
                return
            if st.crashed:
                raise InjectedCrash()
            st.budget -= 1
            if st.budget < 0:
                # torn write: a strict prefix reaches the medium
                cut = int(st.rng.integers(0, max(1, len(data))))
                st._files[self._key].extend(data[:cut])
                st._mark_crashed()
                raise InjectedCrash()
            st._files[self._key].extend(data)

    def flush(self):
        pass

    def fsync(self):
        st = self._store
        with st._lock:
            if st.disarmed:
                return
            if st.crashed:
                raise InjectedCrash()
            st.budget -= 1
            if st.budget < 0:
                st._mark_crashed()
                raise InjectedCrash()
            st._durable[self._key] = bytes(st._files[self._key])

    def close(self):
        pass


class CrashStorage(MemoryStorage):
    """MemoryStorage with a mutation budget and a durability watermark.

    Mutating calls (append, fsync, atomic replace, delete) each spend one
    budget unit; the call that exhausts it "crashes": appends tear at a
    random byte, atomic replaces don't happen (that is their contract),
    and every later mutation raises. `power_loss_image()` then produces
    what a machine would find after power loss at that instant: fsynced
    content intact, un-fsynced appended tails truncated at a random byte,
    never-synced files possibly gone entirely.
    """

    def __init__(self, budget: int, rng):
        super().__init__()
        self._durable: dict[str, bytes] = {}
        self.budget = budget
        self.rng = rng
        self.crashed = False
        self.disarmed = False
        self._at_crash = None

    def _mark_crashed(self):
        self.crashed = True
        self._at_crash = (
            {k: bytes(v) for k, v in self._files.items()},
            dict(self._durable),
        )

    def _spend(self):
        if self.disarmed:
            return False
        if self.crashed:
            raise InjectedCrash()
        self.budget -= 1
        if self.budget < 0:
            self._mark_crashed()
            raise InjectedCrash()
        return True

    def write_atomic(self, path: str, data: bytes) -> None:
        key = _norm(path)
        with self._lock:
            live = self._spend()
            self._files[key] = bytearray(data)
            if live:  # replace-then-fsync: durable at the call
                self._durable[key] = bytes(data)

    def appender(self, path: str) -> _CrashAppender:
        return _CrashAppender(self, _norm(path))

    def delete(self, path: str) -> None:
        key = _norm(path)
        with self._lock:
            self._spend()
            self._files.pop(key, None)
            self._durable.pop(key, None)

    def power_loss_image(self, rng) -> MemoryStorage:
        files, durable = self._at_crash or (
            {k: bytes(v) for k, v in self._files.items()},
            dict(self._durable),
        )
        out = MemoryStorage()
        for key, cur in files.items():
            base = durable.get(key)
            if base is None:
                if rng.random() < 0.5:
                    continue  # never-synced file: gone entirely
                keep = cur[: int(rng.integers(0, len(cur) + 1))]
            elif cur.startswith(base):
                tail = cur[len(base):]
                keep = base + tail[: int(rng.integers(0, len(tail) + 1))]
            else:  # rewritten below the watermark: durable wins
                keep = base
            out._files[key] = bytearray(keep)
        return out


# --------------------------------------------------------------------------
# Workload: every operation is a single atomic WAL group frame
# --------------------------------------------------------------------------

FIELDS = ["a", "b", "s", "flag"]


def _canon(rows):
    out = []
    for r in sorted(rows, key=lambda r: r["id"]):
        b = r.get("b")
        out.append((
            r["id"], r.get("a"),
            None if b is None else round(float(b), 9),
            r.get("s"), r.get("flag"),
        ))
    return tuple(out)


def _model_state(model):
    return _canon(list(model.rows.values()))


def _apply_to_copy(model, kind, payload):
    m = copy.deepcopy(model)
    if kind == "insert":
        m.insert(payload)
    elif kind == "batch_insert":
        for rec in payload:
            m.insert(rec)
    elif kind == "batch_update":
        for rec in payload:
            pk = rec["id"]
            if pk in m.rows:
                m.rows[pk].update({k: v for k, v in rec.items() if k != "id"})
    elif kind == "cond_update":
        m.update(*payload)
    elif kind == "cond_delete":
        m.delete(payload)
    elif kind == "txn":
        for pk, v in payload:
            if pk in m.rows:
                m.rows[pk]["a"] = v
    return m


def _run_db_op(db, kind, payload):
    if kind == "insert":
        assert db.insert("t", dict(payload)).is_success
    elif kind == "batch_insert":
        assert db.batch_insert("t", [dict(r) for r in payload]).is_success
    elif kind == "batch_update":
        assert db.batch_update("t", [dict(r) for r in payload]).is_success
    elif kind == "cond_update":
        cond, updates = payload
        db.update("t", dict(updates)).condition(cond).execute()
    elif kind == "cond_delete":
        db.delete("t").condition(payload).execute()
    elif kind == "txn":
        def action(tx):
            for pk, v in payload:
                db.update_by_pk("t", pk, {"a": v})
        db.transaction(action)


def _random_op(rng, model):
    roll = rng.random()
    if roll < 0.35 or not model.rows:
        return "insert", {f: random_value(rng, f) for f in FIELDS}
    if roll < 0.5:
        return "batch_insert", [
            {f: random_value(rng, f) for f in FIELDS}
            for _ in range(int(rng.integers(1, 6)))
        ]
    if roll < 0.62:
        pks = list(model.rows)
        chosen = [pks[i] for i in rng.choice(
            len(pks), min(len(pks), int(rng.integers(1, 6))), replace=False)]
        f = rng.choice(["a", "b", "flag"]).item()
        return "batch_update", [
            {"id": pk, f: random_value(rng, f)} for pk in chosen]
    if roll < 0.77:
        f = rng.choice(FIELDS).item()
        return "cond_update", (random_condition(rng), {f: random_value(rng, f)})
    if roll < 0.9:
        return "cond_delete", random_condition(rng)
    pks = list(model.rows)
    return "txn", [
        (pks[int(rng.integers(0, len(pks)))], random_value(rng, "a"))
        for _ in range(2)
    ]


@pytest.mark.parametrize("seed", list(range(1, 19)))
@pytest.mark.parametrize("policy", ["commit", "os"])
def test_power_loss_prefix_consistency(seed, policy):
    rng = np.random.default_rng(seed * 7 + (0 if policy == "commit" else 1))
    # "commit" spends ~2 budget units per op (append+fsync), "os" ~1
    budget = int(rng.integers(20, 260 if policy == "commit" else 130))
    st = CrashStorage(budget, rng)
    kw = dict(
        write_batch_size=16,  # frequent checkpoints: budget lands inside them
        persist_recovery_on_commit=(policy == "commit"),
        recovery_flush_policy=policy,
    )

    model = NaiveModel()
    snaps = [_model_state(model)]
    allowed_tail = []  # crash-op post-state (may have hit durable WAL)
    db = None
    try:
        db = ToStoreTPU.open(
            f"/crash/d{seed}", schemas=[schema()], storage=st, **kw)
        db.engine.BULK_UPDATE_MIN_ROWS = 1  # conditional writes: one frame
        for _ in range(120):
            kind, payload = _random_op(rng, model)
            post = _apply_to_copy(model, kind, payload)
            try:
                _run_db_op(db, kind, payload)
            except InjectedCrash:
                allowed_tail = [_model_state(post)]
                break
            if st.crashed:  # engine swallowed the raise mid-op
                allowed_tail = [_model_state(post)]
                break
            model = post
            snaps.append(_model_state(model))
    except InjectedCrash:
        pass  # crash during open machinery: zero-op prefix is valid
    finally:
        if db is not None:
            st.disarmed = True  # post-crash writes go nowhere we look
            db.close()

    if not st.crashed:
        pytest.skip(f"budget {budget} outlived the workload")

    image = st.power_loss_image(rng)
    db2 = ToStoreTPU.open(f"/crash/d{seed}", schemas=[schema()], storage=image)
    try:
        got = _canon(db2.query("t").limit(100_000).no_cache().fetch().records)
        allowed = set(snaps) | set(allowed_tail)
        assert got in allowed, (
            f"recovered state matches no operation prefix "
            f"(seed={seed} policy={policy} budget={budget} "
            f"ops_completed={len(snaps) - 1})"
        )
        if policy == "commit":
            # fsync-per-append: no completed op may be lost
            assert got in {snaps[-1], *allowed_tail}, (
                f"commit policy lost a durable op (seed={seed} "
                f"budget={budget} ops={len(snaps) - 1})"
            )
        assert db2.check_integrity()["ok"]
        # the recovered engine must be fully writable
        assert db2.insert("t", {"a": 1, "b": 1.0, "s": "z", "flag": True}).is_success
    finally:
        db2.close()
