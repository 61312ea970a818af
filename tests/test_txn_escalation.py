"""Pessimistic escalation for hot read-modify-write rows: after
`txn_escalate_after` conflicts, transaction(retries=) serializes through
short per-row locks (reference lock_manager.dart:38-44) instead of burning
optimistic retries. Correctness: no lost updates, all transactions commit.
"""

import threading

from tostore_tpu import (
    DataStoreConfig, DataType, FieldSchema, TableSchema, ToStoreTPU,
)


def _db():
    s = TableSchema(name="acct", fields=(FieldSchema("bal", DataType.integer),))
    db = ToStoreTPU.memory(
        schemas=[s],
        config=DataStoreConfig(isolation_level="serializable"),
    )
    db.insert("acct", {"id": 1, "bal": 0})
    return db


def test_hot_rmw_all_commit_with_escalation():
    db = _db()
    threads, per = 6, 25
    results = []
    res_lock = threading.Lock()

    def worker():
        import time as _t

        local = []
        for _ in range(per):
            def action(tx):
                cur = db.get_by_pk("acct", 1)["bal"]
                _t.sleep(0.002)  # slow RMW: the hot_slow bench shape
                db.update_by_pk("acct", 1, {"bal": cur + 1})
                return cur
            r = db.transaction(action, retries=50)
            local.append(r)
        with res_lock:
            results.extend(local)

    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r.committed for r in results), [r.error for r in results if not r.committed][:3]
    assert db.get_by_pk("acct", 1)["bal"] == threads * per  # no lost updates
    c = db.engine._counters
    # under 6-way contention the optimistic path must have escalated
    assert c.get("txn_escalations", 0) > 0
    db.close()


def test_escalation_releases_locks_on_success_and_failure():
    db = _db()

    def bump(tx):
        cur = db.get_by_pk("acct", 1)["bal"]
        db.update_by_pk("acct", 1, {"bal": cur + 1})

    r = db.transaction(bump, retries=5)
    assert r.committed
    # all escalation locks released
    assert all(not lk.locked() for lk in db.engine._hot_locks.values())

    def boom(tx):
        raise ValueError("user error")

    try:
        db.transaction(boom, retries=3)
    except ValueError:
        pass
    assert all(not lk.locked() for lk in db.engine._hot_locks.values())
    db.close()


def test_registry_pruning_keeps_held_locks():
    db = _db()
    eng = db.engine
    import threading as th

    held = eng._hot_locks[("x", 1)] = th.Lock()
    held.acquire()
    for i in range(5000):
        eng._hot_locks[("y", i)] = th.Lock()
    eng._acquire_hot_locks([("z", 1)])[0].release()
    assert ("x", 1) in eng._hot_locks  # held locks survive pruning
    assert len(eng._hot_locks) < 4200
    held.release()
    db.close()
