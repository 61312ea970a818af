"""Concurrency stress test.

Mirrors the reference's concurrency scenario (database_tester.dart:195-210:
100 insert + 100 read + 50 update + 50 delete per table x 2 tables,
concurrently) with real threads against the engine lock, plus a
writer-vs-reader consistency check and conditional watch streams.
"""

import threading

import numpy as np
import pytest

from tostore_tpu import QueryCondition, ToStoreTPU
from tests.test_engine import users_schema


@pytest.fixture
def db():
    d = ToStoreTPU.memory(schemas=[users_schema()])
    yield d
    d.close()


class TestConcurrencyStress:
    def test_mixed_ops_two_tables(self):
        import dataclasses

        s1 = users_schema()
        s2 = dataclasses.replace(users_schema(), name="users2")
        db = ToStoreTPU.memory(schemas=[s1, s2])
        errors = []

        def worker(table, offset):
            try:
                for i in range(100):
                    r = db.insert(table, {"username": f"{table}-{offset}-{i}", "age": i % 90})
                    assert r.is_success, r.message
                for i in range(100):
                    db.query(table).where("age", ">", i % 50).limit(5).fetch()
                pks = [
                    r["id"]
                    for r in db.query(table)
                    .where_like("username", f"{table}-{offset}-%")
                    .limit(100)
                    .fetch()
                ]
                for pk in pks[:50]:
                    db.update_by_pk(table, pk, {"age": 99})
                for pk in pks[50:100]:
                    db.delete_by_pk(table, pk)
            except Exception as e:  # surface failures to the main thread
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(t, w))
            for t in ("users", "users2")
            for w in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        # each table: 2 workers x (100 inserts - 50 deletes) = 100 rows
        assert db.count("users") == 100
        assert db.count("users2") == 100
        assert db.check_integrity()["ok"]
        db.close()

    def test_concurrent_transactions_serialize(self, db):
        results = []

        def tx_worker(n):
            def action(tx):
                cur = db.kv.get("counter", 0)
                db.kv.set("counter", cur + 1)
                return cur

            results.append(db.transaction(action))

        threads = [threading.Thread(target=tx_worker, args=(i,)) for i in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r.committed for r in results)
        # the engine lock serializes: no lost updates
        assert db.kv.get("counter") == 20

    def test_concurrent_unique_inserts_one_winner(self, db):
        outcomes = []

        def worker():
            outcomes.append(db.insert("users", {"username": "highlander"}))

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        wins = [o for o in outcomes if o.is_success]
        assert len(wins) == 1
        assert db.count("users") == 1


class TestConditionalWatch:
    def test_watch_with_condition(self, db):
        events = []
        db.watch(
            "users",
            callback=events.append,
            condition=QueryCondition().where("age", ">=", 18),
        )
        db.insert("users", {"username": "adult", "age": 30})
        db.insert("users", {"username": "minor", "age": 10})
        assert len(events) == 1 and events[0].record["username"] == "adult"


class TestReadAtomicity:
    """Reads take the engine lock: a reader must never observe a record
    mid-update (torn across columns) or mid-transaction (dirty read)."""

    def test_no_torn_records_under_bulk_updates(self):
        from tostore_tpu.models.schema import DataType, FieldSchema, TableSchema

        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("a", DataType.integer),
                FieldSchema("b", DataType.integer),
                FieldSchema("tag", DataType.text),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        n = 50
        db.batch_insert("t", [{"a": 0, "b": 0, "tag": "v0"} for _ in range(n)])
        stop = threading.Event()
        errors = []

        def writer():
            v = 0
            while not stop.is_set():
                v += 1
                for pk in range(1, n + 1):
                    db.update_by_pk("t", pk, {"a": v, "b": -v, "tag": f"v{v}"})

        def reader():
            try:
                while not stop.is_set():
                    pk = int(np.random.randint(1, n + 1))
                    rec = db.get_by_pk("t", pk)
                    # invariant: a == -b and tag == f"v{a}" hold in every
                    # committed state; torn reads break them
                    assert rec["a"] == -rec["b"], rec
                    assert rec["tag"] == f"v{rec['a']}", rec
                    for r in db.query("t").where("a", ">=", 0).limit(10).fetch():
                        assert r["a"] == -r["b"], r
            except Exception as e:  # pragma: no cover
                errors.append(e)

        wt = threading.Thread(target=writer)
        rts = [threading.Thread(target=reader) for _ in range(3)]
        wt.start()
        [t.start() for t in rts]
        import time as _t

        _t.sleep(1.5)
        stop.set()
        wt.join()
        [t.join() for t in rts]
        assert not errors, errors[0]
        db.close()

    def test_no_dirty_reads_during_transaction(self, db):
        # buffered transactions: a concurrent reader does NOT block on an
        # open transaction and sees only committed state — never the
        # uncommitted insert (round-2 design: per-thread write overlay,
        # reference write_buffer_manager.dart)
        db.insert("users", {"username": "base", "age": 1})
        seen = []
        entered = threading.Event()
        release = threading.Event()

        def txn_writer():
            with db.transaction():
                db.insert("users", {"username": "uncommitted", "age": 2})
                entered.set()
                assert release.wait(timeout=5)

        def reader():
            entered.wait(timeout=5)
            seen.append(db.count("users"))  # non-blocking, committed view
            release.set()

        t1 = threading.Thread(target=txn_writer)
        t2 = threading.Thread(target=reader)
        t1.start()
        t2.start()
        t1.join(timeout=5)
        t2.join(timeout=5)
        assert seen == [1]  # reader never observed the uncommitted insert
        assert db.count("users") == 2  # visible after commit

    def test_bad_isolation_level_rejected(self):
        from tostore_tpu.models.config import DataStoreConfig

        with pytest.raises(ValueError):
            ToStoreTPU.memory(config=DataStoreConfig(isolation_level="chaotic"))
