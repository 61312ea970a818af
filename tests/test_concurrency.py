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
