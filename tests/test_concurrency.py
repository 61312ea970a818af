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


class TestMixedWorkloadSoak:
    def test_soak_with_background_maintenance(self):
        """Sustained mixed workload (4 writer/reader/txn/vector threads)
        with crontab-class maintenance (TTL, compaction, RCU vector
        maintenance, cache pressure) forced to run concurrently — no
        exceptions, integrity clean, and the vector index serves
        throughout (the production-deployment stability claim)."""
        import threading
        import time as _t

        import numpy as np

        from tostore_tpu import (
            DataStoreConfig, DataType, FieldSchema, IndexSchema,
            TableSchema, ToStoreTPU,
        )
        from tostore_tpu.models.schema import VectorFieldConfig

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("views", DataType.integer, default_value=0),
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=16)),
            ),
            indexes=(
                IndexSchema(fields=("views",), type="btree"),
                IndexSchema(fields=("emb",), type="vector"),
            ),
        )
        db = ToStoreTPU.memory(
            schemas=[schema],
            config=DataStoreConfig(isolation_level="serializable"),
        )
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4000, 16)).astype(np.float32)
        db.batch_insert("docs", [
            {"id": i + 1, "views": i % 50, "emb": x[i].tolist()}
            for i in range(800)
        ])
        db.vector_search("docs", "emb", x[0], top_k=1)  # flush + train
        vi = db.engine._table("docs").vector_indexes["emb"]
        vi.min_train_size = 64

        stop = _t.monotonic() + 8.0
        errors = []
        next_pk = [801]
        pk_lock = threading.Lock()

        def writer(tid):
            r = np.random.default_rng(tid)
            try:
                while _t.monotonic() < stop:
                    with pk_lock:
                        pk = next_pk[0]
                        next_pk[0] += 1
                    if pk - 801 < 3200:
                        db.insert("docs", {
                            "id": pk, "views": int(r.integers(0, 50)),
                            "emb": x[(pk - 1) % 4000].tolist(),
                        })
                    old = int(r.integers(1, 800))
                    db.delete_by_pk("docs", old) if r.random() < 0.2 else \
                        db.update_by_pk("docs", old,
                                        {"views": int(r.integers(0, 50))})
            except Exception as e:  # noqa: BLE001
                errors.append(("writer", repr(e)))

        def searcher(tid):
            r = np.random.default_rng(100 + tid)
            try:
                while _t.monotonic() < stop:
                    q = x[int(r.integers(0, 4000))]
                    db.vector_search("docs", "emb", q, top_k=5)
                    db.query("docs").where(
                        "views", ">=", int(r.integers(0, 50))
                    ).limit(5).fetch()
            except Exception as e:  # noqa: BLE001
                errors.append(("searcher", repr(e)))

        def txn_worker(tid):
            r = np.random.default_rng(200 + tid)
            try:
                while _t.monotonic() < stop:
                    pk = int(r.integers(1, 800))

                    def action(tx, pk=pk):
                        rec = db.get_by_pk("docs", pk)
                        if rec is not None:
                            db.update_by_pk("docs", pk,
                                            {"views": rec["views"] + 1})

                    db.transaction(action)  # conflicts abort cleanly
            except Exception as e:  # noqa: BLE001
                errors.append(("txn", repr(e)))

        def maintenance():
            try:
                while _t.monotonic() < stop:
                    db.engine.run_vector_maintenance()
                    db.engine.run_compaction()
                    db.engine.run_ttl_cleanup()
                    db.engine.run_cache_maintenance()
                    _t.sleep(0.05)
            except Exception as e:  # noqa: BLE001
                errors.append(("maintenance", repr(e)))

        threads = (
            [threading.Thread(target=writer, args=(t,)) for t in range(2)]
            + [threading.Thread(target=searcher, args=(t,)) for t in range(1)]
            + [threading.Thread(target=txn_worker, args=(t,)) for t in range(1)]
            + [threading.Thread(target=maintenance)]
        )
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors[:5]
        assert db.check_integrity()["ok"]
        # the index still serves correct results after the storm
        alive = db.query("docs").where("id", "=", 900).count()
        if alive:
            hit = db.vector_search("docs", "emb", x[899], top_k=1)[0]
            assert hit.primary_key == 900
        db.close()
