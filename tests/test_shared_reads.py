"""Concurrent relational reads under the engine's SHARED mode.

The big engine lock is a readers-writer lock (reference
lock_manager.dart:38-44 shared/exclusive + workload_scheduler.dart:48-53
concurrent query leases): query()/count()/get_by_pk() take shared mode
and execute in parallel; every mutator holds exclusive, so readers never
see torn rows. These tests prove (a) two queries genuinely overlap,
(b) reader/writer fuzz keeps per-row invariants intact, (c) the lazy
SortedIndex rebuild and query-cache LRU are safe under reader races.
"""

import threading
import time

import numpy as np
import pytest

from tostore_tpu import ToStoreTPU
from tostore_tpu.models.schema import (
    DataType,
    FieldSchema,
    IndexSchema,
    TableSchema,
)


def _schema(name="t"):
    return TableSchema(
        name=name,
        fields=(
            FieldSchema("a", DataType.integer),
            FieldSchema("b", DataType.integer),
            FieldSchema("grp", DataType.integer),
        ),
        indexes=(IndexSchema(fields=("grp",)),),
    )


@pytest.fixture
def db():
    store = ToStoreTPU.memory(schemas=[_schema()])
    store.batch_insert(
        "t",
        [{"id": i, "a": i % 50, "b": 100 - (i % 50), "grp": i % 7}
         for i in range(1, 501)],
    )
    yield store
    store.close()


class TestSharedReads:
    def test_queries_actually_overlap(self, db):
        """Two query() calls must hold shared mode SIMULTANEOUSLY — with
        the old mutex one would wait and the barrier would time out."""
        barrier = threading.Barrier(2, timeout=5)
        from tostore_tpu.query.executor import QueryExecutor

        real = QueryExecutor.execute
        overlapped = []

        def synced(self, *a, **kw):
            barrier.wait()  # both threads must be INSIDE the engine lock
            overlapped.append(True)
            return real(self, *a, **kw)

        QueryExecutor.execute = synced
        try:
            errors = []

            def reader():
                try:
                    db.query("t").where("grp", "=", 3).fetch()
                except Exception as e:  # Barrier timeout -> BrokenBarrier
                    errors.append(e)

            ths = [threading.Thread(target=reader) for _ in range(2)]
            for x in ths:
                x.start()
            for x in ths:
                x.join(10)
            assert not errors, errors
            assert len(overlapped) == 2
        finally:
            QueryExecutor.execute = real

    def test_reader_writer_fuzz_invariant(self, db):
        """Writers keep a+b == 100 per row (single atomic update); readers
        must never observe a torn row through query/get_by_pk/count."""
        stop = time.time() + 4.0
        errors = []

        def writer(seed):
            rng = np.random.default_rng(seed)
            try:
                while time.time() < stop:
                    pk = int(rng.integers(1, 501))
                    a = int(rng.integers(0, 101))
                    db.update("t", {"a": a, "b": 100 - a}).where(
                        "id", "=", pk
                    ).execute()
            except Exception as e:
                errors.append(e)

        def reader(seed):
            rng = np.random.default_rng(seed)
            try:
                while time.time() < stop:
                    mode = int(rng.integers(0, 3))
                    if mode == 0:
                        rows = (
                            db.query("t")
                            .where("grp", "=", int(rng.integers(0, 7)))
                            .no_cache()
                            .fetch()
                        )
                        for r in rows:
                            assert r["a"] + r["b"] == 100, r
                    elif mode == 1:
                        r = db.get_by_pk("t", int(rng.integers(1, 501)))
                        assert r is not None and r["a"] + r["b"] == 100, r
                    else:
                        n = db.query("t").count()
                        assert n == 500
            except Exception as e:
                errors.append(e)

        ths = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
        ths += [threading.Thread(target=reader, args=(10 + i,)) for i in range(4)]
        for x in ths:
            x.start()
        for x in ths:
            x.join(30)
        assert not errors, errors[:3]

    def test_lazy_index_rebuild_under_reader_race(self, db):
        """A write staling the sorted index followed by a burst of
        concurrent indexed queries: exactly-correct results from every
        thread (the rebuild serializes on the per-index build lock)."""
        for round_ in range(5):
            db.insert("t", {"id": 1000 + round_, "a": 1, "b": 99, "grp": 3})
            expected = db.query("t").where("grp", "=", 3).no_cache().count()
            results, errors = [], []

            def reader():
                try:
                    results.append(
                        db.query("t").where("grp", "=", 3).no_cache().count()
                    )
                except Exception as e:
                    errors.append(e)

            ths = [threading.Thread(target=reader) for _ in range(8)]
            for x in ths:
                x.start()
            for x in ths:
                x.join(10)
            assert not errors, errors
            assert results == [expected] * 8

    def test_cache_lru_reader_race(self, db):
        """The same cached query hammered from 8 threads while a writer
        invalidates: the LRU reorder pop/insert pairs must never throw
        and hits must stay generation-consistent."""
        stop = time.time() + 3.0
        errors = []

        def reader():
            try:
                while time.time() < stop:
                    rows = db.query("t").where("grp", "=", 5).fetch()
                    for r in rows:
                        assert r["grp"] == 5
            except Exception as e:
                errors.append(e)

        def writer():
            i = 2000
            try:
                while time.time() < stop:
                    db.insert("t", {"id": i, "a": 1, "b": 99, "grp": 5})
                    i += 1
                    time.sleep(0.01)
            except Exception as e:
                errors.append(e)

        ths = [threading.Thread(target=reader) for _ in range(8)]
        ths.append(threading.Thread(target=writer))
        for x in ths:
            x.start()
        for x in ths:
            x.join(30)
        assert not errors, errors[:3]

    def test_reads_inside_transaction_still_work(self, db):
        """Buffering-txn reads go through the same shared-mode entry
        points (read-set notes are per-thread state)."""
        with db.transaction():
            db.insert("t", {"id": 7000, "a": 7, "b": 93, "grp": 1})
            assert db.get_by_pk("t", 7000)["a"] == 7  # own-overlay read
            n = db.query("t").where("grp", "=", 1).count()
            assert n >= 1
        assert db.get_by_pk("t", 7000) is not None

    def test_read_during_exclusive_write_blocks_until_done(self, db):
        """A reader must not observe the intermediate state of a
        multi-row exclusive mutation (batch_update is atomic)."""
        db.batch_insert(
            "t", [{"id": 8000 + i, "a": 0, "b": 100, "grp": 6} for i in range(50)]
        )
        stop = time.time() + 2.0
        errors = []

        def writer():
            flip = 0
            try:
                while time.time() < stop:
                    flip = 1 - flip
                    db.batch_update(
                        "t",
                        [
                            {"id": 8000 + i, "a": flip, "b": 100 - flip}
                            for i in range(50)
                        ],
                    )
            except Exception as e:
                errors.append(e)

        def reader():
            try:
                while time.time() < stop:
                    rows = (
                        db.query("t").where("grp", "=", 6).no_cache().fetch()
                    )
                    vals = {r["a"] for r in rows if r["id"] >= 8000}
                    assert len(vals) <= 1, vals  # all-or-nothing visibility
            except Exception as e:
                errors.append(e)

        ths = [threading.Thread(target=writer)] + [
            threading.Thread(target=reader) for _ in range(3)
        ]
        for x in ths:
            x.start()
        for x in ths:
            x.join(30)
        assert not errors, errors[:3]
