"""Off-lock vector search: concurrent searches overlap, CRUD proceeds.

Matches the reference's shared query locks (lock_manager.dart:38-44) and
concurrent query leases (workload_scheduler.dart:48-53): the engine lock
is released across the device dispatch, with the index pinned in shared
mode (utils/rwlock.py).
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
    VectorFieldConfig,
    VectorIndexConfig,
)
from tostore_tpu.utils.rwlock import RWLock, rw


def _vec_schema(name="docs"):
    return TableSchema(
        name=name,
        fields=(
            FieldSchema("n", DataType.integer),
            FieldSchema(
                "emb", DataType.vector,
                vector_config=VectorFieldConfig(dimensions=8),
            ),
        ),
        indexes=(
            IndexSchema(fields=("emb",), type="vector",
                        vector_config=VectorIndexConfig(index_type="flat")),
        ),
    )


def _plain_schema(name="plain"):
    return TableSchema(
        name=name,
        fields=(FieldSchema("v", DataType.integer),),
    )


@pytest.fixture
def db(tmp_path):
    store = ToStoreTPU.memory(schemas=[_vec_schema(), _plain_schema()])
    rng = np.random.default_rng(0)
    store.batch_insert(
        "docs",
        [
            {"id": i, "n": i, "emb": rng.standard_normal(8).tolist()}
            for i in range(64)
        ],
    )
    # force a flush so the committed index is populated
    store.vector_search("docs", "emb", np.zeros(8, np.float32), top_k=1)
    yield store
    store.close()


class TestRWLock:
    def test_read_reentrant_and_concurrent(self):
        lk = RWLock()
        with lk.read():
            with lk.read():
                pass
        got = []

        def reader(ev_in, ev_out):
            with lk.read():
                ev_in.set()
                ev_out.wait(5)
                got.append(1)

        a_in, a_out = threading.Event(), threading.Event()
        b_in, b_out = threading.Event(), threading.Event()
        ta = threading.Thread(target=reader, args=(a_in, a_out))
        tb = threading.Thread(target=reader, args=(b_in, b_out))
        ta.start(), tb.start()
        # both readers hold the lock at the same time
        assert a_in.wait(5) and b_in.wait(5)
        a_out.set(), b_out.set()
        ta.join(5), tb.join(5)
        assert got == [1, 1]

    def test_writer_excludes_and_prefers(self):
        lk = RWLock()
        order = []
        r_in = threading.Event()
        release_r = threading.Event()

        def reader():
            with lk.read():
                r_in.set()
                release_r.wait(5)
            order.append("r-done")

        def writer():
            with lk.write():
                order.append("w")

        tr = threading.Thread(target=reader)
        tr.start()
        assert r_in.wait(5)
        tw = threading.Thread(target=writer)
        tw.start()
        time.sleep(0.05)
        assert "w" not in order  # writer blocked behind reader
        # a NEW reader must now queue behind the waiting writer
        late = threading.Thread(target=lambda: (lk.acquire_read(), order.append("late"), lk.release_read()))
        late.start()
        time.sleep(0.05)
        assert "late" not in order
        release_r.set()
        tr.join(5), tw.join(5), late.join(5)
        assert order.index("w") < order.index("late")

    def test_write_reentrant_and_read_under_write(self):
        lk = RWLock()
        with lk.write():
            with lk.write():
                with lk.read():
                    pass

    def test_upgrade_raises(self):
        lk = RWLock()
        with lk.read():
            with pytest.raises(RuntimeError):
                lk.acquire_write()


class TestOffLockSearch:
    def test_searches_overlap(self, db):
        """Two engine-level searches must be inside the device dispatch at
        the same time — impossible under the old whole-op engine lock."""
        eng = db.engine
        t = eng._table("docs")
        idx = t.vector_indexes["emb"]
        barrier = threading.Barrier(2, timeout=5)
        real = type(idx).search
        overlapped = []

        def slow_search(self, *a, **kw):
            barrier.wait()  # only passes if BOTH threads are inside
            overlapped.append(True)
            return real(self, *a, **kw)

        type(idx).search = slow_search
        try:
            q = np.zeros(8, np.float32)
            th = [
                threading.Thread(
                    target=lambda: db.vector_search("docs", "emb", q, top_k=3)
                )
                for _ in range(2)
            ]
            for x in th:
                x.start()
            for x in th:
                x.join(10)
        finally:
            type(idx).search = real
        assert len(overlapped) == 2

    def test_crud_proceeds_during_search(self, db):
        """An insert to another table completes while a search is parked
        inside the device dispatch."""
        eng = db.engine
        idx = eng._table("docs").vector_indexes["emb"]
        in_search = threading.Event()
        release = threading.Event()
        real = type(idx).search

        def parked(self, *a, **kw):
            in_search.set()
            release.wait(5)
            return real(self, *a, **kw)

        type(idx).search = parked
        try:
            th = threading.Thread(
                target=lambda: db.vector_search(
                    "docs", "emb", np.zeros(8, np.float32), top_k=3
                )
            )
            th.start()
            assert in_search.wait(5)
            t0 = time.perf_counter()
            db.insert("plain", {"id": 1, "v": 1})
            db.insert("docs", {"id": 1000, "n": 1000, "emb": [0.0] * 8})
            assert db.get_by_pk("plain", 1)["v"] == 1
            assert time.perf_counter() - t0 < 2.0  # did not wait for search
        finally:
            release.set()
            type(idx).search = real
            th.join(10)

    def test_flush_waits_for_inflight_search(self, db):
        """A vector flush on the SAME field blocks until the in-flight
        search releases shared mode (no torn corpus mid-scan)."""
        eng = db.engine
        t = eng._table("docs")
        idx = t.vector_indexes["emb"]
        in_search = threading.Event()
        release = threading.Event()
        real = type(idx).search

        def parked(self, *a, **kw):
            in_search.set()
            release.wait(5)
            return real(self, *a, **kw)

        type(idx).search = parked
        try:
            th = threading.Thread(
                target=lambda: db.vector_search(
                    "docs", "emb", np.zeros(8, np.float32), top_k=3
                )
            )
            th.start()
            assert in_search.wait(5)
            db.insert("docs", {"id": 2000, "n": 2000, "emb": [1.0] * 8})
            flushed = []

            def flush():
                with eng._lock:
                    t.flush_vectors("emb")
                flushed.append(True)

            tf = threading.Thread(target=flush)
            tf.start()
            time.sleep(0.1)
            assert not flushed  # blocked behind the shared holder
            release.set()
            tf.join(5)
            assert flushed
        finally:
            release.set()
            type(idx).search = real
            th.join(10)

    def test_concurrent_search_insert_soak(self, db):
        """8 searcher threads + a writer thread, results always valid."""
        stop = threading.Event()
        errors = []

        def searcher(seed):
            rng = np.random.default_rng(seed)
            try:
                while not stop.is_set():
                    q = rng.standard_normal(8).astype(np.float32)
                    hits = db.vector_search("docs", "emb", q, top_k=5)
                    for h in hits:
                        assert h.primary_key is not None
                        assert np.isfinite(h.distance)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def writer():
            rng = np.random.default_rng(99)
            i = 10_000
            try:
                while not stop.is_set():
                    db.insert(
                        "docs",
                        {"id": i, "n": i, "emb": rng.standard_normal(8).tolist()},
                    )
                    if i % 7 == 0:
                        db.delete_by_pk("docs", i - 3)
                    i += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=searcher, args=(s,)) for s in range(8)]
        threads.append(threading.Thread(target=writer))
        for x in threads:
            x.start()
        time.sleep(2.0)
        stop.set()
        for x in threads:
            x.join(10)
        assert not errors, errors


class TestBoundedStalenessFlush:
    """Searches skip a CONTENDED vector flush (bounded staleness,
    reference async writeChanges) instead of convoying the engine; a
    deferred flush never surfaces committed deletes, and the row/age
    bounds force a blocking flush."""

    def test_deferred_flush_hides_pending_deletes(self, db):
        eng = db.engine
        t = eng._table("docs")
        idx = t.vector_indexes["emb"]
        in_search = threading.Event()
        release = threading.Event()
        real = type(idx).search

        def parked(self, *a, **kw):
            in_search.set()
            release.wait(5)
            return real(self, *a, **kw)

        type(idx).search = parked
        try:
            target = db.vector_search(  # resolves a real pk to delete
                "docs", "emb", np.zeros(8, np.float32), top_k=1
            )[0].primary_key
            th = threading.Thread(
                target=lambda: db.vector_search(
                    "docs", "emb", np.zeros(8, np.float32), top_k=3
                )
            )
            th.start()
            assert in_search.wait(5)
            # committed delete while a search holds shared mode: the next
            # search must NOT block on the flush and must NOT return the
            # deleted row
            db.delete_by_pk("docs", target)
            type(idx).search = real  # only the parked thread stays parked
            t0 = time.perf_counter()
            hits = db.vector_search(
                "docs", "emb", np.zeros(8, np.float32), top_k=5
            )
            took = time.perf_counter() - t0
            assert took < 2.0  # did not wait for the parked reader
            assert all(h.primary_key != target for h in hits)
            assert eng._counters.get("vector_flush_deferred", 0) >= 1
        finally:
            release.set()
            type(idx).search = real
            th.join(10)

    def test_age_bound_forces_flush(self, db, monkeypatch):
        eng = db.engine
        t = eng._table("docs")
        db.insert("docs", {"id": 7777, "n": 7777, "emb": [0.5] * 8})
        # pretend the pending batch is old: the bound must force a
        # blocking flush even under contention
        monkeypatch.setattr(
            type(t), "vec_pending_age", lambda self, f: 99.0
        )
        db.vector_search("docs", "emb", np.zeros(8, np.float32), top_k=1)
        assert t.vec_pending_count("emb") == 0

    def test_uncontended_search_still_flushes_eagerly(self, db):
        t = db.engine._table("docs")
        db.insert("docs", {"id": 8888, "n": 8888, "emb": [0.9] * 8})
        assert t.vec_pending_count("emb") > 0
        hits = db.vector_search(
            "docs", "emb", np.asarray([0.9] * 8, np.float32), top_k=1
        )
        assert hits[0].primary_key == 8888  # fresh row visible
        assert t.vec_pending_count("emb") == 0


class TestBackgroundVectorFlush:
    """run_vector_flush (crontab VECTOR_FLUSH_EVERY_S) drains buffered
    index writes asynchronously — the reference's writeChanges runs on
    its background write scheduler — so write-only workloads settle
    without a search tripping the staleness bounds."""

    def test_drains_pending_without_search(self, db):
        t = db.engine._table("docs")
        db.insert("docs", {"id": 9100, "n": 9100, "emb": [0.1] * 8})
        assert t.vec_pending_count("emb") > 0
        assert db.engine.run_vector_flush() == 1
        assert t.vec_pending_count("emb") == 0
        hits = db.vector_search(
            "docs", "emb", np.asarray([0.1] * 8, np.float32), top_k=1
        )
        assert hits[0].primary_key == 9100

    def test_skips_contended_index(self, db):
        t = db.engine._table("docs")
        idx = t.vector_indexes["emb"]
        db.insert("docs", {"id": 9200, "n": 9200, "emb": [0.2] * 8})
        done = {}

        def hold_shared():  # a foreign reader mid-dispatch
            lk = rw(idx)
            lk.acquire_read()
            try:
                done["n"] = db.engine.run_vector_flush()
            finally:
                lk.release_read()

        th = threading.Thread(target=hold_shared)
        th.start()
        th.join(10)
        assert done["n"] == 0  # contended: deferred to the next tick
        assert t.vec_pending_count("emb") > 0
        assert db.engine.run_vector_flush() == 1  # uncontended: drains

    def test_crontab_drains_within_staleness_window(self, db):
        t = db.engine._table("docs")
        db.insert("docs", {"id": 9300, "n": 9300, "emb": [0.3] * 8})
        assert t.vec_pending_count("emb") > 0
        deadline = time.time() + 10.0
        while time.time() < deadline and t.vec_pending_count("emb"):
            time.sleep(0.2)
        assert t.vec_pending_count("emb") == 0  # drained with NO search
