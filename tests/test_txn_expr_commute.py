"""Blind all-Expr transaction updates commute (no write-write conflict).

Reference surface: Expr atomic updates (README.md:612-668) + the
transaction manager's first-committer-wins conflict check
(transaction_manager.dart:30-36). Here a buffered update whose values are
ALL Expr instances is a BLIND write: it re-resolves against live state at
commit replay, is exempt from the txn's own write-footprint validation
(commit order is a valid serial order for a txn that never observed the
row), and therefore hot-row increments never abort — while any READ of
the row (get_by_pk/query) keeps full serializable protection.
"""

import threading

import pytest

from tostore_tpu import (
    DataStoreConfig, DataType, Expr, FieldSchema, TableSchema, ToStoreTPU,
)
from tostore_tpu.models.results import BusinessError


def _db(tmp_path=None, **cfg):
    schema = TableSchema(
        name="acct",
        fields=(
            FieldSchema("val", DataType.integer),
            FieldSchema("cap", DataType.integer, max_value=1000),
        ),
    )
    if tmp_path is None:
        db = ToStoreTPU.memory(
            schemas=[schema],
            config=DataStoreConfig(isolation_level="serializable", **cfg),
        )
    else:
        db = ToStoreTPU.open(
            str(tmp_path / "db"),
            schemas=[schema],
            config=DataStoreConfig(isolation_level="serializable", **cfg),
        )
    db.insert("acct", {"id": 1, "val": 0, "cap": 0})
    return db


class TestBlindExprCommutes:
    def test_concurrent_increments_all_commit(self):
        """8 threads x 25 blind increments on ONE row: zero conflicts,
        exact final count."""
        db = _db()
        n_threads, per = 8, 25
        start = threading.Barrier(n_threads)
        failures = []

        def worker():
            start.wait()
            for _ in range(per):
                r = db.transaction(
                    lambda tx: db.update_by_pk(
                        "acct", 1, {"val": Expr.field("val") + 1}
                    )
                )
                if not r.committed:
                    failures.append(r.error)

        ths = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        assert not failures, failures[:3]
        assert db.get_by_pk("acct", 1)["val"] == n_threads * per
        db.close()

    def test_expr_resolves_at_commit_not_op_time(self):
        """A blind Expr buffered while val=0 must apply on top of a
        concurrent direct write (serial order: direct write, then txn)."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()

        def action(tx):
            db.update_by_pk("acct", 1, {"val": Expr.field("val") + 1})
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"val": 100})  # direct, no txn
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert r.committed, r.error
        assert db.get_by_pk("acct", 1)["val"] == 101  # NOT 1 (op-time 0+1)
        db.close()

    def test_read_then_expr_still_conflicts(self):
        """get_by_pk puts the row in the read_set: a concurrent commit on
        it must still abort the txn even though the write is all-Expr."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()

        def action(tx):
            db.get_by_pk("acct", 1)  # read -> read_set
            db.update_by_pk("acct", 1, {"val": Expr.field("val") + 1})
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"val": 50})
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert not r.committed and "conflict" in r.error
        assert db.get_by_pk("acct", 1)["val"] == 50
        db.close()

    def test_mixed_literal_update_still_conflicts(self):
        """{Expr, literal} payloads are not blind: write-write conflicts."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()

        def action(tx):
            db.update_by_pk(
                "acct", 1, {"val": Expr.field("val") + 1, "cap": 5}
            )
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"val": 7})
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert not r.committed and "conflict" in r.error
        db.close()

    def test_later_literal_write_demotes_blind_row(self):
        """Expr then literal on the same pk in one txn: the row leaves the
        commute set, so a concurrent writer conflicts again."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()

        def action(tx):
            db.update_by_pk("acct", 1, {"val": Expr.field("val") + 1})
            db.update_by_pk("acct", 1, {"cap": 9})  # literal -> demote
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"val": 70})
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert not r.committed and "conflict" in r.error
        db.close()

    def test_same_txn_readback_is_coherent_and_protective(self):
        """Read-back after a blind Expr sees the provisional value, and
        restores conflict protection (the read enters the read_set)."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()
        seen = []

        def action(tx):
            db.update_by_pk("acct", 1, {"val": Expr.field("val") + 1})
            seen.append(db.get_by_pk("acct", 1)["val"])  # provisional: 1
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"val": 30})
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert seen == [1]
        # the provisional read-back would be stale (30+1 != 1), so the
        # commit MUST abort — otherwise the txn observed a value that
        # never existed in any serial order
        assert not r.committed and "conflict" in r.error
        assert db.get_by_pk("acct", 1)["val"] == 30
        db.close()

    def test_validation_failure_at_replay_fails_commit(self):
        """max_value is enforced against the REPLAY-time resolution: the
        op-time provisional value passes, but a concurrent write pushes
        the base so the commit-time value violates — the txn must fail
        and roll back, not write 1050."""
        db = _db()
        in_txn = threading.Event()
        wrote = threading.Event()

        def action(tx):
            # provisional: 0 + 100 = 100, well under the cap of 1000
            db.update_by_pk("acct", 1, {"cap": Expr.field("cap") + 100})
            in_txn.set()
            assert wrote.wait(5)

        def interloper():
            assert in_txn.wait(5)
            db.update_by_pk("acct", 1, {"cap": 950})  # replay: 950+100
            wrote.set()

        th = threading.Thread(target=interloper)
        th.start()
        r = db.transaction(action)
        th.join()
        assert not r.committed and "max_value" in r.error
        assert db.get_by_pk("acct", 1)["cap"] == 950  # rolled back
        db.close()

    def test_wal_carries_resolved_values(self, tmp_path):
        """Crash recovery replays the commit-time RESOLVED value."""
        db = _db(tmp_path)
        with db.transaction():
            db.update_by_pk("acct", 1, {"val": Expr.field("val") + 41})
        # simulated kill: no close / checkpoint
        db.engine._crontab and db.engine._crontab.stop()
        del db
        schema = TableSchema(
            name="acct",
            fields=(
                FieldSchema("val", DataType.integer),
                FieldSchema("cap", DataType.integer, max_value=1000),
            ),
        )
        db2 = ToStoreTPU.open(str(tmp_path / "db"), schemas=[schema])
        assert db2.get_by_pk("acct", 1)["val"] == 41
        db2.close()

    def test_two_open_blind_txns_both_commit(self):
        """Two overlapping blind-Expr txns on the same row: both commit,
        increments compose."""
        db = _db()
        b = threading.Barrier(2)
        results = []

        def worker():
            def action(tx):
                db.update_by_pk("acct", 1, {"val": Expr.field("val") + 1})
                b.wait(timeout=5)  # guarantee overlap

            results.append(db.transaction(action))

        ths = [threading.Thread(target=worker) for _ in range(2)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        assert all(r.committed for r in results)
        assert db.get_by_pk("acct", 1)["val"] == 2
        db.close()

    def test_rollback_discards_blind_update(self):
        db = _db()
        with pytest.raises(BusinessError):
            with db.transaction() as tx:
                db.update_by_pk("acct", 1, {"val": Expr.field("val") + 5})
                tx.rollback()
        assert db.get_by_pk("acct", 1)["val"] == 0
        db.close()
