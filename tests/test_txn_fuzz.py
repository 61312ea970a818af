"""Concurrent-transaction fuzz: hammer buffered transactions from many
threads and assert global invariants (the reference validates its write
pipeline with a concurrency stress scenario, database_tester.dart:195-210;
this adds transaction-level oracles on top)."""

import random
import threading

import pytest

from tostore_tpu import ToStoreTPU
from tostore_tpu.models.config import DataStoreConfig
from tostore_tpu.models.results import BusinessError
from tostore_tpu.models.schema import DataType, FieldSchema, TableSchema


def counters_schema():
    return TableSchema(
        name="counters",
        fields=(FieldSchema("val", DataType.integer),),
    )


def accounts_schema():
    return TableSchema(
        name="accounts",
        fields=(
            FieldSchema("owner", DataType.text, unique=True),
            FieldSchema("balance", DataType.integer),
        ),
    )


class TestSerializableFuzz:
    def test_no_lost_updates_read_modify_write(self):
        db = ToStoreTPU.memory(
            schemas=[counters_schema()],
            config=DataStoreConfig(isolation_level="serializable"),
        )
        try:
            n_rows, n_threads, n_txns = 4, 6, 25
            for _ in range(n_rows):
                db.insert("counters", {"val": 0})
            successes = [0] * n_threads

            def worker(tid):
                rng = random.Random(tid)
                for _ in range(n_txns):
                    pk = rng.randrange(n_rows) + 1
                    for _attempt in range(20):  # retry on conflict

                        def action(tx, pk=pk):
                            cur = db.get_by_pk("counters", pk)["val"]
                            db.update_by_pk("counters", pk, {"val": cur + 1})

                        r = db.transaction(action)
                        if r.committed:
                            successes[tid] += 1
                            break

            threads = [
                threading.Thread(target=worker, args=(t,))
                for t in range(n_threads)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            total = sum(
                db.get_by_pk("counters", pk)["val"] for pk in range(1, n_rows + 1)
            )
            # every committed read-modify-write is preserved: serializable
            # validation turns racing increments into retries, never into
            # silently lost updates
            assert total == sum(successes)
            assert total > 0
        finally:
            db.close()

    def test_mixed_ops_unique_invariant(self):
        db = ToStoreTPU.memory(
            schemas=[accounts_schema()],
            config=DataStoreConfig(isolation_level="serializable"),
        )
        try:
            n_threads, n_ops = 6, 40

            def worker(tid):
                rng = random.Random(100 + tid)
                for i in range(n_ops):
                    owner = f"o{rng.randrange(20)}"

                    def action(tx):
                        roll = rng.random()
                        if roll < 0.5:
                            db.insert("accounts", {"owner": owner, "balance": 1})
                        elif roll < 0.8:
                            rec = db.query("accounts").where(
                                "owner", "=", owner
                            ).fetch()
                            if rec:
                                db.update_by_pk(
                                    "accounts", rec[0]["id"],
                                    {"balance": rec[0]["balance"] + 1},
                                )
                        else:
                            rec = db.query("accounts").where(
                                "owner", "=", owner
                            ).fetch()
                            if rec:
                                db.delete_by_pk("accounts", rec[0]["id"])
                        if rng.random() < 0.1:
                            raise BusinessError("random rollback")

                    db.transaction(action)

            threads = [
                threading.Thread(target=worker, args=(t,))
                for t in range(n_threads)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            rows = db.query("accounts").limit(10_000).fetch()
            owners = [r["owner"] for r in rows]
            assert len(owners) == len(set(owners))  # unique constraint held
            report = db.check_integrity()
            assert report["ok"], report
            # no dangling reservations once all txns finished
            assert db.engine._unique_res == {}
            assert db.engine._active_txns == set()
        finally:
            db.close()
