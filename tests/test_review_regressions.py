"""Regression tests for the round-1 code-review findings (all were
verified-reproducible bugs before their fixes)."""

import numpy as np
import pytest

from tostore_tpu import (
    DataStoreConfig,
    DataType,
    FieldSchema,
    IndexSchema,
    PrimaryKeyConfig,
    PrimaryKeyType,
    QueryCondition,
    TableSchema,
    ToStoreTPU,
    VectorFieldConfig,
)
from tests.test_engine import users_schema


class TestOrOnlyConditions:
    def test_or_only_delete_does_not_wipe_table(self):
        db = ToStoreTPU.memory(schemas=[users_schema()])
        db.batch_insert("users", [{"username": f"u{i}", "age": i} for i in (1, 2, 3)])
        r = db.delete("users").or_where(lambda c: c.where("age", "=", 1)).execute()
        assert len(r.success_keys) == 1
        assert db.count("users") == 2
        db.close()

    def test_or_only_matches_and_mask_agree(self):
        c = QueryCondition().or_(QueryCondition().where("a", "=", 1))
        assert c.matches({"a": 1}) and not c.matches({"a": 2})
        cols = {"a": np.array([1, 2, 1])}
        assert c.mask(lambda f: cols[f], 3).tolist() == [True, False, True]


class TestGlobalTableAtomicRollback:
    def test_rollback_replays_correctly_after_crash(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema(is_global=True)])
        r = db.batch_insert(
            "users",
            [{"username": "a"}, {"username": "b"}, {"username": "a"}],
            allow_partial=False,
        )
        assert r.is_error and db.count("users") == 0
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("users") == 0  # compensating deletes replayed
        db2.close()


class TestBulkNullHandling:
    def test_bulk_insert_preserves_nulls(self):
        db = ToStoreTPU.memory(schemas=[users_schema()])
        db.batch_insert(
            "users",
            [{"username": "a", "is_active": None, "balance": None},
             {"username": "b", "is_active": True, "balance": 1.5}],
        )
        ra = db.query("users").where("username", "=", "a").first()
        assert ra["is_active"] is None and ra["balance"] is None
        db.close()


class TestShortCodeBurst:
    def test_no_duplicates_under_burst(self):
        schema = TableSchema(
            name="t",
            fields=(FieldSchema("x", DataType.integer),),
            primary_key=PrimaryKeyConfig(type=PrimaryKeyType.shortCode),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        r = db.batch_insert("t", [{"x": i} for i in range(300)])
        assert r.is_success and db.count("t") == 300
        db.close()


class TestKvTransactional:
    def test_kv_set_rolls_back(self):
        db = ToStoreTPU.memory()
        db.kv.set("pre", 1)

        def action(tx):
            db.kv.set("k", 42)
            db.kv.set("pre", 2)
            tx.rollback()

        res = db.transaction(action)
        assert not res.committed
        assert db.kv.get("k") is None
        assert db.kv.get("pre") == 1
        db.close()


class TestGlobalWatch:
    def test_watch_fires_for_global_tables(self):
        db = ToStoreTPU.memory(schemas=[users_schema(is_global=True)])
        events = []
        db.watch("users", callback=events.append)
        db.insert("users", {"username": "a"})
        assert len(events) == 1
        # global KV watch too
        ev2 = []
        db.kv_global.watch_value("gk", callback=ev2.append)
        db.kv_global.set("gk", 7)
        assert len(ev2) == 1
        db.close()


class TestDatetimePrecisionFilters:
    def test_device_filter_distinguishes_close_timestamps(self):
        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("ts", DataType.datetime),
                FieldSchema(
                    "emb", DataType.vector, vector_config=VectorFieldConfig(dimensions=8)
                ),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector"),),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        t1, t2 = 1700000000000, 1700000050000  # 50 s apart: equal as f32
        v = np.eye(8, dtype=np.float32)
        db.insert("docs", {"ts": t1, "emb": v[0].tolist()})
        db.insert("docs", {"ts": t2, "emb": v[1].tolist()})
        res = (
            db.vector_query("docs", "emb", v[0])
            .where("ts", "=", t2)
            .top_k(2)
            .fetch()
        )
        assert [r.primary_key for r in res] == [2]
        # range also exact
        res = (
            db.vector_query("docs", "emb", v[0]).where("ts", "<", t2).top_k(2).fetch()
        )
        assert [r.primary_key for r in res] == [1]
        db.close()


class TestBatchUniqueReservation:
    def test_failed_record_does_not_poison_later_ones(self):
        import dataclasses

        schema = TableSchema(
            name="v",
            fields=(
                FieldSchema("u1", DataType.text, unique=True),
                FieldSchema("u2", DataType.text, unique=True),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        db.insert("v", {"u1": "other", "u2": "takenY"})
        r = db.batch_insert(
            "v",
            [{"u1": "x", "u2": "takenY"},  # fails on u2
             {"u1": "x", "u2": "z"}],      # must succeed
        )
        assert r.is_partial
        assert len(r.success_keys) == 1
        db.close()


class TestRenameTableDurability:
    def test_rename_survives_crash(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.insert("users", {"username": "a"})
        r = db.update_schema("users").rename_table("members").execute()
        assert r.is_success
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("members") == 1
        assert db2.get_schema("users") is None
        db2.close()


class TestMigrationFilterBackfill:
    def test_renamed_field_device_filter_covers_old_rows(self):
        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("score", DataType.integer),
                FieldSchema(
                    "emb", DataType.vector, vector_config=VectorFieldConfig(dimensions=8)
                ),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector"),),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        v = np.eye(8, dtype=np.float32)
        db.insert("docs", {"score": 5, "emb": v[0].tolist()})  # pre-migration row
        db.insert("docs", {"score": 1, "emb": v[1].tolist()})
        db.vector_search("docs", "emb", v[0], top_k=1)  # flush columns
        r = db.update_schema("docs").rename_field("score", "rating").execute()
        assert r.is_success
        # post-migration update touches ONE row; the other must still be
        # visible to the device-compiled filter
        db.update_by_pk("docs", 2, {"rating": 2})
        res = (
            db.vector_query("docs", "emb", v[0]).where("rating", ">", 3).top_k(2).fetch()
        )
        assert [x.primary_key for x in res] == [1]  # pre-migration row found
        db.close()


class TestDeleteSpaceKv:
    def test_kv_usable_after_deleting_active_space(self):
        db = ToStoreTPU.memory()
        db.switch_space("s1")
        db.kv.set("k", 1)
        db.delete_space("s1")
        db.kv.set("k", 2)  # must not raise
        assert db.kv.get("k") == 2
        db.close()
