"""Regression tests for the round-1 code-review findings (all were
verified-reproducible bugs before their fixes)."""

import numpy as np
import pytest

from tostore_tpu import (
    Agg,
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


class TestShardedIvfRetrainNoDuplicates:
    """Advisor r1 (high): a batch that crosses min_train_size triggered
    train()->_rebuild_buckets() (placing the new slots) and then
    _append_to_buckets() on the same slots again — every pk appeared twice
    in the bucket table and search returned duplicate neighbors."""

    def test_training_batch_not_double_appended(self, rng):
        from tostore_tpu.parallel.mesh import make_mesh
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        mesh = make_mesh(8, dp=1)
        idx = ShardedIVFIndex(
            16, mesh, metric="l2", num_clusters=8, nprobe=8, min_train_size=64
        )
        x = rng.standard_normal((100, 16)).astype(np.float32)
        idx.upsert(list(range(100)), x)  # crosses min_train_size -> trains
        assert idx.trained
        assert int(idx._bucket_counts.sum()) == 100
        buckets = np.asarray(idx.buckets)
        entries = buckets[buckets >= 0]
        # shard-local positions may repeat across shards; count live entries
        assert len(entries) == 100
        dists, pks = idx.search_arrays(x[0], k=10, nprobe=8)
        found = [p for p in pks[0] if p is not None]
        assert len(found) == len(set(found)), f"duplicate pks: {found}"

    def test_force_retrain_at_growth_not_double_appended(self, rng):
        from tostore_tpu.parallel.mesh import make_mesh
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        mesh = make_mesh(8, dp=1)
        idx = ShardedIVFIndex(
            16, mesh, metric="l2", num_clusters=8, nprobe=8, min_train_size=32
        )
        x = rng.standard_normal((200, 16)).astype(np.float32)
        idx.upsert(list(range(40)), x[:40])  # trains at 40
        idx.upsert(list(range(40, 200)), x[40:])  # 200 >= 4*40 -> force retrain
        assert int(idx._bucket_counts.sum()) == 200
        dists, pks = idx.search_arrays(x[50], k=10, nprobe=8)
        found = [p for p in pks[0] if p is not None]
        assert len(found) == len(set(found)), f"duplicate pks: {found}"


class TestInsertExprResolution:
    """Advisor r1 (medium): insert() validated before resolving Expr, so
    Expr payloads failed coercion on typed fields and stored their repr on
    text fields; Expr default_values were never resolvable at all."""

    def _db(self, extra_fields=(), **field_kw):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("ts", DataType.datetime, **field_kw),
                FieldSchema("note", DataType.text),
                *extra_fields,
            ),
        )
        return ToStoreTPU.memory(schemas=[schema])

    def test_expr_now_on_datetime_insert(self):
        from tostore_tpu.models.expr import Expr

        db = self._db()
        r = db.insert("t", {"ts": Expr.now(), "note": "x"})
        assert r.is_success, r
        rec = db.get_by_pk("t", r.success_keys[0])
        assert isinstance(rec["ts"], int) and rec["ts"] > 1_000_000_000_000
        db.close()

    def test_expr_on_text_not_stored_as_repr(self):
        from tostore_tpu.models.expr import Expr

        db = self._db()
        r = db.insert("t", {"ts": 0, "note": Expr.value("hello")})
        assert r.is_success, r
        rec = db.get_by_pk("t", r.success_keys[0])
        assert rec["note"] == "hello"
        db.close()

    def test_expr_default_value_resolved(self):
        from tostore_tpu.models.expr import Expr

        db = self._db(default_value=Expr.now())
        r = db.insert("t", {"note": "d"})
        assert r.is_success, r
        rec = db.get_by_pk("t", r.success_keys[0])
        assert isinstance(rec["ts"], int) and rec["ts"] > 1_000_000_000_000
        db.close()


class TestMutableCellAliasing:
    """Advisor r1 (medium): records returned by get/read_row aliased the
    stored list/dict cells — mutating a returned record silently mutated
    the column store (bypassing the WAL) and poisoned cached queries."""

    def _db(self):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("tags", DataType.array),
                FieldSchema("meta", DataType.json),
            ),
        )
        return ToStoreTPU.memory(schemas=[schema])

    def test_get_by_pk_copy_on_read(self):
        db = self._db()
        r = db.insert("t", {"tags": ["a"], "meta": {"n": 1}})
        pk = r.success_keys[0]
        rec = db.get_by_pk("t", pk)
        rec["tags"].append("EVIL")
        rec["meta"]["n"] = 99
        fresh = db.get_by_pk("t", pk)
        assert fresh["tags"] == ["a"] and fresh["meta"] == {"n": 1}
        db.close()

    def test_query_cache_not_poisoned(self):
        db = self._db()
        db.insert("t", {"tags": ["a"], "meta": {}})
        first = db.query("t").fetch().records
        first[0]["tags"].append("EVIL")
        again = db.query("t").fetch().records  # cache hit
        assert again[0]["tags"] == ["a"]
        db.close()

    def test_insert_payload_mutation_does_not_drift_store(self):
        db = self._db()
        payload = {"tags": ["a"], "meta": {"n": 1}}
        pk = db.insert("t", payload).success_keys[0]
        payload["tags"].append("EVIL")
        assert db.get_by_pk("t", pk)["tags"] == ["a"]
        db.close()


class TestMigrationUniqueCollision:
    """Advisor r1 (low): adding a unique constraint over duplicate existing
    values silently succeeded with a last-write-wins unique map."""

    def test_duplicate_values_fail_migration(self):
        schema = TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[schema])
        db.insert("t", {"v": 7})
        db.insert("t", {"v": 7})
        new = TableSchema(
            name="t", fields=(FieldSchema("v", DataType.integer, unique=True),)
        )
        r = db.engine.update_schema("t", new)
        assert not r.is_success and "unique" in (r.message or "").lower()
        # table untouched: old schema still allows another duplicate
        assert db.insert("t", {"v": 7}).is_success
        db.close()

    def test_distinct_values_migrate_and_enforce(self):
        schema = TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[schema])
        db.insert("t", {"v": 1})
        db.insert("t", {"v": 2})
        new = TableSchema(
            name="t", fields=(FieldSchema("v", DataType.integer, unique=True),)
        )
        assert db.engine.update_schema("t", new).is_success
        assert not db.insert("t", {"v": 1}).is_success
        db.close()


class TestKdfSalt:
    """Advisor r1 (low): constant KDF salt + 10k iterations. New databases
    must use a random per-database salt persisted in the manifest."""

    def test_new_db_has_random_salt_and_reopens(self, tmp_path):
        import json as _json

        from tostore_tpu.models.config import DataStoreConfig, EncryptionConfig

        cfg = DataStoreConfig(
            encryption=EncryptionConfig(
                enable_encoding=True, encryption_key="sekrit",
            )
        )
        db = ToStoreTPU.open(str(tmp_path), config=cfg)
        db.kv.set("k", 42)
        db.close()
        with open(tmp_path / "default" / "manifest.json") as f:
            extras = _json.load(f)["extras"]
        assert len(bytes.fromhex(extras["kdf_salt"])) == 16
        assert extras["kdf_iters"] >= 600_000
        db2 = ToStoreTPU.open(str(tmp_path), config=cfg)
        assert db2.kv.get("k") == 42
        db2.close()

    def test_two_dbs_different_salts(self, tmp_path):
        import json as _json

        from tostore_tpu.models.config import DataStoreConfig, EncryptionConfig

        salts = []
        for name in ("a", "b"):
            cfg = DataStoreConfig(
                encryption=EncryptionConfig(enable_encoding=True, encryption_key="pw")
            )
            db = ToStoreTPU.open(str(tmp_path / name), config=cfg)
            db.close()
            with open(tmp_path / name / "default" / "manifest.json") as f:
                salts.append(_json.load(f)["extras"]["kdf_salt"])
        assert salts[0] != salts[1]


class TestRound3ReviewFindings:
    """Round-3 self-review fixes."""

    def test_like_on_numeric_indexed_column(self):
        # finding 1: the LIKE-prefix arm must not fire on non-text columns
        # (the memcomparable text tag never matches int-encoded keys ->
        # false-empty indexScan)
        from tostore_tpu import ToStoreTPU, DataType, FieldSchema, IndexSchema, TableSchema

        schema = TableSchema(
            name="t",
            fields=(FieldSchema("num", DataType.integer),),
            indexes=(IndexSchema(fields=("num",), type="btree"),),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            db.batch_insert("t", [{"num": 120 + i} for i in range(5)])
            db.batch_insert("t", [{"num": 900 + i} for i in range(5)])
            rows = db.query("t").where("num", "like", "12%").fetch().records
            assert len(rows) == 5
            assert all(str(r["num"]).startswith("12") for r in rows)
        finally:
            db.close()

    def test_sharded_compact_preserves_defer_retrain(self, rng):
        # finding 3: inline compact() re-runs __init__, which reset the
        # engine-ownership flag and silently disabled background maintenance
        from tostore_tpu.parallel import make_mesh
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        mesh = make_mesh(8, dp=2)
        idx = ShardedIVFIndex(16, mesh, metric="l2", num_clusters=8,
                              min_train_size=100)
        idx.defer_retrain = True
        x = rng.standard_normal((500, 16)).astype(np.float32)
        idx.upsert(list(range(500)), x)
        idx.delete(list(range(100)))
        idx.compact()
        assert idx.defer_retrain

    def test_batch_upsert_blocked_under_critical(self):
        # finding 4: the fast path bypassed the writes_blocked guard
        import unittest.mock as mock

        from tostore_tpu import ToStoreTPU, DataType, FieldSchema, TableSchema

        schema = TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            with mock.patch.object(db.engine.resources, "writes_blocked",
                                   return_value=True):
                r = db.batch_upsert("t", [{"id": 1, "v": 1}])
            assert r.is_error and "blocked" in r.message
            assert db.count("t") == 0
        finally:
            db.close()

    def test_aggregate_queries_do_not_pollute_weights(self):
        # finding 6: agg results carry no pk; (table, None) phantom weights
        from tostore_tpu import ToStoreTPU, DataType, FieldSchema, TableSchema

        schema = TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            db.batch_insert("t", [{"v": i} for i in range(10)])
            db.engine.weights._w.clear()
            assert db.query("t").sum("v") == 45
            assert ("t", None) not in db.engine.weights._w
        finally:
            db.close()

    def test_live_watch_coalesces_batch_writes(self):
        # finding 5: one re-query per store generation, not per event
        import unittest.mock as mock

        from tostore_tpu import ToStoreTPU, DataType, FieldSchema, TableSchema

        schema = TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            calls = []
            db.query("t").where("v", ">=", 0).watch(calls.append)
            db.batch_insert("t", [{"v": i} for i in range(50)])  # one generation
            assert len(calls) == 1
            assert len(calls[0]) == 50
        finally:
            db.close()

    def test_sharded_search_distance_parity_after_host_conversion(self, rng):
        # finding 7: host-side scores_to_distances must match the device fn
        from tostore_tpu.parallel import make_mesh
        from tostore_tpu.parallel.sharded import ShardedFlatIndex

        mesh = make_mesh(8, dp=2)
        idx = ShardedFlatIndex(16, mesh, metric="l2")
        x = rng.standard_normal((300, 16)).astype(np.float32)
        idx.upsert(list(range(300)), x)
        d, pks = idx.search_arrays(x[42], k=1)
        assert pks[0][0] == 42 and abs(float(d[0][0])) < 1e-2


class TestRound4SelfReviewFindings:
    """Mid-round-4 self-review findings; each test reproduced its bug
    before the fix."""

    def _indexed_schema(self):
        return TableSchema(
            name="t",
            fields=(FieldSchema("v", DataType.integer),),
            indexes=(IndexSchema(fields=("v",)),),
        )

    def test_sorted_index_fresh_after_clear_generation_catchup(self):
        # invalidate() left _gen at the old build generation; clear()
        # resets store.generation to 0, so once mutations climbed back to
        # exactly that value _ensure served the STALE base order
        db = ToStoreTPU.memory(schemas=[self._indexed_schema()])
        try:
            t = db.engine._table("t")
            for i in range(6):
                db.insert("t", {"v": i})
            assert db.query("t").where("v", ">=", 0).count() == 6  # builds
            build_gen = t.store.generation
            db.clear("t")
            n = 0
            while t.store.generation < build_gen:  # walk gen back up
                db.insert("t", {"v": 100 + n})
                n += 1
            assert t.store.generation == build_gen  # the pre-fix trap
            got = db.query("t").where("v", ">=", 100).no_cache().fetch()
            assert sorted(r["v"] for r in got.records) == [100 + j for j in range(n)]
        finally:
            db.close()

    def test_ordered_slice_merges_delta_log_rows(self):
        # the ordered-slice fast path pages span_rows WITHOUT re-sorting;
        # pending delta-log adds were concatenated at the end, so a fresh
        # row whose key sorts early vanished from the first page
        db = ToStoreTPU.memory(schemas=[self._indexed_schema()])
        try:
            db.batch_insert("t", [{"v": v} for v in range(0, 200, 2)])
            q = db.query("t").where("v", ">", 150).order_by("v").limit(3)
            assert [r["v"] for r in q.fetch().records] == [152, 154, 156]
            db.insert("t", {"v": 151})  # single write -> delta log entry
            page = (
                db.query("t").where("v", ">", 150).order_by("v").limit(3)
                .no_cache().fetch().records
            )
            assert [r["v"] for r in page] == [151, 152, 154]
            # later page unaffected and still in key order
            page2 = (
                db.query("t").where("v", ">", 150).order_by("v")
                .offset(3).limit(3).no_cache().fetch().records
            )
            assert [r["v"] for r in page2] == [156, 158, 160]
        finally:
            db.close()

    def test_deferred_flush_rechecks_stale_filter_columns(self):
        # a deferred vector flush leaves device filter columns stale for
        # rows with buffered filter-field updates: the slot mask matched
        # the OLD value, surfacing rows that violate the live condition
        import threading

        from tostore_tpu.models.schema import (
            VectorFieldConfig, VectorIndexConfig,
        )

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("n", DataType.integer),
                FieldSchema(
                    "emb", DataType.vector,
                    vector_config=VectorFieldConfig(dimensions=8),
                ),
            ),
            indexes=(
                IndexSchema(
                    fields=("emb",), type="vector",
                    vector_config=VectorIndexConfig(index_type="flat"),
                ),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            rng = np.random.default_rng(3)
            db.batch_insert(
                "docs",
                [{"id": i, "n": i, "emb": rng.standard_normal(8).tolist()}
                 for i in range(32)],
            )
            target_emb = np.asarray(
                db.get_by_pk("docs", 5)["emb"], np.float32
            )
            db.vector_search("docs", "emb", target_emb, top_k=1)  # flush
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
            th = threading.Thread(
                target=lambda: db.vector_search(
                    "docs", "emb", target_emb, top_k=1
                )
            )
            th.start()
            try:
                assert in_search.wait(5)
                type(idx).search = real
                # filter-field update buffers while the reader is parked
                db.update_by_pk("docs", 5, {"n": 999})
                cond = QueryCondition().where("n", "<", 10)
                hits = db.vector_search(
                    "docs", "emb", target_emb, top_k=3, condition=cond
                )
                assert eng._counters.get("vector_flush_deferred", 0) >= 1
                assert all(h.primary_key != 5 for h in hits)
                assert all(
                    db.get_by_pk("docs", h.primary_key)["n"] < 10
                    for h in hits
                )
            finally:
                release.set()
                type(idx).search = real
                th.join(10)
        finally:
            db.close()

    def test_memory_alias_forwards_storage(self):
        # open(":memory:", storage=...) silently DROPPED the injected
        # backend before the fix
        from tostore_tpu.engine.storage import MemoryStorage

        st = MemoryStorage()
        db = ToStoreTPU.open(":memory:", schemas=[users_schema()], storage=st)
        try:
            assert db.engine._storage is st
        finally:
            db.close()


class TestConditionalUpdateColumnarRoute:
    """Large literal conditional updates route through the columnar
    batch_update machinery (one coerce pass, one WAL frame)."""

    def _schema(self):
        return TableSchema(
            name="t",
            fields=(
                FieldSchema("a", DataType.integer),
                FieldSchema("s", DataType.text),
                FieldSchema("u", DataType.integer, unique=True),
            ),
            indexes=(IndexSchema(fields=("a",)),),
        )

    def test_routed_update_durable_and_watched(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        db.batch_insert("t", [
            {"id": i, "a": i % 4, "s": "x", "u": i} for i in range(400)
        ])
        events = []
        db.query("t").where("a", "=", 1).watch(lambda recs: events.append(len(recs)))
        r = db.update("t", {"s": "big"}).where("a", "=", 1).execute()
        assert r.is_success and len(r.success_keys) == 100
        assert db.query("t").where("s", "=", "big").count() == 100
        assert events == [100]  # ONE coalesced live-watch emission
        # crash before checkpoint: WAL frame must replay
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        assert db2.query("t").where("s", "=", "big").count() == 100
        assert db2.get_by_pk("t", 1)["s"] == "big"
        assert db2.get_by_pk("t", 2)["s"] == "x"
        db2.close()

    def test_expr_and_unique_updates_keep_per_row_semantics(self):
        db = ToStoreTPU.memory(schemas=[self._schema()])
        try:
            db.batch_insert("t", [
                {"id": i, "a": i % 2, "s": "x", "u": i} for i in range(200)
            ])
            from tostore_tpu import Expr

            r = db.update("t", {"a": Expr.field("a") + 10}).where(
                "a", "=", 1
            ).execute()
            assert len(r.success_keys) == 100
            assert db.query("t").where("a", "=", 11).count() == 100
            # unique column update declines the columnar path but applies
            r2 = db.update("t", {"u": Expr.field("u") + 1000}).where(
                "a", "=", 0
            ).execute()
            assert len(r2.success_keys) == 100
            assert db.get_by_pk("t", 0)["u"] == 1000
        finally:
            db.close()


class TestConditionalDeleteColumnarRoute:
    """Large conditional deletes run columnar (one store patch, one WAL
    frame); FK-referenced tables and transactions keep per-row
    semantics."""

    def test_bulk_delete_durable_unique_released(self, tmp_path):
        s = TableSchema(
            name="t",
            fields=(
                FieldSchema("a", DataType.integer),
                FieldSchema("u", DataType.integer, unique=True),
            ),
            indexes=(IndexSchema(fields=("a",)),),
        )
        db = ToStoreTPU.open(str(tmp_path), schemas=[s])
        db.batch_insert("t", [{"id": i, "a": i % 3, "u": i} for i in range(300)])
        events = []
        db.watch("t", callback=lambda ev: events.append(ev.record["u"]))
        r = db.delete("t").where("a", "=", 1).execute()
        assert len(r.success_keys) == 100
        assert len(events) == 100 and events[0] is not None
        # unique slots released: reinsert the same u values
        assert db.insert("t", {"id": 9001, "a": 9, "u": 1}).is_success
        # crash: the batch_delete WAL frame must replay
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[s])
        assert db2.count("t") == 201
        assert db2.query("t").where("a", "=", 1).count() == 0
        assert db2.get_by_pk("t", 9001)["u"] == 1
        db2.close()

    def test_fk_referenced_table_keeps_cascades(self):
        from tostore_tpu.models.schema import (
            ForeignKeyAction, ForeignKeySchema,
        )

        parent = TableSchema(
            name="p", fields=(FieldSchema("a", DataType.integer),),
        )
        child = TableSchema(
            name="c",
            fields=(FieldSchema("pid", DataType.integer),),
            foreign_keys=(
                ForeignKeySchema(field="pid", references_table="p",
                                 on_delete=ForeignKeyAction.cascade),
            ),
        )
        db = ToStoreTPU.memory(schemas=[parent, child])
        try:
            db.batch_insert("p", [{"id": i, "a": i % 2} for i in range(200)])
            db.batch_insert("c", [{"id": i, "pid": i % 200} for i in range(200)])
            r = db.delete("p").where("a", "=", 0).execute()
            assert len(r.success_keys) == 100
            # cascade removed the children of every deleted parent
            assert db.query("c").count() == 100
            assert all(
                rec["pid"] % 2 == 1 for rec in db.query("c").limit(500).fetch()
            )
        finally:
            db.close()

    def test_bulk_delete_tombstones_vectors(self):
        from tostore_tpu.models.schema import (
            VectorFieldConfig, VectorIndexConfig,
        )

        s = TableSchema(
            name="docs",
            fields=(
                FieldSchema("n", DataType.integer),
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=8)),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector",
                                 vector_config=VectorIndexConfig(index_type="flat")),),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("docs", [
                {"id": i, "n": i, "emb": [float(i)] * 8} for i in range(128)
            ])
            db.vector_search("docs", "emb", np.zeros(8, np.float32), top_k=1)
            r = db.delete("docs").where("n", "<", 100).execute()
            assert len(r.success_keys) == 100
            hits = db.vector_search(
                "docs", "emb", np.zeros(8, np.float32), top_k=20
            )
            assert all(h.primary_key >= 100 for h in hits)
        finally:
            db.close()


class TestRound4LateReviewFindings:
    """Second self-review over the late-round diff (joins, cursors,
    distinct/aggregate vectorization, bulk write routes)."""

    def test_suffix_index_never_serves_order(self):
        # index (a, b) must NOT serve order_by('a'): the slice orders ties
        # by b, not the pk — cursor walks then drop rows entirely
        s = TableSchema(
            name="t",
            fields=(FieldSchema("a", DataType.integer),
                    FieldSchema("b", DataType.integer)),
            indexes=(IndexSchema(fields=("a", "b")),),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            for b in (9, 1, 5):
                db.insert("t", {"a": 1, "b": b})
            r = db.query("t").order_by("a").limit(1).no_cache().fetch()
            walk = [x["id"] for x in r.records]
            while r.has_more:
                r = r.next()
                walk += [x["id"] for x in r.records]
            assert walk == [1, 2, 3]  # pk tie order, nothing skipped
            # with a condition: the ordered flag must not be granted either
            r2 = db.query("t").where("a", "=", 1).order_by("a").limit(1) \
                .no_cache().fetch()
            walk2 = [x["id"] for x in r2.records]
            while r2.has_more:
                r2 = r2.next()
                walk2 += [x["id"] for x in r2.records]
            assert walk2 == [1, 2, 3]
            # exact composite (eq prefix + order field) still serves sorted
            info = db.query("t").where("a", "=", 1).order_by("b").limit(2) \
                .explain()
            assert info["ordered"] is True
        finally:
            db.close()

    def test_bulk_delete_duplicate_pks_single_free(self):
        # a duplicate pk in a bulk delete must not double-free the rowid
        # (two later inserts would share one physical row)
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.engine.BULK_UPDATE_MIN_ROWS = 1
            db.batch_insert("t", [{"a": i} for i in range(10)])
            r = db.engine.delete("t", pks=[1, 2, 2, 3])
            assert r.success_keys == [1, 2, 3]  # per-row route parity
            for v in (100, 101, 102):
                db.insert("t", {"a": v})
            rows = {x["id"]: x["a"]
                    for x in db.query("t").no_cache().fetch().records}
            assert len(rows) == 10
            assert {100, 101, 102} <= set(rows.values())
        finally:
            db.close()

    def test_conditional_update_ignores_pk_in_payload(self):
        # {pk: ..., field: ...} payload: the pk key must not override the
        # row selector on the columnar route (per-row route ignores it)
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.engine.BULK_UPDATE_MIN_ROWS = 1
            db.batch_insert("t", [{"a": i} for i in range(6)])
            r = db.engine.update(
                "t", {"id": 999, "a": 77},
                condition=QueryCondition().where("a", "<", 3))
            assert r.success_keys == [1, 2, 3]
            rows = {x["id"]: x["a"]
                    for x in db.query("t").no_cache().fetch().records}
            assert rows == {1: 77, 2: 77, 3: 77, 4: 3, 5: 4, 6: 5}
        finally:
            db.close()

    def test_backward_cursor_has_more_short_before_set(self):
        # before-cursor count < limit with limit >= total: has_more must
        # still report rows at/after the cursor (record-path semantics)
        from tostore_tpu.query.executor import _encode_cursor

        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [{"a": i} for i in range(5)])
            tok = _encode_cursor([2], 3)
            exe = db.engine.executor
            out = []
            for disable_fast in (False, True):
                q = db.query("t").order_by("a").limit(10).no_cache()
                q._spec.cursor = tok
                q._spec.cursor_backward = True
                if disable_fast:
                    real = type(exe)._after_cursor_mask
                    type(exe)._after_cursor_mask = (
                        lambda self, *a, **kw: None)
                    try:
                        r = q.fetch()
                    finally:
                        type(exe)._after_cursor_mask = real
                else:
                    r = q.fetch()
                out.append(([x["id"] for x in r.records], r.has_more))
            assert out[0] == out[1]
            assert out[0][1] is True  # pks 3..5 sit at/after the cursor
        finally:
            db.close()

    def test_distinct_object_order_pk_tie_break(self):
        # distinct with object (text) order fields: tied groups order by
        # their representative's pk, matching the record path
        s = TableSchema(
            name="t",
            fields=(FieldSchema("name", DataType.text),
                    FieldSchema("tag", DataType.text)),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [
                {"name": "x", "tag": "b"},   # pk 1
                {"name": "x", "tag": "a"},   # pk 2
                {"name": "w", "tag": "c"},   # pk 3
                {"name": "x", "tag": "b"},   # pk 4 (dup combo of pk 1)
            ])
            exe = db.engine.executor

            def run(disable):
                q = (db.query("t").select("name", "tag").order_by("name")
                     .limit(10).no_cache().distinct())
                if disable:
                    real = type(exe)._distinct_rows
                    type(exe)._distinct_rows = lambda self, *a, **kw: None
                    try:
                        return q.fetch()
                    finally:
                        type(exe)._distinct_rows = real
                return q.fetch()

            fast, slow = run(False), run(True)
            assert fast.records == slow.records
            assert fast.records == [
                {"name": "w", "tag": "c"},
                {"name": "x", "tag": "b"},  # rep pk 1 beats ("x","a") pk 2
                {"name": "x", "tag": "a"},
            ]
        finally:
            db.close()

    def test_distinct_json_column_unhashable(self):
        # json cells are unhashable: distinct must not crash and must
        # dedup on str(value), the record path's identity
        s = TableSchema(
            name="t",
            fields=(FieldSchema("j", DataType.json),
                    FieldSchema("s", DataType.text)),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [
                {"j": {"x": i % 2}, "s": f"g{i % 3}"} for i in range(12)
            ])
            fast = (db.query("t").select("j").order_by("s").limit(20)
                    .no_cache().distinct().fetch())
            exe = db.engine.executor
            real = type(exe)._distinct_rows
            type(exe)._distinct_rows = lambda self, *a, **kw: None
            try:
                slow = (db.query("t").select("j").order_by("s").limit(20)
                        .no_cache().distinct().fetch())
            finally:
                type(exe)._distinct_rows = real
            assert fast.records == slow.records
            assert fast.total == slow.total == 2
        finally:
            db.close()

    def test_int_sum_overflow_exact(self):
        # sums that would wrap int64 fall back to the record path's
        # arbitrary-precision accumulation
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            big = 2**62
            db.batch_insert("t", [{"a": big} for _ in range(4)])
            assert db.query("t").no_cache().sum("a") == 4 * big
            db2 = ToStoreTPU.memory(schemas=[s])
            db2.batch_insert("t", [{"a": -big}, {"a": -big}, {"a": -big}])
            assert db2.query("t").no_cache().sum("a") == -3 * big
            db2.close()
        finally:
            db.close()


class TestDescTextOrdering:
    """DESC text order_by vectorizes via np.unique rank codes; finding
    it exposed a record-fallback bug where numpy scalars from column
    views stringified in _sort_key (np.int64 is not an int)."""

    @staticmethod
    def _run(db, descs, disable, limit=300):
        exe = db.engine.executor
        q = db.query("t").limit(limit).no_cache()
        for f, d in descs:
            q = q.order_by(f, desc=d)
        if disable:
            real = type(exe)._lex_keys
            type(exe)._lex_keys = lambda self, *a, **kw: None
            try:
                return q.fetch()
            finally:
                type(exe)._lex_keys = real
        return q.fetch()

    def _db(self):
        import random
        s = TableSchema(name="t", fields=(
            FieldSchema("name", DataType.text),
            FieldSchema("v", DataType.integer),
            FieldSchema("flag", DataType.boolean)))
        db = ToStoreTPU.memory(schemas=[s])
        rng = random.Random(7)
        words = ["", "a", "ab", "abc", "b", "zz", "Ω", "é", None]
        db.batch_insert("t", [
            {"name": rng.choice(words), "v": rng.randint(0, 500),
             "flag": rng.random() < 0.5} for _ in range(3000)
        ])
        return db

    def test_desc_text_matches_record_fallback(self):
        db = self._db()
        try:
            for descs in ([("name", True)], [("name", True), ("v", False)],
                          [("v", True), ("name", True)],
                          [("flag", True), ("name", True)],
                          [("name", False), ("v", True)],
                          [("name", True), ("flag", False)]):
                fast = self._run(db, descs, False)
                slow = self._run(db, descs, True)
                assert fast.records == slow.records, descs
        finally:
            db.close()

    def test_desc_text_matches_python_oracle(self):
        # name DESC (nulls last), v ASC, pk ASC — exact tuple oracle over
        # materialized records, independent of both engine sort paths
        import functools
        db = self._db()
        try:
            allr = db.query("t").limit(3000).no_cache().fetch().records

            def cmp(a, b):
                ar = (0 if a["name"] is None else 1, a["name"] or "")
                br = (0 if b["name"] is None else 1, b["name"] or "")
                if ar != br:
                    return -1 if ar > br else 1  # desc
                if a["v"] != b["v"]:
                    return -1 if a["v"] < b["v"] else 1
                return -1 if a["id"] < b["id"] else 1

            oracle = sorted(allr, key=functools.cmp_to_key(cmp))
            got = self._run(db, [("name", True), ("v", False)], False)
            assert got.records == oracle[:300]
        finally:
            db.close()

    def test_desc_text_cursor_walk_complete(self):
        db = self._db()
        try:
            r = (db.query("t").order_by("name", desc=True).order_by("v")
                 .limit(37).no_cache().fetch())
            walk = [x["id"] for x in r.records]
            while r.has_more:
                r = r.next()
                walk += [x["id"] for x in r.records]
            assert sorted(walk) == list(range(1, 3001))
        finally:
            db.close()

    def test_record_fallback_numpy_scalar_sort_key(self):
        # pre-fix, the rowid Python-sort fallback ranked np.int64 tie
        # fields as strings: v=1004 sorted before v=13. Force the
        # fallback (no _lex_keys) and check numeric tie order.
        s = TableSchema(name="t", fields=(
            FieldSchema("name", DataType.text),
            FieldSchema("v", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [
                {"name": "x", "v": 13}, {"name": "x", "v": 1004},
                {"name": "x", "v": 2}, {"name": None, "v": 5}])
            slow = self._run(db, [("name", True), ("v", False)], True,
                             limit=10)
            assert [r["v"] for r in slow.records] == [2, 13, 1004, 5]
        finally:
            db.close()


class TestJoinAggregateFastPath:
    """Vectorized join+aggregate: expand rowid pairs, group + reduce on
    column arrays (executor._aggregate_pairs)."""

    def _db(self):
        import random
        users = TableSchema(name="users", fields=(
            FieldSchema("region", DataType.text),
            FieldSchema("score", DataType.integer)))
        orders = TableSchema(name="orders", fields=(
            FieldSchema("user_id", DataType.integer),
            FieldSchema("amount", DataType.double),
            FieldSchema("status", DataType.text)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        rng = random.Random(11)
        db.batch_insert("users", [
            {"region": rng.choice(["na", "eu", None]),
             "score": rng.randint(0, 9)} for _ in range(400)])
        db.batch_insert("orders", [
            {"user_id": rng.randint(1, 500) if rng.random() > 0.05 else None,
             "amount": (round(rng.uniform(1, 100), 2)
                        if rng.random() > 0.1 else None),
             "status": rng.choice(["open", "done"])} for _ in range(2500)])
        return db

    @staticmethod
    def _both(db, build):
        exe = db.engine.executor
        taken = {"n": 0}
        real = type(exe)._aggregate_pairs

        def spy(self, *a, **kw):
            r = real(self, *a, **kw)
            if r is not None:
                taken["n"] += 1
            return r

        type(exe)._aggregate_pairs = spy
        try:
            fast = build().fetch()
        finally:
            type(exe)._aggregate_pairs = real
        type(exe)._aggregate_pairs = lambda self, *a, **kw: None
        try:
            slow = build().fetch()
        finally:
            type(exe)._aggregate_pairs = real
        return fast, slow, taken["n"]

    @staticmethod
    def _close(a, b):
        import math
        if isinstance(a, float) and isinstance(b, float):
            return math.isclose(a, b, rel_tol=1e-9)
        return a == b

    def _assert_parity(self, fast, slow, expect_taken, taken):
        assert taken == expect_taken
        assert fast.total == slow.total
        assert len(fast.records) == len(slow.records)
        for x, y in zip(fast.records, slow.records):
            assert x.keys() == y.keys()
            for k in x:
                assert self._close(x[k], y[k]), (k, x, y)

    def test_shapes_match_record_path(self):
        db = self._db()
        try:
            cases = [
                (1, lambda k: (db.query("users")
                               .join("orders", "id", "user_id", kind=k)
                               .group_by("region")
                               .aggregate(Agg.count(), Agg.sum("amount"),
                                          Agg.avg("amount"), Agg.max("score"))
                               .no_cache())),
                (1, lambda k: (db.query("users")
                               .join("orders", "id", "user_id", kind=k)
                               .group_by("status")
                               .aggregate(Agg.count("amount"),
                                          Agg.min("amount")).no_cache())),
                (1, lambda k: (db.query("users")
                               .join("orders", "id", "user_id", kind=k)
                               .group_by("region", "orders.status")
                               .aggregate(Agg.count(), Agg.sum("score"))
                               .no_cache())),
                (1, lambda k: (db.query("users")
                               .join("orders", "id", "user_id", kind=k)
                               .aggregate(Agg.count(), Agg.sum("amount"))
                               .no_cache())),
                (1, lambda k: (db.query("users").where("score", ">", 3)
                               .join("orders", "id", "user_id", kind=k)
                               .group_by("region").aggregate(Agg.count())
                               .having("count", ">", 2)
                               .order_by("count", desc=True).limit(3)
                               .no_cache())),
                # base pk as group key: must bail (record merge keeps the
                # base pk even when the right table has a same-named field)
                (0, lambda k: (db.query("users")
                               .join("orders", "id", "user_id", kind=k)
                               .group_by("id").aggregate(Agg.count())
                               .no_cache())),
            ]
            for expect_taken, case in cases:
                for kind in ("inner", "left"):
                    fast, slow, taken = self._both(db, lambda: case(kind))
                    self._assert_parity(fast, slow, expect_taken, taken)
        finally:
            db.close()

    def test_left_join_unmatched_nulls(self):
        users = TableSchema(name="users", fields=(
            FieldSchema("region", DataType.text),))
        orders = TableSchema(name="orders", fields=(
            FieldSchema("user_id", DataType.integer),
            FieldSchema("amount", DataType.double)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        try:
            db.batch_insert("users", [{"region": "na"}, {"region": "eu"}])
            db.batch_insert("orders", [{"user_id": 1, "amount": 5.0}])
            fast, slow, taken = self._both(
                db, lambda: (db.query("users")
                             .join("orders", "id", "user_id", kind="left")
                             .group_by("region")
                             .aggregate(Agg.count(), Agg.count("amount"),
                                        Agg.sum("amount")).no_cache()))
            self._assert_parity(fast, slow, 1, taken)
            by_region = {r["region"]: r for r in fast.records}
            # eu is unmatched: the pair still counts, right fields are null
            assert by_region["eu"]["count"] == 1
            assert by_region["eu"]["count_amount"] == 0
            assert by_region["eu"]["sum_amount"] is None
            # grouping BY a right field: unmatched rows group under null
            fast2, slow2, taken2 = self._both(
                db, lambda: (db.query("users")
                             .join("orders", "id", "user_id", kind="left")
                             .group_by("amount").aggregate(Agg.count())
                             .no_cache()))
            self._assert_parity(fast2, slow2, 1, taken2)
            assert {r["amount"] for r in fast2.records} == {5.0, None}
        finally:
            db.close()

    def test_count_star_counts_rows(self):
        # Agg.count("*") is the count-all spelling, not a field lookup
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [{"a": i} for i in range(7)])
            r = db.query("t").aggregate(Agg.count("*")).no_cache().fetch()
            assert r.records == [{"count": 7}]
        finally:
            db.close()


class TestJoinOrderByJoinedField:
    """_join_rows serves ordering on joined-in fields via pair-resolved
    lexsort keys (previously a full record-path materialization)."""

    def _db(self):
        import random
        users = TableSchema(name="users", fields=(
            FieldSchema("region", DataType.text),
            FieldSchema("score", DataType.integer)))
        orders = TableSchema(name="orders", fields=(
            FieldSchema("user_id", DataType.integer),
            FieldSchema("amount", DataType.double),
            FieldSchema("status", DataType.text)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        rng = random.Random(5)
        db.batch_insert("users", [
            {"region": rng.choice(["na", "eu", None]),
             "score": rng.randint(0, 9)} for _ in range(300)])
        db.batch_insert("orders", [
            {"user_id": rng.randint(1, 360) if rng.random() > 0.05 else None,
             "amount": (round(rng.uniform(1, 50), 1)
                        if rng.random() > 0.1 else None),
             "status": rng.choice(["open", "done", None])}
            for _ in range(2000)])
        return db

    def test_matches_record_path(self):
        db = self._db()
        exe = db.engine.executor
        real = type(exe)._join_rows
        taken = {"n": 0}

        def spy(self, *a, **kw):
            r = real(self, *a, **kw)
            if r is not None:
                taken["n"] += 1
            return r

        cases = [
            lambda k: (db.query("users").join("orders", "id", "user_id",
                                              kind=k)
                       .order_by("amount").limit(25).no_cache()),
            lambda k: (db.query("users").join("orders", "id", "user_id",
                                              kind=k)
                       .order_by("amount", desc=True).limit(25).offset(7)
                       .no_cache()),
            lambda k: (db.query("users").join("orders", "id", "user_id",
                                              kind=k)
                       .order_by("status").order_by("score", desc=True)
                       .limit(40).no_cache()),
            lambda k: (db.query("users").join("orders", "id", "user_id",
                                              kind=k)
                       .order_by("orders.status", desc=True)
                       .order_by("amount").limit(30).no_cache()),
            lambda k: (db.query("users").join("orders", "id", "user_id",
                                              kind=k)
                       .order_by("id", desc=True).limit(25).no_cache()),
        ]
        try:
            for ci, case in enumerate(cases):
                for kind in ("inner", "left"):
                    taken["n"] = 0
                    type(exe)._join_rows = spy
                    try:
                        fast = case(kind).fetch()
                    finally:
                        type(exe)._join_rows = real
                    assert taken["n"] == 1, (ci, kind)
                    type(exe)._join_rows = lambda self, *a, **kw: None
                    try:
                        slow = case(kind).fetch()
                    finally:
                        type(exe)._join_rows = real
                    assert fast.records == slow.records, (ci, kind)
                    assert fast.total == slow.total
                    assert fast.has_more == slow.has_more
        finally:
            type(exe)._join_rows = real
            db.close()


class TestJoinRouteReviewFindings:
    """Self-review findings over the r4 join-route diff (both verified
    failing pre-fix)."""

    def test_left_join_empty_right_table(self):
        # empty right table: rclip indexes a zero-length column —
        # pre-fix IndexError on order_by/group_by/aggregate over a
        # right-side field
        users = TableSchema(name="users", fields=(
            FieldSchema("region", DataType.text),))
        orders = TableSchema(name="orders", fields=(
            FieldSchema("user_id", DataType.integer),
            FieldSchema("amount", DataType.double)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        try:
            db.batch_insert("users", [{"region": "na"}, {"region": "eu"}])
            r = (db.query("users").join("orders", "id", "user_id",
                                        kind="left")
                 .order_by("amount").limit(10).no_cache().fetch())
            assert len(r.records) == 2
            assert all(x.get("amount") is None for x in r.records)
            g = (db.query("users").join("orders", "id", "user_id",
                                        kind="left")
                 .group_by("amount")
                 .aggregate(Agg.count(), Agg.sum("amount"))
                 .no_cache().fetch())
            assert g.records == [{"amount": None, "count": 2,
                                  "sum_amount": None}]
        finally:
            db.close()

    def test_qualified_name_beats_shadowing_base_column(self):
        # a base column literally named "r.w": the record merge assigns
        # qualified keys from the RIGHT side unconditionally, so the
        # fast paths must resolve "r.w" right-first
        left = TableSchema(name="l", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("r.w", DataType.integer)))
        right = TableSchema(name="r", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("w", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[left, right])
        try:
            db.batch_insert("l", [{"k": 1, "r.w": 100}, {"k": 2, "r.w": 200}])
            db.batch_insert("r", [{"k": 1, "w": 5}, {"k": 2, "w": 1}])
            exe = db.engine.executor

            def run(build, disable):
                if disable:
                    rj = type(exe)._join_rows
                    ra = type(exe)._aggregate_pairs
                    type(exe)._join_rows = lambda self, *a, **kw: None
                    type(exe)._aggregate_pairs = (
                        lambda self, *a, **kw: None)
                    try:
                        return build().fetch()
                    finally:
                        type(exe)._join_rows = rj
                        type(exe)._aggregate_pairs = ra
                return build().fetch()

            build_o = lambda: (db.query("l").join("r", "k", "k")
                               .order_by("r.w").limit(10).no_cache())
            fast, slow = run(build_o, False), run(build_o, True)
            assert fast.records == slow.records
            assert [x["k"] for x in fast.records] == [2, 1]  # right w order
            build_g = lambda: (db.query("l").join("r", "k", "k")
                               .group_by("r.w").aggregate(Agg.count())
                               .no_cache())
            fast, slow = run(build_g, False), run(build_g, True)
            assert fast.records == slow.records
            assert {x["r.w"] for x in fast.records} == {5, 1}
        finally:
            db.close()


class TestRightJoinFastPath:
    """Right joins on the vectorized path: matched pairs + unmatched
    right tail, record-identical ordering (incl. the null-group
    canonical-value fix: tail rows read clipped row 0, not the store's
    zero fill, so null rows must carry one canonical value key)."""

    def test_right_join_tail_orders_within_null_group(self):
        users = TableSchema(name="l", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("kf", DataType.double)))
        orders = TableSchema(name="r", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("w", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        try:
            # base row 0 has kf=2.0: the clipped tail reads it as the
            # residual value under its null mask
            db.batch_insert("l", [{"k": 1, "kf": 2.0},
                                  {"k": 2, "kf": None},
                                  {"k": 3, "kf": None}])
            db.batch_insert("r", [{"k": 2, "w": 6}, {"k": 3, "w": 7},
                                  {"k": None, "w": 5},  # unmatched tail
                                  {"k": 9, "w": 4}])    # unmatched tail
            exe = db.engine.executor
            rj = type(exe)._join_rows

            def run(disable):
                q = (db.query("l").join("r", "k", "k", kind="right")
                     .order_by("kf").order_by("r.w").limit(10).no_cache())
                if disable:
                    type(exe)._join_rows = lambda self, *a, **kw: None
                    try:
                        return q.fetch()
                    finally:
                        type(exe)._join_rows = rj
                return q.fetch()

            fast, slow = run(False), run(True)
            assert fast.records == slow.records
            # null-kf group ordered by r.w: tails (4, 5) interleave with
            # matched rows (6, 7)
            assert [x.get("w") for x in fast.records] == [4, 5, 6, 7]
        finally:
            db.close()

    def test_right_join_shared_unqualified_name_bails(self):
        # both tables have "k": matched rows show the base k, tail rows
        # the right k — per-row source switching must take the record
        # path on order/group shapes
        users = TableSchema(name="l", fields=(
            FieldSchema("k", DataType.integer),))
        orders = TableSchema(name="r", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("w", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        try:
            db.batch_insert("l", [{"k": 5}])
            db.batch_insert("r", [{"k": 5, "w": 1}, {"k": 0, "w": 2}])
            exe = db.engine.executor
            taken = []
            rj = type(exe)._join_rows

            def spy(self, *a, **kw):
                out = rj(self, *a, **kw)
                taken.append(out is not None)
                return out

            type(exe)._join_rows = spy
            try:
                fast = (db.query("l").join("r", "k", "k", kind="right")
                        .order_by("k").limit(10).no_cache().fetch())
            finally:
                type(exe)._join_rows = rj
            assert taken == [False]
            type(exe)._join_rows = lambda self, *a, **kw: None
            try:
                slow = (db.query("l").join("r", "k", "k", kind="right")
                        .order_by("k").limit(10).no_cache().fetch())
            finally:
                type(exe)._join_rows = rj
            assert fast.records == slow.records
        finally:
            db.close()


class TestJoinKindValidation:
    def test_unknown_join_kind_raises(self):
        # pre-fix, kind="full" silently took inner semantics on the
        # record path and LEFT semantics on the pair fast path
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            with pytest.raises(ValueError, match="join kind"):
                db.query("t").join("t", "a", "a", kind="full")
            with pytest.raises(ValueError, match="join kind"):
                db.query("t").join("t", "a", "a", kind="Left")
        finally:
            db.close()


class TestJoinedFieldPredicates:
    """Join queries may predicate on joined-table fields via qualified
    names (reference query_executor.dart:456-466: main-only superset
    pre-scan + full post-join matcher). Pre-fix, 'r.w' conditions
    filtered against base columns and matched nothing."""

    def _db(self):
        import random
        users = TableSchema(name="l", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("a", DataType.integer)))
        orders = TableSchema(name="r", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("w", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[users, orders])
        rng = random.Random(9)
        db.batch_insert("l", [
            {"k": rng.randint(0, 5), "a": rng.randint(0, 10)}
            for _ in range(50)])
        db.batch_insert("r", [
            {"k": rng.randint(0, 5), "w": rng.randint(0, 30)}
            for _ in range(120)])
        return db

    @staticmethod
    def _oracle(db, kind, pred):
        ls = db.query("l").no_cache().limit(1000).fetch().records
        rs = db.query("r").no_cache().limit(1000).fetch().records
        out, matched_r = [], set()
        for lrec in ls:
            hits = [rr for rr in rs if rr["k"] == lrec["k"]]
            if hits:
                for rr in hits:
                    m = dict(lrec)
                    for kk, vv in rr.items():
                        m.setdefault(kk, vv)
                        m[f"r.{kk}"] = vv
                    matched_r.add(rr["id"])
                    out.append(m)
            elif kind == "left":
                out.append(dict(lrec))
        if kind == "right":
            for rr in rs:
                if rr["id"] not in matched_r:
                    m = dict(rr)
                    for kk, vv in rr.items():
                        m[f"r.{kk}"] = vv
                    out.append(m)
        return [x for x in out if pred(x)]

    def test_qualified_right_field_all_kinds(self):
        db = self._db()
        try:
            for kind in ("inner", "left", "right"):
                got = (db.query("l").join("r", "k", "k", kind=kind)
                       .where("r.w", ">", 20).no_cache().limit(1000)
                       .fetch())
                want = self._oracle(
                    db, kind,
                    lambda x: x.get("r.w") is not None and x["r.w"] > 20)
                assert got.total == len(want), kind
                assert all(x["r.w"] > 20 for x in got.records)
        finally:
            db.close()

    def test_main_prefixed_and_or_superset(self):
        db = self._db()
        try:
            got = (db.query("l").join("r", "k", "k").where("l.a", "<", 3)
                   .no_cache().limit(1000).fetch())
            want = self._oracle(db, "inner", lambda x: x["a"] < 3)
            assert got.total == len(want)
            # OR across tables: the pre-join extraction must go superset
            c = QueryCondition()
            c.where("a", "=", 0)
            c.or_(QueryCondition().where("r.w", ">", 25))
            got = (db.query("l").join("r", "k", "k").condition(c)
                   .no_cache().limit(1000).fetch())
            want = self._oracle(
                db, "inner",
                lambda x: x["a"] == 0
                or (x.get("r.w") is not None and x["r.w"] > 25))
            assert got.total == len(want)
        finally:
            db.close()

    def test_joined_predicate_with_aggregates(self):
        from collections import Counter
        db = self._db()
        try:
            g = (db.query("l").join("r", "k", "k").where("r.w", ">", 20)
                 .group_by("a").aggregate(Agg.count()).no_cache().fetch())
            cw = Counter(
                x["a"] for x in self._oracle(
                    db, "inner",
                    lambda x: x.get("r.w") is not None and x["r.w"] > 20))
            assert {r["a"]: r["count"] for r in g.records} == dict(cw)
        finally:
            db.close()

    def test_mixed_base_and_joined_and(self):
        db = self._db()
        try:
            got = (db.query("l").join("r", "k", "k")
                   .where("a", ">", 5).where("r.w", "<", 10)
                   .no_cache().limit(1000).fetch())
            want = self._oracle(
                db, "inner",
                lambda x: x["a"] > 5
                and x.get("r.w") is not None and x["r.w"] < 10)
            assert got.total == len(want)
        finally:
            db.close()


class TestKvSetManyBatched:
    """set_many rides the columnar bulk insert/update machinery (one
    lock + one WAL group) above 64 keys — 24k -> 107k keys/s."""

    def test_semantics_parity(self):
        import time as _t
        db = ToStoreTPU.memory()
        try:
            kv = db.kv
            kv.set_many({f"k{i}": i for i in range(200)})
            assert kv.count() == 200 and kv.get("k150") == 150
            kv.set_many({f"k{i}": i * 2 for i in range(200)})  # all-update
            assert kv.get("k150") == 300
            kv.set_many({f"k{i}": -1 for i in range(150, 260)})  # mixed
            assert kv.get("k180") == -1 and kv.get("k255") == -1
            assert kv.count() == 260
            kv.set_many({f"t{i}": i for i in range(100)}, ttl_seconds=0.05)
            assert kv.get("t5") == 5
            _t.sleep(0.1)
            assert kv.get("t5") is None
            db.kv_global.set_many({f"g{i}": i for i in range(100)})
            assert db.kv_global.get("g7") == 7 and db.kv.get("g7") is None
            ev = []
            db.kv.watch_value("w1", callback=ev.append)
            db.kv.set_many({f"w{i}": i for i in range(100)})
            assert len(ev) == 1

            def action(tx):
                db.kv.set_many({f"x{i}": i for i in range(80)})
                tx.rollback()

            db.transaction(action)
            assert db.kv.get("x5") is None
        finally:
            db.close()

    def test_durable_across_crash(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path))
        db.kv.set_many({f"d{i}": {"v": i} for i in range(500)})
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.kv.get("d499") == {"v": 499}
        assert db2.kv.count("d") == 500
        db2.close()


class TestJoinPredicateReviewFindings:
    """Third self-review round over the predicate/KV diff (all verified
    failing pre-fix)."""

    def test_qualified_shadow_suffix_fallback(self):
        # the record MATCHER's '<join>.<field>' lookup falls back to a
        # same-named BASE column on unmatched rows — the vectorized mask
        # must bail (not null the row out)
        l = TableSchema(name="l", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("ks", DataType.text)))
        r = TableSchema(name="r", fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("ks", DataType.text),
            FieldSchema("w", DataType.integer)))
        db = ToStoreTPU.memory(schemas=[l, r])
        try:
            db.batch_insert("l", [{"k": 2, "ks": "b"}, {"k": 5, "ks": "z"}])
            db.batch_insert("r", [{"k": 5, "ks": "x", "w": 1}])
            exe = db.engine.executor
            rj = type(exe)._join_rows
            for cond_f, val in (("r.k", 2), ("r.ks", "b")):
                fast = (db.query("l").join("r", "k", "k", kind="left")
                        .where(cond_f, "=", val).no_cache().limit(10)
                        .fetch())
                type(exe)._join_rows = lambda self, *a, **kw: None
                try:
                    slow = (db.query("l").join("r", "k", "k", kind="left")
                            .where(cond_f, "=", val).no_cache().limit(10)
                            .fetch())
                finally:
                    type(exe)._join_rows = rj
                assert fast.records == slow.records
                assert fast.total == slow.total == 1, cond_f
        finally:
            db.close()

    def test_main_prefixed_predicate_stays_fast(self):
        l = TableSchema(name="l", fields=(FieldSchema("a", DataType.integer),
                                          FieldSchema("k", DataType.integer)))
        r = TableSchema(name="r", fields=(FieldSchema("k", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[l, r])
        try:
            db.batch_insert("l", [{"a": 1, "k": 1}, {"a": 7, "k": 1}])
            db.batch_insert("r", [{"k": 1}])
            exe = db.engine.executor
            rj = type(exe)._join_rows
            taken = []

            def spy(self, *a, **kw):
                out = rj(self, *a, **kw)
                taken.append(out is not None)
                return out

            type(exe)._join_rows = spy
            try:
                got = (db.query("l").join("r", "k", "k")
                       .where("l.a", ">", 5).no_cache().limit(10).fetch())
            finally:
                type(exe)._join_rows = rj
            assert taken == [True] and got.total == 1
        finally:
            db.close()

    def test_set_many_never_rejects_what_set_accepts(self):
        # the bulk route validates; per-key set doesn't — declines and
        # rejections fall back per-key so the contract is size-independent
        db = ToStoreTPU.memory()
        try:
            r = db.kv.set_many({f"b{i}": (1, 2) for i in range(70)})
            assert r.is_success
            assert db.kv.count("b") == 70
            v = db.kv.get("b5")
            assert v in ((1, 2), [1, 2])
        finally:
            db.close()

    def test_update_events_hide_ingest_ts(self):
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.insert("t", {"a": 1})
            ev = []
            db.watch("t", callback=ev.append)
            db.update_by_pk("t", 1, {"a": 2})
            assert "_system_ingest_ts_ms" not in ev[-1].record
            db.engine.BULK_UPDATE_MIN_ROWS = 1
            db.batch_insert("t", [{"a": i} for i in range(3)])
            db.engine.batch_update("t", [{"id": 2, "a": 9}])
            assert "_system_ingest_ts_ms" not in ev[-1].record
        finally:
            db.close()

    def test_get_keys_consistent_under_writers(self):
        import threading
        db = ToStoreTPU.memory()
        try:
            db.kv.set_many({f"k{i}": i for i in range(5000)})
            stop = threading.Event()
            errs = []

            def writer():
                i = 5000
                while not stop.is_set():
                    db.kv.set(f"k{i}", i)
                    i += 1

            def reader():
                try:
                    for _ in range(60):
                        n = db.kv.count("k")
                        assert n >= 5000
                except Exception as e:  # broadcast errors pre-fix
                    errs.append(e)

            w = threading.Thread(target=writer)
            rs = [threading.Thread(target=reader) for _ in range(3)]
            w.start()
            [t.start() for t in rs]
            [t.join() for t in rs]
            stop.set()
            w.join()
            assert not errs, errs
        finally:
            db.close()


class TestProjectionPushdown:
    def test_selected_pages_gather_only_needed_columns(self):
        # wide table, narrow select: 42 -> 6.5 ms at 5k rows; cursors
        # still encode order values + pk, aliases still apply
        fields = tuple(
            FieldSchema(f"c{i}", DataType.integer) for i in range(12)
        )
        db = ToStoreTPU.memory(schemas=[TableSchema(name="w", fields=fields)])
        try:
            db.batch_insert(
                "w", [{f"c{i}": j for i in range(12)} for j in range(500)]
            )
            r = (db.query("w").select("c0", "c1").order_by("c3")
                 .limit(50).no_cache().fetch())
            assert all(x.keys() == {"c0", "c1"} for x in r.records)
            walk = [x["c0"] for x in r.records]
            while r.has_more:
                r = r.next()
                assert all(x.keys() == {"c0", "c1"} for x in r.records)
                walk += [x["c0"] for x in r.records]
            assert sorted(walk) == sorted(range(500))
            r = (db.query("w").select("c0").as_("c0", "zero").limit(3)
                 .no_cache().fetch())
            assert r.records[0].keys() == {"zero"}
            # internal ingest-ts stays invisible even if selected
            r = (db.query("w").select("_system_ingest_ts_ms", "c0")
                 .limit(2).no_cache().fetch())
            assert r.records[0]["_system_ingest_ts_ms"] is None
        finally:
            db.close()


class TestLifecycleCallbacks:
    """on_configure / on_create / on_open (reference tostore.dart:100-102,
    data_store_impl.dart:960,1033,913)."""

    def test_order_and_create_only_when_fresh(self):
        from tostore_tpu.engine.storage import MemoryStorage

        calls = []
        s = TableSchema(name="t", fields=(FieldSchema("a", DataType.integer),))
        st = MemoryStorage()
        db = ToStoreTPU.open(
            "/x", schemas=[s], storage=st,
            on_configure=lambda d: calls.append(
                ("configure", d.table_exists("t"))),
            on_create=lambda d: calls.append(("create",)),
            on_open=lambda d: calls.append(
                ("open", d.insert("t", {"a": 1}).is_success)),
        )
        assert calls == [("configure", False), ("create",), ("open", True)]
        db.engine.flush()
        db.close()
        calls2 = []
        db2 = ToStoreTPU.open(
            "/x", schemas=[s], storage=st,
            on_create=lambda d: calls2.append("create"),
            on_open=lambda d: calls2.append("open"))
        assert calls2 == ["open"]  # recovered manifest: not a creation
        assert db2.count("t") == 1
        db2.close()
        m = ToStoreTPU.memory(
            schemas=[s], on_create=lambda d: calls2.append("mem_create"))
        assert calls2[-1] == "mem_create"  # pure-memory dbs are fresh
        m.close()
