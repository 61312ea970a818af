"""Engine integration tests.

Mirrors the reference's scenario catalogue
(example/lib/testing/database_tester.dart runAllTests :107-190): CRUD,
constraints, batch ops, upsert, JOINs, multi-space isolation, FK
cascade/restrict, expressions, transactions, backup/restore, schema
upgrade, advanced queries, count verification, KV ops, TTL — plus
durability/crash-recovery contract tests the reference only demos by video.
"""

import os
import time

import numpy as np
import pytest

from tostore_tpu import (
    DataStoreConfig,
    DataType,
    Expr,
    FieldSchema,
    ForeignKeyAction,
    ForeignKeySchema,
    IndexSchema,
    PrimaryKeyConfig,
    PrimaryKeyType,
    QueryCondition,
    TableSchema,
    TableTtlConfig,
    ToStoreTPU,
    VectorFieldConfig,
    VectorIndexConfig,
)
from tostore_tpu.models.aggregation import Agg
from tostore_tpu.models.results import BusinessError


def users_schema(**kw):
    return TableSchema(
        name="users",
        fields=(
            FieldSchema("username", DataType.text, nullable=False, unique=True),
            FieldSchema("email", DataType.text, unique=True),
            FieldSchema("age", DataType.integer, min_value=0, max_value=200),
            FieldSchema("balance", DataType.double, default_value=0.0),
            FieldSchema("is_active", DataType.boolean, default_value=True),
            FieldSchema("tags", DataType.array),
            FieldSchema("profile", DataType.json),
        ),
        indexes=(IndexSchema(fields=("age",)),),
        **kw,
    )


def posts_schema():
    return TableSchema(
        name="posts",
        fields=(
            FieldSchema("user_id", DataType.integer),
            FieldSchema("title", DataType.text),
        ),
        foreign_keys=(
            ForeignKeySchema("user_id", "users", on_delete=ForeignKeyAction.cascade),
        ),
    )


@pytest.fixture
def db():
    d = ToStoreTPU.memory(schemas=[users_schema()])
    yield d
    d.close()


class TestBasicCrud:
    def test_insert_and_get(self, db):
        r = db.insert("users", {"username": "alice", "age": 30})
        assert r.is_success and r.success_keys == [1]
        rec = db.get_by_pk("users", 1)
        assert rec["username"] == "alice" and rec["age"] == 30
        assert rec["balance"] == 0.0 and rec["is_active"] is True  # defaults

    def test_sequential_pks(self, db):
        for i in range(3):
            db.insert("users", {"username": f"u{i}"})
        assert [r["id"] for r in db.query("users").fetch()] == [1, 2, 3]

    def test_user_supplied_pk_advances_sequence(self, db):
        db.insert("users", {"id": 100, "username": "x"})
        r = db.insert("users", {"username": "y"})
        assert r.success_keys == [101]

    def test_update_and_delete(self, db):
        db.insert("users", {"username": "bob", "age": 20})
        r = db.update("users", {"age": 21}).where("username", "=", "bob").execute()
        assert r.is_success and db.get_by_pk("users", 1)["age"] == 21
        r = db.delete("users").where("username", "=", "bob").execute()
        assert r.is_success and db.get_by_pk("users", 1) is None

    def test_update_requires_condition(self, db):
        db.insert("users", {"username": "a"})
        r = db.update("users", {"age": 1}).execute()
        assert r.is_error
        r = db.update("users", {"age": 1}).allow_update_all().execute()
        assert r.is_success

    def test_clear_and_delete_all(self, db):
        for i in range(5):
            db.insert("users", {"username": f"u{i}"})
        assert db.count("users") == 5
        db.clear("users")
        assert db.count("users") == 0
        # sequence resets with clear (fresh table state)
        db.insert("users", {"username": "after"})
        assert db.count("users") == 1


class TestConstraints:
    def test_non_null(self, db):
        r = db.insert("users", {"age": 5})
        assert r.is_error and "not nullable" in r.message

    def test_unique_violation(self, db):
        db.insert("users", {"username": "alice"})
        r = db.insert("users", {"username": "alice"})
        assert r.is_error and r.type.name == "uniqueViolation"

    def test_unique_released_on_delete(self, db):
        db.insert("users", {"username": "alice"})
        db.delete("users").where("username", "=", "alice").execute()
        assert db.insert("users", {"username": "alice"}).is_success

    def test_min_max(self, db):
        assert db.insert("users", {"username": "a", "age": -1}).is_error
        assert db.insert("users", {"username": "b", "age": 201}).is_error
        assert db.insert("users", {"username": "c", "age": 200}).is_success

    def test_type_coercion_and_rejection(self, db):
        r = db.insert("users", {"username": "a", "age": "35"})
        assert r.is_success and db.get_by_pk("users", 1)["age"] == 35
        assert db.insert("users", {"username": "b", "age": "not_a_number"}).is_error

    def test_unknown_field_rejected(self, db):
        assert db.insert("users", {"username": "a", "bogus": 1}).is_error


class TestBatchOps:
    def test_batch_insert_partial(self, db):
        recs = [{"username": f"u{i}"} for i in range(5)]
        recs[2] = {"username": None}  # violates non-null
        r = db.batch_insert("users", recs)
        assert r.is_partial and len(r.success_keys) == 4 and len(r.failed_keys) == 1

    def test_batch_insert_atomic(self, db):
        recs = [{"username": "a"}, {"username": None}]
        r = db.batch_insert("users", recs, allow_partial=False)
        assert r.is_error and db.count("users") == 0

    def test_batch_upsert(self, db):
        db.insert("users", {"username": "alice", "age": 1})
        r = db.batch_upsert(
            "users",
            [{"username": "alice", "age": 2}, {"username": "bob", "age": 3}],
        )
        assert r.is_success
        assert db.count("users") == 2
        rows = {r["username"]: r for r in db.query("users").fetch()}
        assert rows["alice"]["age"] == 2 and rows["bob"]["age"] == 3

    def test_batch_update_fast_path(self, db):
        # uniform, expression-free, non-unique fields -> columnar path
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}", "age": i % 100}
            for i in range(200)
        ])
        r = db.batch_update("users", [
            {"id": i + 1, "age": (i % 100) + 1, "balance": float(i)}
            for i in range(200)
        ])
        assert r.is_success and len(r.success_keys) == 200
        rec = db.get_by_pk("users", 50)
        assert rec["age"] == (49 % 100) + 1 and rec["balance"] == 49.0
        # index on age stays consistent (generation-invalidated)
        assert db.query("users").where("age", "=", 100).count() == 2
        assert db.engine.timings().get("batch_update", {}).get("count", 0) >= 1

    def test_batch_update_partial_and_missing(self, db):
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}", "age": 1} for i in range(5)
        ])
        r = db.batch_update("users", [
            {"id": 1, "age": 7},
            {"id": 999, "age": 8},          # missing pk
            {"id": 2, "age": 500},          # out of bounds (max 200)
        ])
        assert r.is_partial
        assert r.success_keys == [1]
        assert set(r.failed_keys) == {999, 2}
        assert db.get_by_pk("users", 1)["age"] == 7
        assert db.get_by_pk("users", 2)["age"] == 1  # unchanged

    def test_batch_update_unique_field_general_path(self, db):
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}"} for i in range(4)
        ])
        # unique-field updates must maintain the unique maps (general path)
        r = db.batch_update("users", [
            {"id": 1, "username": "w0"}, {"id": 2, "username": "w1"},
        ])
        assert r.is_success
        # old values released, new values claimed
        assert db.insert("users", {"username": "u0"}).is_success
        assert not db.insert("users", {"username": "w0"}).is_success

    def test_batch_update_durable(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}", "age": 1} for i in range(50)
        ])
        r = db.batch_update("users", [
            {"id": i + 1, "age": 9} for i in range(50)
        ])
        assert r.is_success
        db.engine._wal.close()  # crash: no final checkpoint
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        assert db2.get_by_pk("users", 25)["age"] == 9  # WAL replay applied
        db2.close()

    def test_batch_upsert_fast_split(self, db):
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}", "age": 1} for i in range(3)
        ])
        r = db.batch_upsert("users", [
            {"id": 2, "age": 42},             # existing -> columnar update
            {"id": 10, "username": "nn", "age": 5},  # new -> columnar insert
        ])
        assert r.is_success and set(r.success_keys) == {2, 10}
        assert db.get_by_pk("users", 2)["age"] == 42
        assert db.get_by_pk("users", 10)["username"] == "nn"

    def test_batch_update_notifies_watchers(self, db):
        db.batch_insert("users", [
            {"id": i + 1, "username": f"u{i}", "age": 1} for i in range(3)
        ])
        got = []
        db.watch("users", callback=got.append)
        db.batch_update("users", [{"id": 1, "age": 2}, {"id": 2, "age": 3}])
        assert [e.type for e in got] == ["update", "update"]
        assert got[0].record["age"] == 2


class TestQueries:
    def setup_rows(self, db, n=20):
        db.batch_insert(
            "users",
            [
                {"username": f"user{i:02d}", "age": i, "balance": float(i) * 10,
                 "tags": ["even" if i % 2 == 0 else "odd"]}
                for i in range(n)
            ],
        )

    def test_where_operators(self, db):
        self.setup_rows(db)
        q = db.query("users").where("age", ">", 15).fetch()
        assert len(q) == 4
        q = db.query("users").where_between("age", 5, 8).fetch()
        assert [r["age"] for r in q] == [5, 6, 7, 8]
        q = db.query("users").where_in("age", [1, 3, 99]).fetch()
        assert len(q) == 2
        q = db.query("users").where_like("username", "user0%").fetch()
        assert len(q) == 10

    def test_quoted_numeric_comparison(self, db):
        # reference advanced-queries quirk: quoted numerics compare numerically
        self.setup_rows(db, 5)
        q = db.query("users").where("age", ">", "2").fetch()
        assert len(q) == 2

    def test_or_conditions(self, db):
        self.setup_rows(db, 10)
        q = (
            db.query("users")
            .where("age", "<", 2)
            .or_where(lambda c: c.where("age", ">", 7))
            .fetch()
        )
        assert sorted(r["age"] for r in q) == [0, 1, 8, 9]

    def test_order_limit_offset(self, db):
        self.setup_rows(db, 10)
        q = db.query("users").order_by_desc("age").limit(3).fetch()
        assert [r["age"] for r in q] == [9, 8, 7]
        q = db.query("users").order_by("age").offset(8).limit(5).fetch()
        assert [r["age"] for r in q] == [8, 9]

    def test_cursor_pagination(self, db):
        self.setup_rows(db, 10)
        page1 = db.query("users").order_by("age").limit(4).fetch()
        assert page1.has_more and page1.next_cursor
        page2 = page1.next()
        assert [r["age"] for r in page2] == [4, 5, 6, 7]
        page3 = page2.next()
        assert [r["age"] for r in page3] == [8, 9] and not page3.has_more

    def test_select_and_alias(self, db):
        self.setup_rows(db, 3)
        q = db.query("users").select("username", "age").as_("age", "years").fetch()
        assert set(q[0]) == {"username", "years"}

    def test_aggregates_group_having(self, db):
        self.setup_rows(db, 10)
        res = (
            db.query("users")
            .aggregate(Agg.count(alias="n"), Agg.sum("age", "total"), Agg.avg("balance", "avg_b"))
            .fetch()
        )
        row = res[0]
        assert row["n"] == 10 and row["total"] == 45 and row["avg_b"] == 45.0
        # group by parity of first tag
        res = (
            db.query("users")
            .group_by("is_active")
            .aggregate(Agg.count(alias="n"))
            .fetch()
        )
        assert res[0]["n"] == 10

    def test_distinct(self, db):
        db.batch_insert("users", [{"username": f"u{i}", "age": i % 2} for i in range(6)])
        q = db.query("users").select("age").distinct().fetch()
        assert len(q) == 2

    def test_stream_query(self, db):
        self.setup_rows(db, 17)
        got = list(db.stream_query("users", batch_size=5).stream())
        assert len(got) == 17

    def test_count_and_exists(self, db):
        self.setup_rows(db, 7)
        assert db.query("users").where("age", ">=", 5).count() == 2
        assert db.query("users").where("age", "=", 3).exists()
        assert not db.query("users").where("age", "=", 99).exists()

    def test_index_scan_matches_table_scan(self, db):
        self.setup_rows(db, 20)
        plan = db.engine.executor.choose_plan(
            db.engine._table("users"),
            __import__("tostore_tpu.query.executor", fromlist=["QuerySpec"]).QuerySpec(
                condition=QueryCondition().where("age", "between", (3, 9))
            ),
        )
        assert plan.plan == "indexScan"
        q = db.query("users").where_between("age", 3, 9).fetch()
        assert [r["age"] for r in q] == list(range(3, 10))


class TestJoins:
    def test_inner_left_join(self, db):
        db.create_table(posts_schema())
        db.insert("users", {"username": "alice"})
        db.insert("users", {"username": "bob"})
        db.insert("posts", {"user_id": 1, "title": "hello"})
        db.insert("posts", {"user_id": 1, "title": "world"})
        q = db.query("posts").join("users", "user_id", "id").fetch()
        assert len(q) == 2 and all(r["username"] == "alice" for r in q)
        q = db.query("users").left_join("posts", "id", "user_id").fetch()
        assert len(q) == 3  # alice x2 + bob unmatched

    def test_fk_aware_join(self, db):
        db.create_table(posts_schema())
        db.insert("users", {"username": "alice"})
        db.insert("posts", {"user_id": 1, "title": "t"})
        q = db.query("posts").join_referenced_table("users").fetch()
        assert q[0]["username"] == "alice"
        q = db.query("users").join_referencing_table("posts").fetch()
        assert q[0]["title"] == "t"


class TestForeignKeys:
    def test_fk_insert_validation(self, db):
        db.create_table(posts_schema())
        r = db.insert("posts", {"user_id": 999, "title": "x"})
        assert r.is_error and r.type.name == "foreignKeyViolation"

    def test_cascade_delete(self, db):
        db.create_table(posts_schema())
        db.insert("users", {"username": "alice"})
        db.insert("posts", {"user_id": 1, "title": "a"})
        db.insert("posts", {"user_id": 1, "title": "b"})
        db.delete("users").where("id", "=", 1).execute()
        assert db.count("posts") == 0

    def test_restrict_delete(self, db):
        schema = TableSchema(
            name="posts",
            fields=(FieldSchema("user_id", DataType.integer), FieldSchema("title", DataType.text)),
            foreign_keys=(
                ForeignKeySchema("user_id", "users", on_delete=ForeignKeyAction.restrict),
            ),
        )
        db.create_table(schema)
        db.insert("users", {"username": "alice"})
        db.insert("posts", {"user_id": 1, "title": "a"})
        r = db.delete("users").where("id", "=", 1).execute()
        assert r.is_error and db.count("users") == 1

    def test_set_null_delete(self, db):
        schema = TableSchema(
            name="posts",
            fields=(FieldSchema("user_id", DataType.integer), FieldSchema("title", DataType.text)),
            foreign_keys=(
                ForeignKeySchema("user_id", "users", on_delete=ForeignKeyAction.setNull),
            ),
        )
        db.create_table(schema)
        db.insert("users", {"username": "alice"})
        db.insert("posts", {"user_id": 1, "title": "a"})
        db.delete("users").where("id", "=", 1).execute()
        assert db.query("posts").fetch()[0]["user_id"] is None


class TestExpressions:
    def test_arithmetic(self, db):
        db.insert("users", {"username": "a", "age": 10, "balance": 100.0})
        db.update("users", {"age": Expr.field("age") + 5}).where("id", "=", 1).execute()
        assert db.get_by_pk("users", 1)["age"] == 15
        db.update(
            "users", {"balance": (Expr.field("balance") * 2).min(150.0)}
        ).where("id", "=", 1).execute()
        assert db.get_by_pk("users", 1)["balance"] == 150.0

    def test_division_by_zero_fails_record(self, db):
        db.insert("users", {"username": "a", "age": 10})
        r = db.update("users", {"age": Expr.field("age") / 0}).where("id", "=", 1).execute()
        assert r.is_error
        assert db.get_by_pk("users", 1)["age"] == 10  # unchanged

    def test_conditional_when(self, db):
        db.insert("users", {"username": "a", "age": 70})
        db.update(
            "users",
            {"tags": Expr.when(Expr.field("age") >= 65, ["senior"], ["regular"])},
        ).allow_update_all().execute()
        assert db.get_by_pk("users", 1)["tags"] == ["senior"]


class TestTransactions:
    def test_commit(self, db):
        def action(tx):
            db.insert("users", {"username": "a"})
            db.insert("users", {"username": "b"})
            return "done"

        res = db.transaction(action)
        assert res.committed and res.result == "done"
        assert db.count("users") == 2

    def test_rollback_on_business_error(self, db):
        def action(tx):
            db.insert("users", {"username": "a"})
            raise BusinessError("nope")

        res = db.transaction(action)
        assert not res.committed and db.count("users") == 0

    def test_rollback_restores_updates_and_deletes(self, db):
        db.insert("users", {"username": "a", "age": 1})
        db.insert("users", {"username": "b", "age": 2})

        def action(tx):
            db.update_by_pk("users", 1, {"age": 99})
            db.delete_by_pk("users", 2)
            tx.rollback()

        res = db.transaction(action)
        assert not res.committed
        assert db.get_by_pk("users", 1)["age"] == 1
        assert db.get_by_pk("users", 2)["username"] == "b"

    def test_unique_violation_rolls_back(self, db):
        db.insert("users", {"username": "taken"})

        def action(tx):
            db.insert("users", {"username": "fresh"})
            r = db.insert("users", {"username": "taken"})
            if r.is_error:
                raise BusinessError(r.message)

        res = db.transaction(action)
        assert not res.committed
        assert db.count("users") == 1  # "fresh" rolled back

    def test_context_manager_form(self, db):
        with db.transaction():
            db.insert("users", {"username": "cm"})
        assert db.count("users") == 1

    def test_read_your_writes(self, db):
        def action(tx):
            db.insert("users", {"username": "a", "age": 5})
            assert db.get_by_pk("users", 1)["age"] == 5
            db.update_by_pk("users", 1, {"age": 6})
            assert db.get_by_pk("users", 1)["age"] == 6

        assert db.transaction(action).committed


class TestMultiSpace:
    def test_space_isolation(self):
        db = ToStoreTPU.memory()
        db.create_table(users_schema())
        db.insert("users", {"username": "in_default"})
        db.switch_space("tenant2")
        db.create_table(users_schema())
        assert db.count("users") == 0
        db.insert("users", {"username": "in_t2"})
        assert db.count("users") == 1
        db.switch_space("default")
        assert db.query("users").fetch()[0]["username"] == "in_default"
        db.close()

    def test_global_table_shared(self):
        db = ToStoreTPU.memory()
        db.create_table(users_schema(is_global=True))
        db.insert("users", {"username": "shared"})
        db.switch_space("other")
        assert db.count("users") == 1
        db.close()

    def test_global_kv_vs_local(self):
        db = ToStoreTPU.memory()
        db.kv.set("k", "local-default")
        db.kv_global.set("k", "global")
        db.switch_space("s2")
        assert db.kv.get("k") is None
        assert db.kv_global.get("k") == "global"
        db.close()


class TestKv:
    def test_typed_accessors(self, db):
        db.kv.set("s", "txt")
        db.kv.set("i", 42)
        db.kv.set("f", 2.5)
        db.kv.set("b", True)
        db.kv.set("j", {"a": [1, 2]})
        assert db.kv.get_string("s") == "txt"
        assert db.kv.get_int("i") == 42
        assert db.kv.get_double("f") == 2.5
        assert db.kv.get_bool("b") is True
        assert db.kv.get_json("j") == {"a": [1, 2]}

    def test_increment_prefix_count(self, db):
        assert db.kv.set_increment("counter") == 1
        assert db.kv.set_increment("counter", 10) == 11
        db.kv.set_many({"p:a": 1, "p:b": 2, "q:c": 3})
        assert db.kv.get_keys("p:") == ["p:a", "p:b"]
        assert db.kv.count("p:") == 2
        assert db.kv.exists("q:c") and not db.kv.exists("zz")

    def test_ttl_expiry(self, db):
        db.kv.set("tmp", 1, ttl_seconds=0.05)
        assert db.kv.get("tmp") == 1
        time.sleep(0.08)
        assert db.kv.get("tmp") is None
        removed = db.engine.run_ttl_cleanup()
        assert removed >= 1

    def test_watch_value(self, db):
        events = []
        db.kv.watch_value("k", callback=events.append)
        db.kv.set("k", 1)
        db.kv.set("other", 2)
        db.kv.set("k", 3)
        assert len(events) == 2


class TestTtlTables:
    def test_row_ttl(self):
        schema = TableSchema(
            name="sessions",
            fields=(FieldSchema("token", DataType.text),),
            ttl=TableTtlConfig(ttl_seconds=0.05),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        db.insert("sessions", {"token": "x"})
        assert db.run_ttl_cleanup() == 0
        time.sleep(0.08)
        assert db.run_ttl_cleanup() == 1
        assert db.count("sessions") == 0
        db.close()


class TestWatch:
    def test_change_events(self, db):
        sub = db.watch("users")
        db.insert("users", {"username": "a"})
        db.update_by_pk("users", 1, {"age": 5})
        db.delete_by_pk("users", 1)
        kinds = [e.type for e in sub.events]
        assert kinds == ["insert", "update", "delete"]

    def test_txn_events_only_on_commit(self, db):
        sub = db.watch("users")

        def action(tx):
            db.insert("users", {"username": "a"})
            tx.rollback()

        db.transaction(action)
        assert sub.events == []
        db.transaction(lambda tx: db.insert("users", {"username": "b"}))
        assert [e.type for e in sub.events] == ["insert"]


class TestSchemaMigration:
    def test_add_remove_field(self, db):
        db.insert("users", {"username": "a", "age": 5})
        r = (
            db.update_schema("users")
            .add_field(FieldSchema("nickname", DataType.text, default_value="n/a"))
            .remove_field("profile")
            .execute()
        )
        assert r.is_success
        rec = db.get_by_pk("users", 1)
        assert rec["nickname"] == "n/a" and "profile" not in rec

    def test_rename_field_keeps_data(self, db):
        db.insert("users", {"username": "a", "age": 7})
        r = db.update_schema("users").rename_field("age", "years").execute()
        assert r.is_success
        assert db.get_by_pk("users", 1)["years"] == 7

    def test_auto_rename_detection(self, db):
        db.insert("users", {"username": "a", "balance": 50.0})
        import dataclasses

        old = db.get_schema("users")
        fields = tuple(
            dataclasses.replace(f, name="balance_amount") if f.name == "balance" else f
            for f in old.fields
        )
        new_schema = dataclasses.replace(old, fields=fields)
        r = db.set_schema("users", new_schema)
        assert r.is_success
        assert r.data["renamed"] == {"balance": "balance_amount"}
        assert db.get_by_pk("users", 1)["balance_amount"] == 50.0

    def test_retype_field(self, db):
        db.insert("users", {"username": "a", "age": 5})
        import dataclasses

        old = db.get_schema("users")
        fields = tuple(
            dataclasses.replace(f, name="age", type=DataType.text) if f.name == "age" else f
            for f in old.fields
        )
        r = db.set_schema("users", dataclasses.replace(old, fields=fields))
        assert r.is_success
        assert db.get_by_pk("users", 1)["age"] == "5"

    def test_writes_after_migration_use_new_schema(self, db):
        db.insert("users", {"username": "a"})
        db.update_schema("users").add_field(
            FieldSchema("nickname", DataType.text, unique=True)
        ).remove_field("profile").execute()
        # new field accepted (and its unique constraint enforced)...
        assert db.insert("users", {"username": "b", "nickname": "nick"}).is_success
        r = db.insert("users", {"username": "c", "nickname": "nick"})
        assert r.is_error and r.type.name == "uniqueViolation"
        # ...removed field rejected
        assert db.insert("users", {"username": "d", "profile": {}}).is_error

    def test_rename_table(self, db):
        db.insert("users", {"username": "a"})
        r = db.update_schema("users").rename_table("members").execute()
        assert r.is_success
        assert db.get_by_pk("members", 1)["username"] == "a"
        assert db.get_schema("users") is None


class TestDurability:
    def test_reopen_from_snapshot(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.insert("users", {"username": "alice", "age": 30})
        db.flush()
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.get_by_pk("users", 1)["username"] == "alice"
        db2.close()

    def test_wal_replay_without_flush(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.insert("users", {"username": "alice"})
        db.insert("users", {"username": "bob"})
        db.update_by_pk("users", 1, {"age": 44})
        # simulate crash: close WAL file without flush/checkpoint
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("users") == 2
        assert db2.get_by_pk("users", 1)["age"] == 44
        db2.close()

    def test_torn_wal_tail_discarded(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.insert("users", {"username": "alice"})
        db.engine._wal.close()
        db.engine._crontab.stop()
        import glob as _glob

        segs = sorted(_glob.glob(os.path.join(str(tmp_path), "default", "wal", "wal-*.log")))
        with open(segs[-1], "ab") as f:
            f.write(b"\xa7garbage-torn-frame")
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("users") == 1  # intact prefix replayed, tail dropped
        db2.close()

    def test_txn_not_committed_lost_on_crash(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[users_schema()])
        db.insert("users", {"username": "committed"})

        class Crash(Exception):
            pass

        try:
            with db.transaction():
                db.insert("users", {"username": "uncommitted"})
                raise Crash()
        except Crash:
            pass
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("users") == 1
        db2.close()

    def test_vectors_survive_reopen(self, tmp_path, rng):
        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("body", DataType.text),
                FieldSchema(
                    "emb", DataType.vector, vector_config=VectorFieldConfig(dimensions=32)
                ),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector"),),
        )
        db = ToStoreTPU.open(str(tmp_path), schemas=[schema])
        vecs = rng.standard_normal((20, 32)).astype(np.float32)
        db.batch_insert(
            "docs", [{"body": f"d{i}", "emb": vecs[i].tolist()} for i in range(20)]
        )
        hit = db.vector_search("docs", "emb", vecs[7], top_k=1)[0]
        assert hit.primary_key == 8  # sequential pks start at 1
        db.flush()
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path))
        hit = db2.vector_search("docs", "emb", vecs[7], top_k=1)[0]
        assert hit.primary_key == 8
        db2.close()


class TestBackupRestore:
    def test_backup_restore_memory(self, tmp_path, db):
        db.insert("users", {"username": "alice"})
        path = str(tmp_path / "b.zip")
        db.backup(path)
        db.clear("users")
        assert db.count("users") == 0
        db.restore(path)
        assert db.count("users") == 1

    def test_scoped_backup_restores_only_space(self, tmp_path):
        db = ToStoreTPU.memory()
        db.create_table(users_schema())
        db.insert("users", {"username": "in_default"})
        db.switch_space("t2")
        db.create_table(users_schema())
        db.insert("users", {"username": "in_t2"})
        path = str(tmp_path / "scoped.zip")
        db.backup(path, scope="currentSpace")  # t2 only
        db.clear("users")  # wipe t2
        db.switch_space("default")
        db.clear("users")  # wipe default too
        db.switch_space("t2")
        db.restore(path)
        assert db.count("users") == 1  # t2 restored
        db.switch_space("default")
        assert db.count("users") == 0  # default untouched by scoped restore
        db.close()

    def test_backup_restore_file(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path / "db"), schemas=[users_schema()])
        db.insert("users", {"username": "alice"})
        bpath = str(tmp_path / "backup.zip")
        db.backup(bpath)
        db.delete("users").allow_delete_all().execute()
        db.restore(bpath)
        assert db.count("users") == 1
        db.close()


class TestVectorIntegration:
    def make_db(self, rng, n=300, index_type="flat"):
        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("category", DataType.text),
                FieldSchema("views", DataType.integer),
                FieldSchema(
                    "emb", DataType.vector, vector_config=VectorFieldConfig(dimensions=32)
                ),
            ),
            indexes=(
                IndexSchema(
                    fields=("emb",),
                    type="vector",
                    vector_config=VectorIndexConfig(
                        index_type=__import__(
                            "tostore_tpu.models.schema", fromlist=["VectorIndexType"]
                        ).VectorIndexType(index_type),
                        num_clusters=8,
                        nprobe=8,
                    ),
                ),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        vecs = rng.standard_normal((n, 32)).astype(np.float32)
        db.batch_insert(
            "docs",
            [
                {
                    "category": "tech" if i % 2 == 0 else "art",
                    "views": i,
                    "emb": vecs[i].tolist(),
                }
                for i in range(n)
            ],
        )
        return db, vecs

    def test_vector_search_end_to_end(self, rng):
        db, vecs = self.make_db(rng)
        res = db.vector_search("docs", "emb", vecs[10], top_k=5, include_records=True)
        assert res[0].primary_key == 11
        assert res[0].record["views"] == 10
        assert res[0].score >= res[1].score - 1e-6
        db.close()

    def test_hybrid_filtered_search(self, rng):
        db, vecs = self.make_db(rng)
        res = (
            db.vector_query("docs", "emb", vecs[10])
            .where("category", "=", "art")
            .top_k(5)
            .fetch()
        )
        assert res, "filtered search returned nothing"
        for r in res:
            assert db.get_by_pk("docs", r.primary_key)["category"] == "art"
        # parity with post-filtering (BASELINE config #4 contract)
        unfiltered = db.vector_search("docs", "emb", vecs[10], top_k=300)
        post = [r for r in unfiltered if db.get_by_pk("docs", r.primary_key)["category"] == "art"][:5]
        assert [r.primary_key for r in res] == [r.primary_key for r in post]
        db.close()

    def test_hybrid_device_mask_path(self, rng):
        # numeric predicates compile to device masks over resident filter
        # columns (vector/filters.py); parity with the host-evaluated path
        db, vecs = self.make_db(rng)
        from tostore_tpu.vector import filters

        t = db.engine._table("docs")
        idx = t.vector_indexes["emb"]
        cond = QueryCondition().where("views", ">", 150).where("views", "<=", 280)
        t.flush_vectors()
        assert filters.compilable(cond, set(t.filter_fields) & idx.corpus.filter_columns.names())
        res = (
            db.vector_query("docs", "emb", vecs[10])
            .where("views", ">", 150)
            .where("views", "<=", 280)
            .top_k(5)
            .fetch()
        )
        assert res
        for r in res:
            v = db.get_by_pk("docs", r.primary_key)["views"]
            assert 150 < v <= 280
        # parity with post-filtered exact
        unfiltered = db.vector_search("docs", "emb", vecs[10], top_k=300)
        post = [
            r for r in unfiltered
            if 150 < db.get_by_pk("docs", r.primary_key)["views"] <= 280
        ][:5]
        assert [r.primary_key for r in res] == [r.primary_key for r in post]
        # filter columns track updates
        pk = res[0].primary_key
        db.update_by_pk("docs", pk, {"views": 0})
        res2 = (
            db.vector_query("docs", "emb", vecs[10])
            .where("views", ">", 150).where("views", "<=", 280).top_k(5).fetch()
        )
        assert pk not in [r.primary_key for r in res2]
        db.close()

    def test_delete_then_search(self, rng):
        db, vecs = self.make_db(rng)
        top = db.vector_search("docs", "emb", vecs[3], top_k=1)[0]
        db.delete_by_pk("docs", top.primary_key)
        top2 = db.vector_search("docs", "emb", vecs[3], top_k=1)[0]
        assert top2.primary_key != top.primary_key
        db.close()

    def test_ivf_end_to_end(self, rng):
        db, vecs = self.make_db(rng, n=600, index_type="ivf")
        res = db.vector_search("docs", "emb", vecs[42], top_k=3)
        assert res[0].primary_key == 43
        db.close()


class TestStatus:
    def test_status_surface(self, db):
        db.insert("users", {"username": "a"})
        st = db.status()
        assert st["active_space"] == "default"
        assert st["tables"]["default/users"]["records"] == 1
        assert st["counters"]["inserts"] == 1


class TestBuilderSurfaceParity:
    """QueryBuilder surface items from the reference chain API
    (query_builder.dart): agg shortcuts, clone, joinWithForeignKey,
    live watch, clearQueryCache."""

    def test_agg_shortcuts(self, db):
        db.batch_insert("users", [
            {"username": f"u{i}", "age": i} for i in range(10)
        ])
        q = db.query("users").where("age", ">=", 5)
        assert q.sum("age") == 5 + 6 + 7 + 8 + 9
        assert q.avg("age") == 7
        assert q.min("age") == 5
        assert q.max("age") == 9
        # the builder stays usable for normal fetches afterwards
        assert len(q.fetch().records) == 5

    def test_clone_is_independent(self, db):
        db.batch_insert("users", [
            {"username": f"u{i}", "age": i} for i in range(10)
        ])
        base = db.query("users").where("age", ">=", 5)
        narrowed = base.clone().where("age", "<", 7)
        assert narrowed.count() == 2
        assert base.count() == 5  # clone didn't mutate the original

    def test_join_with_foreign_key_both_directions(self):
        db = ToStoreTPU.memory(schemas=[users_schema(), posts_schema()])
        db.insert("users", {"username": "a"})
        db.insert("posts", {"user_id": 1, "title": "t1"})
        # referencing direction (posts -> users)
        rows = db.query("posts").join_with_foreign_key("users").fetch().records
        assert rows and rows[0]["users.username"] == "a"
        # referenced direction (users -> posts)
        rows = db.query("users").join_with_foreign_key("posts").fetch().records
        assert rows and rows[0]["posts.title"] == "t1"
        db.close()

    def test_live_query_watch(self, db):
        db.insert("users", {"username": "a", "age": 1})
        snapshots = []
        sub = db.query("users").where("age", ">=", 2).watch(snapshots.append)
        db.insert("users", {"username": "b", "age": 5})
        assert snapshots and [r["username"] for r in snapshots[-1]] == ["b"]
        db.insert("users", {"username": "c", "age": 1})  # doesn't match
        assert [r["username"] for r in snapshots[-1]] == ["b"]
        sub.cancel()
        db.insert("users", {"username": "d", "age": 9})
        assert [r["username"] for r in snapshots[-1]] == ["b"]  # no updates

    def test_clear_query_cache(self, db):
        db.batch_insert("users", [
            {"username": f"u{i}", "age": i} for i in range(5)
        ])
        db.query("users").where("age", "=", 1).fetch()
        assert db.clear_query_cache() >= 1
        assert len(db.engine.executor._cache) == 0
