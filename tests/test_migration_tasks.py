"""Schema-diff auto-migration at open + persisted, resumable,
progress-reporting migration tasks (reference data_store_impl.dart:897
_startSetupAndUpgrade, migration_manager.dart task queue,
tostore.dart:1119 queryMigrationTaskStatus)."""

import pytest

from tostore_tpu.api import ToStoreTPU
from tostore_tpu.models.schema import DataType, FieldSchema, TableSchema


def v1():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("score", DataType.integer),
            FieldSchema("note", DataType.text),
        ),
    )


def v2():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("score_v2", DataType.integer),  # renamed from score
            FieldSchema("note", DataType.text),
            FieldSchema("extra", DataType.double),  # added
        ),
    )


class TestAutoMigrationAtOpen:
    def test_open_with_evolved_schema_migrates(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[v1()])
        db.insert("t", {"score": 7, "note": "x"})
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[v2()])
        rec = db2.query("t").fetch().records[0]
        assert rec["score_v2"] == 7 and "score" not in rec and rec["extra"] is None
        tasks = db2.engine.query_migration_status()
        assert tasks and tasks[-1]["status"] == "completed"
        assert tasks[-1]["progress"] == 100
        assert tasks[-1]["report"]["renamed"] == {"score": "score_v2"}
        db2.close()

    def test_same_schema_no_task(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[v1()])
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[v1()])
        assert db2.engine.query_migration_status() == []
        db2.close()

    def test_memory_mode_auto_migrates(self):
        db = ToStoreTPU.memory(schemas=[v1()])
        db.insert("t", {"score": 1, "note": "a"})
        r = db.create_tables([v2()])
        assert r.is_success
        assert db.query("t").fetch().records[0]["score_v2"] == 1
        db.close()


class TestTaskPersistence:
    def test_tasks_survive_reopen(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=[v1()])
        db.insert("t", {"score": 7, "note": "x"})
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[v2()])
        db2.close()
        db3 = ToStoreTPU.open(str(tmp_path))
        tasks = db3.engine.query_migration_status()
        assert len(tasks) == 1 and tasks[0]["status"] == "completed"
        assert db3.engine.query_migration_status(tasks[0]["task_id"])["table"] == "t"
        db3.close()

    def test_failed_migration_recorded(self):
        db = ToStoreTPU.memory(schemas=[v1()])
        db.insert("t", {"score": 5, "note": "x"})
        db.insert("t", {"score": 5, "note": "y"})
        bad = TableSchema(
            name="t",
            fields=(
                FieldSchema("score", DataType.integer, unique=True),
                FieldSchema("note", DataType.text),
            ),
        )
        r = db.engine.update_schema("t", bad)
        assert not r.is_success
        tasks = db.engine.query_migration_status()
        assert tasks[-1]["status"] == "failed"
        assert "unique" in tasks[-1]["error"]
        db.close()


class TestCrashResume:
    def test_kill_mid_migration_resumes_on_reopen(self, tmp_path, monkeypatch):
        db = ToStoreTPU.open(str(tmp_path), schemas=[v1()])
        for i in range(50):
            db.insert("t", {"score": i, "note": f"n{i}"})
        db.close()

        # crash inside the migration transform, after the task went to WAL
        import tostore_tpu.engine.migration as mig

        class Boom(RuntimeError):
            pass

        orig = mig.migrate_table

        def crashing(table, new_schema, renames=None, on_progress=None):
            if on_progress is not None:
                on_progress(25, "backfill")
                raise Boom("simulated crash")
            return orig(table, new_schema, renames, on_progress)

        monkeypatch.setattr(mig, "migrate_table", crashing)
        db2 = ToStoreTPU.open(str(tmp_path))
        with pytest.raises(Boom):
            db2.create_tables([v2()])
        # simulate process death: no close/flush
        db2.engine._wal.close()
        db2.engine._crontab.stop()
        monkeypatch.setattr(mig, "migrate_table", orig)

        db3 = ToStoreTPU.open(str(tmp_path), schemas=[v2()])
        rec = db3.query("t").order_by("id").fetch().records[0]
        assert rec["score_v2"] == 0  # migration completed on reopen
        tasks = db3.engine.query_migration_status()
        statuses = [t["status"] for t in tasks]
        assert "interrupted" in statuses and statuses[-1] == "completed"
        db3.close()
