"""Incremental durability: per-table snapshot files written only when
dirty, segmented WAL with a checkpoint pointer, fsync policies, legacy
layout migration (reference wal_manager.dart:608 checkpoint pointer +
parallel_journal_manager.dart:1209-1228 dirty-only flush)."""

import glob
import os

import numpy as np
import pytest

from tostore_tpu.api import ToStoreTPU
from tostore_tpu.models.config import DataStoreConfig
from tostore_tpu.models.schema import DataType, FieldSchema, TableSchema


def two_tables():
    return [
        TableSchema(name="a", fields=(FieldSchema("v", DataType.integer),)),
        TableSchema(name="b", fields=(FieldSchema("v", DataType.integer),)),
    ]


def snap_path(tmp_path, table, space="default"):
    return os.path.join(str(tmp_path), "default", "tables", f"{space}%40{table}.snap")


def snap_files(tmp_path):
    return {
        os.path.basename(p): os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(str(tmp_path), "default", "tables", "*.snap"))
    }


def wal_segments(tmp_path):
    return sorted(glob.glob(os.path.join(str(tmp_path), "default", "wal", "wal-*.log")))


class TestIncrementalCheckpoint:
    def test_only_dirty_tables_rewritten(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.insert("a", {"v": 1})
        db.insert("b", {"v": 1})
        db.flush()
        before = snap_files(tmp_path)
        db.insert("a", {"v": 2})
        db.flush()
        after = snap_files(tmp_path)
        changed = {k for k in before if before[k] != after[k]}
        assert any("a.snap" in k for k in changed)
        assert not any("b.snap" in k for k in changed), changed
        db.close()

    def test_clean_flush_writes_nothing(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.insert("a", {"v": 1})
        db.flush()
        before = snap_files(tmp_path)
        db.flush()
        assert snap_files(tmp_path) == before
        db.close()

    def test_dropped_table_snap_removed(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.insert("a", {"v": 1})
        db.flush()
        db.drop_table("a")
        db.flush()
        assert not any("a.snap" in k for k in snap_files(tmp_path))
        db.close()

    def test_reopen_after_checkpoint_and_tail(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        for i in range(5):
            db.insert("a", {"v": i})
        db.flush()
        for i in range(5, 9):
            db.insert("a", {"v": i})
        db.engine._wal.close()  # crash: no final checkpoint
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("a") == 9
        assert db2.engine._counters["recovery_apply_errors"] == 0
        db2.close()


class TestWalSegments:
    def test_segments_rotate_and_recover(self, tmp_path):
        cfg = DataStoreConfig(wal_segment_max_bytes=512)
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables(), config=cfg)
        for i in range(50):
            db.insert("a", {"v": i})
        assert len(wal_segments(tmp_path)) > 1
        db.engine._wal.close()
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path), config=cfg)
        assert db2.count("a") == 50
        db2.close()

    def test_checkpoint_prunes_covered_segments(self, tmp_path):
        cfg = DataStoreConfig(wal_segment_max_bytes=512)
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables(), config=cfg)
        for i in range(50):
            db.insert("a", {"v": i})
        db.flush()
        segs = wal_segments(tmp_path)
        assert len(segs) == 1, segs  # only the fresh post-checkpoint segment
        db.close()

    def test_torn_tail_in_last_segment(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.insert("a", {"v": 1})
        db.engine._wal.close()
        db.engine._crontab.stop()
        with open(wal_segments(tmp_path)[-1], "ab") as f:
            f.write(b"\xa7torn")
        db2 = ToStoreTPU.open(str(tmp_path))
        assert db2.count("a") == 1
        db2.close()


class TestFsyncPolicy:
    def test_bad_policy_rejected(self, tmp_path):
        cfg = DataStoreConfig(recovery_flush_policy="yolo")
        with pytest.raises(ValueError):
            ToStoreTPU.open(str(tmp_path), config=cfg)

    def test_commit_policy(self, tmp_path):
        cfg = DataStoreConfig(persist_recovery_on_commit=True)
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables(), config=cfg)
        db.insert("a", {"v": 1})
        assert db.engine._wal.sync_policy == "commit"
        db.close()


class TestVectorTableCheckpoint:
    def test_vector_index_persists_incrementally(self, tmp_path, rng):
        from tostore_tpu.models.schema import IndexSchema, VectorFieldConfig

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=8)),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector"),),
        )
        db = ToStoreTPU.open(str(tmp_path), schemas=[schema, *two_tables()])
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        for v in vecs:
            db.insert("docs", {"emb": v.tolist()})
        db.flush()
        before = snap_files(tmp_path)
        db.insert("a", {"v": 1})
        db.flush()
        after = snap_files(tmp_path)
        assert before[[k for k in before if "docs" in k][0]] == \
            after[[k for k in after if "docs" in k][0]]
        db.close()
        db2 = ToStoreTPU.open(str(tmp_path))
        res = db2.vector_search("docs", "emb", vecs[3], top_k=1)
        assert res[0].primary_key == 4
        db2.close()


class TestResumableLargeDelete:
    """Reference large_operation_runner.dart:26 + LargeDeleteMeta
    (wal_manager.dart:78-131): a conditional delete above the large-op
    threshold persists its condition before deleting; a crash mid-way
    resumes the remainder on reopen."""

    def test_crash_mid_large_delete_resumes(self, tmp_path, monkeypatch):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.engine.LARGE_OP_THRESHOLD = 10
        db.batch_insert("a", [{"v": i % 5} for i in range(100)])
        db.flush()

        # crash after 7 row deletes
        orig = type(db.engine)._delete_pk
        count = {"n": 0}

        class Crash(RuntimeError):
            pass

        def crashing(self, t, space, pk, wal=True):
            if count["n"] >= 7:
                raise Crash()
            count["n"] += 1
            return orig(self, t, space, pk, wal)

        monkeypatch.setattr(type(db.engine), "_delete_pk", crashing)
        from tostore_tpu import QueryCondition

        with pytest.raises(Crash):
            db.engine.delete("a", QueryCondition().where("v", "=", 3))
        monkeypatch.setattr(type(db.engine), "_delete_pk", orig)
        db.engine._wal.close()
        db.engine._crontab.stop()

        db2 = ToStoreTPU.open(str(tmp_path))
        # all 20 v==3 rows gone: 7 before the crash, 13 resumed at open
        assert db2.count("a") == 80
        from tostore_tpu import QueryCondition as QC

        assert db2.engine.count("a", QC().where("v", "=", 3)) == 0
        assert db2.engine._counters.get("resumed_large_delete_rows", 0) == 13
        db2.close()

    def test_completed_large_delete_not_rerun(self, tmp_path):
        db = ToStoreTPU.open(str(tmp_path), schemas=two_tables())
        db.engine.LARGE_OP_THRESHOLD = 10
        db.batch_insert("a", [{"v": i % 5} for i in range(100)])
        from tostore_tpu import QueryCondition

        db.engine.delete("a", QueryCondition().where("v", "=", 3))
        db.batch_insert("a", [{"v": 3} for _ in range(5)])  # new v=3 rows
        db.engine._wal.close()  # crash without checkpoint
        db.engine._crontab.stop()
        db2 = ToStoreTPU.open(str(tmp_path))
        from tostore_tpu import QueryCondition as QC

        # the done marker prevents re-running the delete over the new rows
        assert db2.engine.count("a", QC().where("v", "=", 3)) == 5
        db2.close()


class TestSnapshotCrc:
    """Table snapshots carry a CRC frame (reference page CRC headers): bit
    corruption fails the open with a descriptive SnapshotCorruption
    instead of a garbage decode or silent data loss."""

    def _schema(self):
        return TableSchema(name="t", fields=(FieldSchema("v", DataType.integer),))

    def test_corrupted_snapshot_raises_descriptive_error(self, tmp_path):
        import glob
        import os

        from tostore_tpu.engine.database import SnapshotCorruption

        db = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        db.batch_insert("t", [{"v": i} for i in range(100)])
        db.flush()
        db.close()
        snaps = glob.glob(os.path.join(str(tmp_path), "*", "tables", "*t.snap"))
        target = [s for s in snaps if "system" not in s][0]
        with open(target, "r+b") as f:
            f.seek(100)
            b = f.read(1)
            f.seek(100)
            f.write(bytes([b[0] ^ 0xFF]))
        # lazy open succeeds on the manifest alone; the corruption surfaces
        # as the same descriptive error on FIRST TOUCH of the table (the
        # reference is lazy too — tree_cache.dart pages fail on demand)
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        with pytest.raises(SnapshotCorruption) as ei:
            db2.query("t").fetch()
        assert "t.snap" in str(ei.value)
        db2.close()

    def test_legacy_unframed_snapshot_still_loads(self, tmp_path):
        # pre-CRC snapshots start with the codec dict tag, not the frame
        # magic — they must keep loading
        import glob
        import os

        from tostore_tpu.utils import codec

        db = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        db.insert("t", {"v": 5})
        db.flush()
        target = [
            s for s in glob.glob(
                os.path.join(str(tmp_path), "*", "tables", "*t.snap"))
            if "system" not in s
        ][0]
        db.close()
        # strip the frame: rewrite the file as the bare payload
        raw = open(target, "rb").read()
        payloads = list(codec.iter_frames(raw))
        assert len(payloads) == 1
        open(target, "wb").write(payloads[0])
        db2 = ToStoreTPU.open(str(tmp_path), schemas=[self._schema()])
        assert db2.get_by_pk("t", 1)["v"] == 5
        db2.close()
