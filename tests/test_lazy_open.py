"""Lazy open: the engine reads only the manifest at startup and loads each
table's snapshot on first touch (reference lazy opens + on-demand paging,
tree_cache.dart:15-70; prewarm strictly optional, data_store_impl.dart:5441).
WAL replay materializes exactly the tables it touches, streaming frames.
"""

import numpy as np

from tostore_tpu import (
    DataType, FieldSchema, TableSchema, ToStoreTPU,
)


def _schemas():
    return [
        TableSchema(name="a", fields=(FieldSchema("x", DataType.integer),)),
        TableSchema(name="b", fields=(FieldSchema("y", DataType.integer),)),
    ]


def _seed(tmp_path):
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    db.batch_insert("a", [{"x": i} for i in range(500)])
    db.batch_insert("b", [{"y": i} for i in range(300)])
    db.flush()
    db.close()


def test_open_registers_tables_without_loading(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    eng = db.engine
    pend = set(eng._tables.pending)
    assert ("default", "a") in pend and ("default", "b") in pend
    # schemas known without a load (system tables — KV, migrations — may
    # already have materialized; user tables must not have)
    assert db.get_schema("a") is not None
    assert eng._tables.peek(("default", "a")) is None
    assert eng._tables.peek(("default", "b")) is None
    base = eng._counters.get("lazy_table_loads", 0)
    # status reports checkpointed counts for never-loaded tables
    st = eng.status()
    assert st["tables"]["default/a"] == {
        "records": 500, "loaded": False, "vector_indexes": {},
    }
    # first touch loads ONLY the touched table
    assert db.query("a").count() == 500
    assert eng._counters["lazy_table_loads"] == base + 1
    assert ("default", "b") in eng._tables.pending
    assert eng.status()["tables"]["default/a"]["loaded"] is True
    assert db.get_by_pk("b", 1) == {"id": 1, "y": 0}
    assert eng._counters["lazy_table_loads"] == base + 2
    db.close()


def test_wal_replay_loads_only_dirty_tables(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    db.batch_insert("a", [{"x": 1000 + i} for i in range(50)])
    for i in range(20):
        db.insert("a", {"x": 2000 + i})
    # simulated crash: no flush/close
    db.engine._crontab and db.engine._crontab.stop()
    db.engine._wal.close()
    db2 = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    eng = db2.engine
    # replay touched (and therefore loaded) `a`; `b` stayed lazy...
    assert eng._tables.peek(("default", "a")) is not None
    # ...though the post-replay checkpoint may keep b pending
    assert ("default", "b") in eng._tables
    assert db2.query("a").count() == 570
    assert db2.query("b").count() == 300
    db2.close()


def test_flush_preserves_pending_tables_in_catalog(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    # touch only `a`, then checkpoint: `b` must survive in the catalog
    db.insert("a", {"x": 9999})
    db.flush()
    db.close()
    db2 = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    assert db2.query("b").count() == 300
    assert db2.query("a").count() == 501
    db2.close()


def test_backup_covers_pending_tables(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    dest = db.backup(str(tmp_path / "bk.zip"))
    db.close()
    db2 = ToStoreTPU.open(str(tmp_path / "fresh"), schemas=_schemas())
    db2.restore(dest)
    assert db2.query("b").count() == 300
    db2.close()


def test_drop_pending_table(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    assert db.drop_table("b").is_success
    assert db.engine.has_table("b") is False
    db.flush()
    db.close()
    db2 = ToStoreTPU.open(str(tmp_path))
    assert db2.engine.has_table("b") is False
    assert db2.query("a").count() == 500
    db2.close()


def test_rename_pending_table_keeps_data(tmp_path):
    _seed(tmp_path)
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    assert db.engine.rename_table("b", "b2").is_success
    db.flush()
    db.close()
    db2 = ToStoreTPU.open(str(tmp_path))
    assert db2.query("b2").count() == 300
    db2.close()


def test_streaming_replay_coalesces_single_inserts(tmp_path):
    db = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    for i in range(1200):
        db.insert("a", {"id": i + 1, "x": i})
    db.delete("a").where("x", "<", 100).execute()
    db.insert("b", {"y": 7})
    db.engine._crontab and db.engine._crontab.stop()
    db.engine._wal.close()
    db2 = ToStoreTPU.open(str(tmp_path), schemas=_schemas())
    assert db2.query("a").count() == 1100
    assert db2.get_by_pk("a", 1) is None and db2.get_by_pk("a", 101)["x"] == 100
    assert db2.query("b").count() == 1
    assert db2.engine._counters["recovery_apply_errors"] == 0
    db2.close()
