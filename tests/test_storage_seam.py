"""Storage seam (VERDICT r3 Missing #2 / do-this #6): the engine's full
persistence machinery — manifest, snapshots, segmented WAL, checkpoint
pointer, backup enumeration — runs unchanged over pluggable Storage
backends (reference StorageInterface, storage_interface.dart:22-159)."""

import os

import numpy as np
import pytest

from tostore_tpu import ToStoreTPU
from tostore_tpu.engine.storage import (
    FileStorage,
    InMemoryObjectClient,
    MemoryStorage,
    ObjectStorage,
)
from tostore_tpu.models.schema import (
    DataType,
    FieldSchema,
    IndexSchema,
    TableSchema,
    VectorFieldConfig,
    VectorIndexConfig,
)


def _schema():
    return TableSchema(
        name="docs",
        fields=(
            FieldSchema("v", DataType.integer),
            FieldSchema("emb", DataType.vector,
                        vector_config=VectorFieldConfig(dimensions=8)),
        ),
        indexes=(
            IndexSchema(fields=("emb",), type="vector",
                        vector_config=VectorIndexConfig(index_type="flat")),
        ),
    )


BACKENDS = {
    "memory": lambda tmp: MemoryStorage(),
    "object": lambda tmp: ObjectStorage(InMemoryObjectClient()),
    "file": lambda tmp: FileStorage(),
}


class TestStorageBackends:
    @pytest.mark.parametrize("kind", list(BACKENDS))
    def test_primitives(self, kind, tmp_path):
        st = BACKENDS[kind](tmp_path)
        base = str(tmp_path / "db")
        st.makedirs(os.path.join(base, "sub"))
        p = os.path.join(base, "sub", "a.bin")
        assert not st.exists(p)
        st.write_atomic(p, b"hello")
        assert st.exists(p) and st.read(p) == b"hello"
        ap = st.appender(os.path.join(base, "sub", "log.bin"))
        ap.write(b"ab")
        ap.fsync()
        ap.write(b"cd")
        ap.close()
        assert st.read(os.path.join(base, "sub", "log.bin")) == b"abcd"
        assert st.list(os.path.join(base, "sub")) == ["a.bin", "log.bin"]
        assert sorted(st.walk(base)) == ["sub/a.bin", "sub/log.bin"] or (
            kind == "file"
            and sorted(st.walk(base)) == [
                os.path.join("sub", "a.bin"), os.path.join("sub", "log.bin")
            ]
        )
        st.delete(p)
        st.delete(p)  # missing delete is a no-op
        assert not st.exists(p)
        with pytest.raises(FileNotFoundError):
            st.read(p)

    @pytest.mark.parametrize("kind", ["memory", "object"])
    def test_full_engine_lifecycle_in_ram(self, kind, tmp_path):
        """Open -> CRUD+vector -> crash (no close) -> reopen on the SAME
        backend instance: WAL replay + snapshot recovery, zero real files."""
        from tostore_tpu.models.config import DataStoreConfig

        st = BACKENDS[kind](tmp_path)
        path = "/virtual/dbroot"  # never touches the real filesystem
        # commit-fsync policy: the object backend uploads each WAL append
        # (its fsync IS the upload; 'interval' would bound the loss window
        # instead, same contract as files)
        db = ToStoreTPU.open(
            path, schemas=[_schema()], storage=st,
            config=DataStoreConfig(persist_recovery_on_commit=True),
        )
        rng = np.random.default_rng(0)
        db.batch_insert("docs", [
            {"id": i, "v": i, "emb": rng.standard_normal(8).tolist()}
            for i in range(50)
        ])
        db.engine.flush()  # checkpoint: snapshots through the seam
        db.insert("docs", {"id": 100, "v": 100, "emb": [1.0] * 8})  # WAL tail
        db.update_by_pk("docs", 3, {"v": 333})
        # simulated crash: abandon without close; WAL has the tail
        db.engine._crontab and db.engine._crontab.stop()

        db2 = ToStoreTPU.open(path, schemas=[_schema()], storage=st)
        assert db2.get_by_pk("docs", 100)["v"] == 100
        assert db2.get_by_pk("docs", 3)["v"] == 333
        hits = db2.vector_search("docs", "emb", np.ones(8, np.float32), top_k=1)
        assert hits[0].primary_key == 100
        assert not os.path.exists("/virtual")  # nothing leaked to the FS
        db2.close()

    def test_backup_restore_through_seam(self, tmp_path):
        st = MemoryStorage()
        db = ToStoreTPU.open("/virtual/dbroot", schemas=[_schema()], storage=st)
        rng = np.random.default_rng(1)
        db.batch_insert("docs", [
            {"id": i, "v": i, "emb": rng.standard_normal(8).tolist()}
            for i in range(20)
        ])
        dest = str(tmp_path / "b.zip")  # export artifact goes to real FS
        db.backup(dest, scope="database")
        db.delete("docs").where("v", ">=", 0).execute()
        assert db.query("docs").count() == 0
        db.restore(dest)
        assert db.query("docs").count() == 20
        db.close()

    def test_no_direct_io_left_in_persistence_paths(self):
        """Guard: wal.py and database.py persistence code must go through
        the seam — no raw open()/os.remove/os.fsync/glob calls."""
        import re

        for mod in ("tostore_tpu/engine/wal.py", "tostore_tpu/engine/database.py"):
            src = open(mod).read()
            assert not re.search(r"\bos\.fsync\(", src), mod
            assert not re.search(r"\bos\.remove\(", src), mod
            assert not re.search(r"\bglob\.glob\(", src), mod
            # `open(` as file I/O (envelope.open / self._envelope.open are
            # crypto, zipfile handles export artifacts)
            for m in re.finditer(r"(?<![.\w])open\(", src):
                line = src[: m.start()].rsplit("\n", 1)[-1] + src[m.start():].split("\n", 1)[0]
                assert "zipfile" in line or "ZipFile" in line, (mod, line)
