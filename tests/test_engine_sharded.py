"""Engine-integrated mesh-sharded vector indexes: with config
mesh_shape set, tables' vector indexes stripe their corpora across the
(virtual 8-device) mesh while the full engine surface — hybrid filters,
durability, deletes — keeps working."""

import numpy as np
import pytest

from tostore_tpu import (
    DataStoreConfig,
    DataType,
    FieldSchema,
    IndexSchema,
    TableSchema,
    ToStoreTPU,
    VectorFieldConfig,
)


def docs_schema(dims=32):
    return TableSchema(
        name="docs",
        fields=(
            FieldSchema("views", DataType.integer, default_value=0),
            FieldSchema("title", DataType.text),
            FieldSchema(
                "emb", DataType.vector, vector_config=VectorFieldConfig(dimensions=dims)
            ),
        ),
        indexes=(IndexSchema(fields=("emb",), type="vector"),),
    )


@pytest.fixture
def db():
    cfg = DataStoreConfig(mesh_shape=(2, 4))  # dp=2, shard=4
    d = ToStoreTPU(cfg, schemas=[docs_schema()])
    yield d
    d.close()


class TestShardedEngine:
    def test_index_is_sharded(self, db, rng):
        t = db.engine._table("docs")
        assert t.vector_indexes["emb"].index_type == "sharded_flat"
        assert t.vector_indexes["emb"].nsh == 4

    def test_search_and_mutation(self, db, rng):
        vecs = rng.standard_normal((300, 32)).astype(np.float32)
        db.batch_insert(
            "docs",
            [{"title": f"d{i}", "views": i, "emb": vecs[i].tolist()} for i in range(300)],
        )
        hit = db.vector_search("docs", "emb", vecs[42], top_k=1)[0]
        assert hit.primary_key == 43
        db.delete_by_pk("docs", 43)
        hit = db.vector_search("docs", "emb", vecs[42], top_k=1)[0]
        assert hit.primary_key != 43

    def test_hybrid_device_filter_on_mesh(self, db, rng):
        vecs = rng.standard_normal((200, 32)).astype(np.float32)
        db.batch_insert(
            "docs",
            [{"title": f"d{i}", "views": i, "emb": vecs[i].tolist()} for i in range(200)],
        )
        res = (
            db.vector_query("docs", "emb", vecs[10]).where("views", ">=", 100).top_k(5).fetch()
        )
        assert res
        for r in res:
            assert db.get_by_pk("docs", r.primary_key)["views"] >= 100

    def test_durability_across_mesh_restart(self, tmp_path, rng):
        cfg = DataStoreConfig(db_path=str(tmp_path), mesh_shape=(2, 4))
        db = ToStoreTPU(cfg, schemas=[docs_schema()])
        vecs = rng.standard_normal((100, 32)).astype(np.float32)
        db.batch_insert("docs", [{"title": f"d{i}", "emb": vecs[i].tolist()} for i in range(100)])
        db.flush()
        db.close()
        # reopen on a DIFFERENT mesh shape (re-striping)
        db2 = ToStoreTPU(DataStoreConfig(db_path=str(tmp_path), mesh_shape=(1, 8)))
        assert db2.engine._table("docs").vector_indexes["emb"].nsh == 8
        hit = db2.vector_search("docs", "emb", vecs[7], top_k=1)[0]
        assert hit.primary_key == 8
        db2.close()
        # and back to a single device
        db3 = ToStoreTPU(DataStoreConfig(db_path=str(tmp_path)))
        idx = db3.engine._table("docs").vector_indexes["emb"]
        assert idx.index_type == "flat"
        hit = db3.vector_search("docs", "emb", vecs[7], top_k=1)[0]
        assert hit.primary_key == 8
        db3.close()

    def test_sharded_ivf_via_engine(self, rng):
        from tostore_tpu.models.schema import VectorIndexConfig, VectorIndexType
        import dataclasses

        base = docs_schema()
        schema = dataclasses.replace(
            base,
            indexes=(
                IndexSchema(
                    fields=("emb",),
                    type="vector",
                    vector_config=VectorIndexConfig(
                        index_type=VectorIndexType.ivf, num_clusters=8, nprobe=8
                    ),
                ),
            ),
        )
        cfg = DataStoreConfig(mesh_shape=(2, 4))
        db = ToStoreTPU(cfg, schemas=[schema])
        t = db.engine._table("docs")
        assert t.vector_indexes["emb"].index_type == "sharded_ivf"
        nc = 8
        centers = rng.standard_normal((nc, 32)).astype(np.float32) * 4
        n = 5000
        vecs = (centers[np.arange(n) % nc] + rng.standard_normal((n, 32)) * 0.5).astype(
            np.float32
        )
        db.batch_insert(
            "docs",
            [{"title": f"d{i}", "views": i, "emb": vecs[i].tolist()} for i in range(n)],
        )
        hit = db.vector_search("docs", "emb", vecs[321], top_k=1)[0]
        assert hit.primary_key == 322
        assert t.vector_indexes["emb"].trained
        # hybrid on sharded ivf
        res = (
            db.vector_query("docs", "emb", vecs[321]).where("views", ">=", 2500).top_k(5).fetch()
        )
        for r in res:
            assert db.get_by_pk("docs", r.primary_key)["views"] >= 2500
        db.close()

    def test_sharded_ivf_compact_preserves_config(self, rng):
        from tostore_tpu.parallel import make_mesh
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        mesh = make_mesh(8, dp=2)
        idx = ShardedIVFIndex(16, mesh, metric="l2", num_clusters=8, nprobe=5,
                              min_train_size=500)
        x = rng.standard_normal((1200, 16)).astype(np.float32)
        idx.upsert(list(range(1200)), x)
        assert idx.trained and idx.nprobe == 5
        idx.delete(list(range(200)))
        assert idx.maybe_compact(0.10)
        # config + training survive the background-compaction path
        assert idx.nprobe == 5 and idx.num_clusters_cfg == 8 and idx.trained
        assert idx.search(x[777], top_k=1, nprobe=8)[0].primary_key == 777

    def test_ivf_snapshot_crosses_topologies(self, tmp_path, rng):
        import dataclasses
        from tostore_tpu.models.schema import VectorIndexConfig

        schema = dataclasses.replace(
            docs_schema(),
            indexes=(IndexSchema(fields=("emb",), type="vector",
                                 vector_config=VectorIndexConfig(index_type="ivf",
                                                                 num_clusters=8,
                                                                 nprobe=6)),),
        )
        cfg = DataStoreConfig(db_path=str(tmp_path), mesh_shape=(2, 4))
        db = ToStoreTPU(cfg, schemas=[schema])
        vecs = rng.standard_normal((5000, 32)).astype(np.float32)
        db.batch_insert("docs", [{"title": f"d{i}", "emb": vecs[i].tolist()} for i in range(5000)])
        db.vector_search("docs", "emb", vecs[0], top_k=1)  # flush + train
        assert db.engine._table("docs").vector_indexes["emb"].trained
        db.flush()
        db.close()
        # reopen single-device: stays IVF with config intact
        db2 = ToStoreTPU(DataStoreConfig(db_path=str(tmp_path)))
        idx = db2.engine._table("docs").vector_indexes["emb"]
        assert idx.index_type == "ivf" and idx.nprobe == 6 and idx.trained
        assert db2.vector_search("docs", "emb", vecs[42], top_k=1)[0].primary_key == 43
        db2.flush()
        db2.close()
        # and back onto a mesh
        db3 = ToStoreTPU(DataStoreConfig(db_path=str(tmp_path), mesh_shape=(1, 8)))
        idx = db3.engine._table("docs").vector_indexes["emb"]
        assert idx.index_type == "sharded_ivf" and idx.nprobe == 6 and idx.trained
        assert db3.vector_search("docs", "emb", vecs[42], top_k=1)[0].primary_key == 43
        db3.close()

    def test_compaction_restripes(self, db, rng):
        vecs = rng.standard_normal((120, 32)).astype(np.float32)
        db.batch_insert("docs", [{"title": f"d{i}", "emb": vecs[i].tolist()} for i in range(120)])
        db.engine._table("docs").flush_vectors()
        idx = db.engine._table("docs").vector_indexes["emb"]
        db.delete("docs").where("id", "<=", 30).execute()
        db.engine._table("docs").flush_vectors()
        assert idx.deleted_count == 30
        assert idx.maybe_compact(0.10)
        assert idx.deleted_count == 0 and len(idx) == 90
        hit = db.vector_search("docs", "emb", vecs[99], top_k=1)[0]
        assert hit.primary_key == 100


class TestShardedEngineMaintenance:
    """Engine-level background maintenance over mesh indexes: the 4x-growth
    retrain and tombstone compaction run through run_vector_maintenance
    (off-lock RCU), never inline on the write path."""

    def _ivf_db(self):
        from tostore_tpu.models.schema import VectorIndexConfig, VectorIndexType
        import dataclasses

        schema = dataclasses.replace(
            docs_schema(16),
            indexes=(
                IndexSchema(
                    fields=("emb",), type="vector",
                    vector_config=VectorIndexConfig(
                        index_type=VectorIndexType.ivf, num_clusters=8,
                        nprobe=8,
                    ),
                ),
            ),
        )
        return ToStoreTPU(DataStoreConfig(mesh_shape=(2, 4)), schemas=[schema])

    def test_background_retrain(self, rng):
        db = self._ivf_db()
        try:
            x = rng.standard_normal((2400, 16)).astype(np.float32)
            vi = db.engine._table("docs").vector_indexes["emb"]
            assert vi.index_type == "sharded_ivf"
            vi.min_train_size = 100  # train on the small initial batch
            db.batch_insert("docs", [
                {"title": f"d{i}", "emb": x[i].tolist()} for i in range(300)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush + train
            assert vi.defer_retrain and vi.trained
            db.batch_insert("docs", [
                {"title": f"d{i}", "emb": x[i].tolist()}
                for i in range(300, 2400)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush, no stall
            assert vi.needs_retrain()
            assert db.engine.run_vector_maintenance() == 1
            assert not vi.needs_retrain()
            assert db.engine._counters["background_retrains"] == 1
            hit = db.vector_search("docs", "emb", x[1234], top_k=1)[0]
            assert hit.primary_key == 1235
        finally:
            db.close()

    def test_background_compaction(self, rng):
        db = self._ivf_db()
        try:
            x = rng.standard_normal((800, 16)).astype(np.float32)
            vi0 = db.engine._table("docs").vector_indexes["emb"]
            vi0.min_train_size = 100  # train on the small initial batch
            db.batch_insert("docs", [
                {"title": f"d{i}", "emb": x[i].tolist()} for i in range(800)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)
            for pk in range(1, 300):
                db.delete_by_pk("docs", pk)
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush deletes
            vi = db.engine._table("docs").vector_indexes["emb"]
            assert vi.needs_compact(0.10)
            assert db.engine.run_vector_maintenance() == 1
            assert vi.deleted_count == 0
            assert db.engine._counters["background_compactions"] == 1
            hit = db.vector_search("docs", "emb", x[500], top_k=1)[0]
            assert hit.primary_key == 501
        finally:
            db.close()


class TestShardedBackupRestore:
    def test_mesh_backup_restore_and_topology_migration(self, rng, tmp_path):
        """Backup a mesh-sharded engine, restore into another mesh engine
        AND into a single-device engine (cross-topology via backup)."""
        from tostore_tpu.models.schema import (
            VectorIndexConfig, VectorIndexType,
        )
        import dataclasses

        schema = dataclasses.replace(
            docs_schema(16),
            indexes=(IndexSchema(fields=("emb",), type="vector",
                                 vector_config=VectorIndexConfig(
                                     index_type=VectorIndexType.ivf,
                                     num_clusters=8, nprobe=8,
                                     pq_subspaces=8)),),
        )
        x = rng.standard_normal((600, 16)).astype(np.float32)
        cfg = DataStoreConfig(mesh_shape=(2, 4))
        db = ToStoreTPU.open(str(tmp_path / "db"), schemas=[schema], config=cfg)
        vi = db.engine._table("docs").vector_indexes["emb"]
        vi.min_train_size = 100
        db.batch_insert("docs", [
            {"id": i + 1, "title": f"d{i}", "emb": x[i].tolist()}
            for i in range(600)
        ])
        db.vector_search("docs", "emb", x[0], top_k=1)
        path = db.backup(str(tmp_path / "b.zip"))
        db.close()

        db2 = ToStoreTPU.open(str(tmp_path / "db2"), schemas=[schema], config=cfg)
        db2.restore(path)
        assert db2.vector_search("docs", "emb", x[42], top_k=1)[0].primary_key == 43
        assert db2.engine._table("docs").vector_indexes["emb"].index_type == "sharded_ivf"
        db2.close()

        db3 = ToStoreTPU.open(str(tmp_path / "db3"), schemas=[schema])
        db3.restore(path)
        assert db3.vector_search("docs", "emb", x[42], top_k=1)[0].primary_key == 43
        db3.close()
