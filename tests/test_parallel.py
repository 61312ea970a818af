"""Multi-chip tests on the 8-device virtual CPU mesh (conftest forces
jax_num_cpu_devices=8): sharded search parity vs single-device oracle,
data-parallel k-means, driver entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tostore_tpu.ops import distance as D
from tostore_tpu.parallel import (
    ShardedFlatIndex,
    make_mesh,
    sharded_flat_topk,
    sharded_kmeans_step,
)
from tostore_tpu.parallel.mesh import corpus_sharding, query_sharding
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, dp=2)


class TestShardedTopk:
    def test_parity_with_oracle(self, mesh, rng):
        n, d, b, k = 4096, 64, 4, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        corpus = jax.device_put(jnp.asarray(x), corpus_sharding(mesh))
        qj = jax.device_put(jnp.asarray(q), query_sharding(mesh))
        bias = jax.device_put(jnp.zeros(n), NamedSharding(mesh, P("shard")))
        s, i = sharded_flat_topk(qj, corpus, bias, k=k, mesh=mesh)
        ref = np.argsort(-(q @ x.T), axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(i), ref)

    def test_tombstones_respected(self, mesh, rng):
        n, d, k = 2048, 64, 5
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = x[100:101]
        valid = np.ones(n, bool)
        valid[100] = False
        corpus = jax.device_put(jnp.asarray(x), corpus_sharding(mesh))
        bias = jax.device_put(
            D.make_bias("dot", None, jnp.asarray(valid)), NamedSharding(mesh, P("shard"))
        )
        qj = jax.device_put(jnp.asarray(np.repeat(q, 2, 0)), query_sharding(mesh))
        _, i = sharded_flat_topk(qj, corpus, bias, k=k, mesh=mesh)
        assert 100 not in np.asarray(i)


class TestShardedKmeans:
    def test_matches_single_device(self, mesh, rng):
        n, d, c = 4096, 32, 8
        x = rng.standard_normal((n, d)).astype(np.float32)
        cents0 = x[:c].copy()
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(("dp", "shard"), None)))
        vs = jax.device_put(jnp.ones(n, jnp.bool_), NamedSharding(mesh, P(("dp", "shard"))))
        cj = jax.device_put(jnp.asarray(cents0), NamedSharding(mesh, P()))
        new = np.asarray(sharded_kmeans_step(xs, cj, vs, mesh=mesh))
        # single-device oracle
        d2 = ((x[:, None, :] - cents0[None]) ** 2).sum(-1)
        assign = d2.argmin(1)
        ref = np.stack(
            [x[assign == j].mean(0) if (assign == j).any() else cents0[j] for j in range(c)]
        )
        np.testing.assert_allclose(new, ref, rtol=1e-4, atol=1e-4)


class TestShardedIndex:
    def test_search_and_mutation(self, mesh, rng):
        idx = ShardedFlatIndex(48, mesh, metric="l2")
        x = rng.standard_normal((700, 48)).astype(np.float32)
        idx.upsert(list(range(700)), x)
        assert len(idx) == 700
        d, pks = idx.search_arrays(x[321], k=3)
        assert pks[0][0] == 321 and d[0][0] == pytest.approx(0.0, abs=1e-2)
        idx.delete([321])
        _, pks = idx.search_arrays(x[321], k=1)
        assert pks[0][0] != 321
        # growth across capacity blocks keeps data intact
        x2 = rng.standard_normal((3000, 48)).astype(np.float32)
        idx.upsert(list(range(1000, 4000)), x2)
        _, pks = idx.search_arrays(x2[7], k=1)
        assert pks[0][0] == 1007

    def test_batch_queries_parity(self, mesh, rng):
        idx = ShardedFlatIndex(32, mesh, metric="cosine")
        x = rng.standard_normal((512, 32)).astype(np.float32)
        idx.upsert(list(range(512)), x)
        q = rng.standard_normal((6, 32)).astype(np.float32)
        _, pks = idx.search_arrays(q, k=5)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = np.argsort(-(qn @ xn.T), axis=1)[:, :5]
        for row, rref in zip(pks, ref):
            assert len(set(row) & set(rref.tolist())) >= 4


class TestShardedIVFSlices:
    def test_skewed_clusters_recall(self, mesh, rng):
        # hard clustered data with more natural modes than centroids: the
        # sliced layout must keep every row in its true nearest cluster
        # (regression for the capped 2nd/3rd-choice spill recall ceiling)
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        nat, d, n, c, k = 40, 32, 8000, 16, 10
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 4
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d)) * 0.5).astype(np.float32)
        idx = ShardedIVFIndex(d, mesh, metric="l2", num_clusters=c, nprobe=6,
                              min_train_size=100)
        idx.upsert(list(range(n)), x)
        assert idx.trained
        # fat natural clusters forced slicing
        assert idx.centroids_exp.shape[0] > c
        q = x[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(np.float32) * 0.05
        d2 = np.sum((q[:, None, :] - x[None]) ** 2, axis=-1)
        ex = np.argsort(d2, axis=1)[:, :k]
        hits = 0
        for bi in range(8):
            got = {r.primary_key for r in idx.search(q[bi], top_k=k, nprobe=6)}
            hits += len(got & set(ex[bi].tolist()))
        assert hits / (8 * k) >= 0.9

    def test_sharded_residual_pq_recall_and_persistence(self, mesh, rng):
        # IVFADC on the mesh: per-shard residual codes + per-(query, probe)
        # ADC tables + local exact re-rank + all_gather merge
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        nat, d, n, c, k = 40, 32, 8000, 16, 10
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 4
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d)) * 0.5).astype(np.float32)
        idx = ShardedIVFIndex(d, mesh, metric="l2", num_clusters=c, nprobe=6,
                              min_train_size=100, pq_subspaces=8)
        idx.upsert(list(range(n)), x)
        assert idx.trained and idx.pq is not None and idx.codes is not None
        q = x[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(np.float32) * 0.05
        d2 = np.sum((q[:, None, :] - x[None]) ** 2, axis=-1)
        ex = np.argsort(d2, axis=1)[:, :k]
        hits = 0
        for bi in range(8):
            got = {r.primary_key for r in idx.search(q[bi], top_k=k, nprobe=6)}
            hits += len(got & set(ex[bi].tolist()))
        assert hits / (8 * k) >= 0.85
        # incremental append keeps codes fresh
        xq = centers[7] + rng.standard_normal(d).astype(np.float32) * 0.1
        idx.upsert([90_000], xq[None].astype(np.float32))
        assert idx.search(xq, top_k=1, nprobe=6)[0].primary_key == 90_000
        # persistence round-trip keeps residual-PQ search working
        idx2 = ShardedIVFIndex.from_state_dict(idx.state_dict(), mesh)
        assert idx2.pq is not None
        assert idx2.search(xq, top_k=1, nprobe=6)[0].primary_key == 90_000

    def test_incremental_append_lands_in_slices(self, mesh, rng):
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        d, n = 16, 2000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = ShardedIVFIndex(d, mesh, metric="l2", num_clusters=8, nprobe=8,
                              min_train_size=500)
        idx.upsert(list(range(n)), x)
        assert idx.trained
        # post-training incremental upserts go through _append_to_buckets
        x2 = rng.standard_normal((64, d)).astype(np.float32)
        idx.upsert(list(range(10_000, 10_064)), x2)
        assert idx.search(x2[17], top_k=1, nprobe=8)[0].primary_key == 10_017


class TestDriverEntrypoints:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        s, i = jax.jit(fn)(*args)
        assert s.shape == (8, 10)

    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        g.dryrun_multichip(4)


class TestShardedInt8:
    def test_flat_int8_matches_f32(self, mesh, rng):
        from tostore_tpu.parallel.sharded import ShardedFlatIndex

        n, d, k = 4000, 64, 10
        x = rng.standard_normal((n, d)).astype(np.float32) * 3  # outside [-1,1]
        i8 = ShardedFlatIndex(d, mesh, metric="l2", dtype="int8")
        i8.upsert(list(range(n)), x)
        f32 = ShardedFlatIndex(d, mesh, metric="l2", dtype="float32")
        f32.upsert(list(range(n)), x)
        q = x[rng.integers(0, n, 6)] + rng.standard_normal((6, d)).astype(np.float32) * 0.05
        d8, p8 = i8.search_arrays(q, k)
        df, pf = f32.search_arrays(q, k)
        agree = np.mean([
            len({p for p in p8[i] if p is not None} & set(pf[i])) / k
            for i in range(6)
        ])
        assert agree >= 0.9
        assert np.max(np.abs(d8[:, 0] - df[:, 0])) < 0.5  # quant tolerance
        # persistence dequantizes + re-quantizes cleanly
        i8b = ShardedFlatIndex.from_state_dict(i8.state_dict(), mesh)
        assert i8b.precision == "int8"
        _, p8b = i8b.search_arrays(q, k)
        assert {p for p in p8b[0] if p is not None} == {p for p in p8[0] if p is not None}

    def test_sharded_ivf_int8(self, mesh, rng):
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        nat, d, n, c, k = 30, 32, 6000, 16, 10
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 4
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d)) * 0.5).astype(np.float32)
        idx = ShardedIVFIndex(d, mesh, metric="l2", dtype="int8",
                              num_clusters=c, nprobe=6, min_train_size=100)
        idx.upsert(list(range(n)), x)
        assert idx.trained and idx.scales is not None
        q = x[rng.integers(0, n, 6)]
        d2 = np.sum((q[:, None, :] - x[None]) ** 2, axis=-1)
        ex = np.argsort(d2, axis=1)[:, :k]
        hits = 0
        for bi in range(6):
            got = {r.primary_key for r in idx.search(q[bi], top_k=k, nprobe=6)}
            hits += len(got & set(ex[bi].tolist()))
        assert hits / (6 * k) >= 0.8

    def test_sharded_ivf_int8_pq(self, mesh, rng):
        from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex

        d, n = 32, 4000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = ShardedIVFIndex(d, mesh, metric="l2", dtype="int8",
                              num_clusters=8, nprobe=8, min_train_size=100,
                              pq_subspaces=8)
        idx.upsert(list(range(n)), x)
        assert idx.pq is not None
        assert idx.search(x[42], top_k=1, nprobe=8)[0].primary_key == 42

    def test_int8_compact_preserves_scales(self, mesh, rng):
        # review regression: compact re-quantized raw int8 codes as if they
        # were true values, resetting every per-vector scale to ~1.0
        from tostore_tpu.parallel.sharded import ShardedFlatIndex

        n, d = 2000, 32
        x = rng.standard_normal((n, d)).astype(np.float32) * 3
        idx = ShardedFlatIndex(d, mesh, metric="l2", dtype="int8")
        idx.upsert(list(range(n)), x)
        idx.delete(list(range(500)))
        d0, p0 = idx.search_arrays(x[1000], k=1)
        assert p0[0][0] == 1000 and d0[0][0] < 3.0
        idx.compact()
        d1, p1 = idx.search_arrays(x[1000], k=1)
        assert p1[0][0] == 1000 and d1[0][0] < 3.0
