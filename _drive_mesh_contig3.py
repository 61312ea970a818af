"""Same-index contig vs gather parity on real TPU (definitive correctness)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tostore_tpu.parallel import make_mesh
from tostore_tpu.parallel.mesh import corpus_sharding, query_sharding
from jax.sharding import NamedSharding, PartitionSpec as P
from tostore_tpu.parallel.sharded_ivf import (
    ShardedIVFIndex, _sharded_ivf_probe_contig, _sharded_ivf_probe,
)

print("backend:", jax.default_backend(), flush=True)
n, d, b, k, C, npb = 524_288, 768, 8, 10, 1024, 16
mesh = make_mesh(1, dp=1)
midx = ShardedIVFIndex(d, mesh, metric="l2", dtype="bfloat16", num_clusters=C, nprobe=npb)
midx._ensure_capacity(n)
cap = midx.capacity
vecs = jax.random.normal(jax.random.PRNGKey(0), (cap, midx.d_pad), jnp.bfloat16)
midx.vectors = jax.device_put(vecs, corpus_sharding(mesh))
midx.valid = jax.device_put(jnp.arange(cap) < n, NamedSharding(mesh, P("shard")))
midx.sq_norms = jax.device_put(
    jnp.where(jnp.arange(cap) < n, jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1), 0.0),
    NamedSharding(mesh, P("shard")))
midx._slot_pks = np.empty(cap, dtype=object); midx._slot_pks[:n] = np.arange(n, dtype=object)
midx._pk_slot = {i: i for i in range(n)}
midx._shard_fill[:] = 0; midx._shard_fill[0] = n
t0 = time.time(); midx.train(force=True)
float(jnp.sum(midx.buckets.astype(jnp.float32)))
print(f"mesh build {time.time()-t0:.2f}s", flush=True)
assert midx.bucket_vectors is not None

q = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (b, midx.d_pad), jnp.float32))
alpha = 2.0
qj = jax.device_put(jnp.asarray(q), query_sharding(mesh))
s_c, i_c = _sharded_ivf_probe_contig(
    qj, midx.centroids_exp, midx.slice_bias, midx.buckets,
    midx.bucket_vectors, None, midx.bucket_bias, alpha,
    nprobe=npb, k=k, l2=True, has_scales=False,
    rps=midx._rows_per_shard(), mesh=mesh)
s_g, i_g = _sharded_ivf_probe(
    qj, midx.centroids_exp, midx.slice_bias, midx.buckets,
    midx.vectors, midx.valid, midx.valid, midx.sq_norms, alpha,
    nprobe=npb, k=k, has_scales=False, mesh=mesh)
i_c, i_g = np.asarray(i_c), np.asarray(i_g)
s_c, s_g = np.asarray(s_c), np.asarray(s_g)
ov = np.mean([len(set(i_c[j].tolist()) & set(i_g[j].tolist()))/k for j in range(b)])
print(f"same-index contig vs gather top-{k} overlap: {ov:.3f}", flush=True)
print("max |score diff| (sorted):", float(np.max(np.abs(np.sort(s_c,1)-np.sort(s_g,1)))), flush=True)

# also time the gather probe for the BENCH_REPORT comparison
def g_call():
    return _sharded_ivf_probe(
        qj, midx.centroids_exp, midx.slice_bias, midx.buckets,
        midx.vectors, midx.valid, midx.valid, midx.sq_norms, alpha,
        nprobe=npb, k=k, has_scales=False, mesh=mesh)
s, i = g_call(); float(jnp.sum(s))
t0 = time.time()
outs = [g_call() for _ in range(50)]
float(jnp.sum(outs[-1][0]))
print(f"mesh GATHER probe: {(time.time()-t0)/50*1000:.3f} ms / {b} queries", flush=True)
print("OK", flush=True)
