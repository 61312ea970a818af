"""Kernel-level A/B: mesh (1-dev) contig probe vs single-device, on-device corpus."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tostore_tpu.parallel import make_mesh
from tostore_tpu.parallel.mesh import corpus_sharding, query_sharding
from jax.sharding import NamedSharding, PartitionSpec as P
from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex, _sharded_ivf_probe_contig
from tostore_tpu.vector.ivf import IVFVectorIndex, _ivf_probe_scan_contig
from tostore_tpu.ops import distance as D

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n, d, b, k, C, npb = 500_000 + 24_288, 768, 8, 10, 1024, 16  # 524288 = 2048*256

# single-device
sidx = IVFVectorIndex(d, metric="l2", precision="bfloat16", num_clusters=C, nprobe=npb)
c = sidx.corpus
c._ensure_capacity(n)
vecs = jax.random.normal(jax.random.PRNGKey(0), (n, c.d_pad), jnp.bfloat16)
c.vectors = vecs
c.valid = jnp.ones(n, jnp.bool_)
c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
c._slot_pks[:n] = np.arange(n, dtype=object)
c._pk_slot = {i: i for i in range(n)}
c._high = n
float(jnp.sum(c.sq_norms))
t0 = time.time(); sidx.train(force=True)
float(jnp.sum(sidx.buckets_slots.astype(jnp.float32)))
print(f"sd build {time.time()-t0:.2f}s", flush=True)
assert sidx.bucket_vectors is not None

# mesh (1 device)
mesh = make_mesh(1, dp=1)
midx = ShardedIVFIndex(d, mesh, metric="l2", dtype="bfloat16", num_clusters=C, nprobe=npb)
midx._ensure_capacity(n)
cap = midx.capacity
mv = jnp.zeros((cap, midx.d_pad), jnp.bfloat16).at[:n].set(vecs)
midx.vectors = jax.device_put(mv, corpus_sharding(mesh))
midx.valid = jax.device_put(jnp.arange(cap) < n, NamedSharding(mesh, P("shard")))
midx.sq_norms = jax.device_put(
    jnp.pad(c.sq_norms[:n], (0, cap - n)), NamedSharding(mesh, P("shard")))
midx._slot_pks = np.empty(cap, dtype=object); midx._slot_pks[:n] = np.arange(n, dtype=object)
midx._pk_slot = {i: i for i in range(n)}
midx._shard_fill[:] = 0; midx._shard_fill[0] = n
float(jnp.sum(midx.sq_norms))
t0 = time.time(); midx.train(force=True)
float(jnp.sum(midx.buckets.astype(jnp.float32)))
print(f"mesh build {time.time()-t0:.2f}s", flush=True)
assert midx.bucket_vectors is not None

q = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (b, c.d_pad), jnp.float32))
alpha = 2.0
qj_s = jnp.asarray(q)
def sd_call():
    return _ivf_probe_scan_contig(
        qj_s, sidx.centroids_exp, sidx.slice_bias, sidx.buckets_slots,
        sidx.bucket_vectors, sidx.bucket_scales, sidx.bucket_bias,
        c.sq_norms, alpha, nprobe=npb, k=k)
qj_m = jax.device_put(jnp.asarray(q), query_sharding(mesh))
def mesh_call():
    return _sharded_ivf_probe_contig(
        qj_m, midx.centroids_exp, midx.slice_bias, midx.buckets,
        midx.bucket_vectors, None, midx.bucket_bias, alpha,
        nprobe=npb, k=k, l2=True, has_scales=False,
        rps=midx._rows_per_shard(), mesh=mesh)

res = {}
for name, call in (("sd", sd_call), ("mesh", mesh_call)):
    s, i = call(); float(jnp.sum(s))  # warm/compile
    t0 = time.time()
    outs = [call() for _ in range(50)]
    float(jnp.sum(outs[-1][0]))
    ms = (time.time()-t0)/50*1000
    res[name] = ms
    print(f"{name} contig probe kernel: {ms:.3f} ms / {b} queries", flush=True)
print(f"ratio mesh/sd: {res['mesh']/res['sd']:.3f}", flush=True)
s_s, i_s = sd_call(); s_m, i_m = mesh_call()
i_s, i_m = np.asarray(i_s), np.asarray(i_m)
ov = np.mean([len(set(i_s[j].tolist()) & set(i_m[j].tolist()))/k for j in range(b)])
print(f"slot overlap sd vs mesh: {ov:.3f}", flush=True)
print("OK", flush=True)
