"""Real-TPU drive: mesh contig probe kernels (1-device mesh) vs single-device."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tostore_tpu.parallel import make_mesh
from tostore_tpu.parallel.sharded_ivf import ShardedIVFIndex
from tostore_tpu.vector.ivf import IVFVectorIndex

print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(0)
d, n, b, k = 256, 200_000, 8, 10
x = rng.standard_normal((n, d)).astype(np.float32)
q = x[rng.integers(0, n, b)] + rng.standard_normal((b, d)).astype(np.float32) * 0.05

mesh = make_mesh(1, dp=1)
idx = ShardedIVFIndex(d, mesh, metric="l2", dtype="bfloat16", num_clusters=256,
                      nprobe=16, min_train_size=100)
t0 = time.time(); idx.upsert(list(range(n)), x); print(f"mesh build {time.time()-t0:.2f}s")
assert idx.bucket_vectors is not None, "contig stripes not built!"
t0 = time.time(); d1, p1 = idx.search_arrays(q, k=k); print(f"mesh raw probe first (compile) {time.time()-t0:.2f}s")
for _ in range(3): d1, p1 = idx.search_arrays(q, k=k)
t0 = time.time()
for _ in range(20): d1, p1 = idx.search_arrays(q, k=k)
mesh_ms = (time.time()-t0)/20*1000
print(f"mesh raw probe {mesh_ms:.2f} ms / {b} queries")

sidx = IVFVectorIndex(d, metric="l2", precision="bfloat16", num_clusters=256,
                      nprobe=16, min_train_size=100)
sidx.upsert(list(range(n)), x)
assert sidx.bucket_vectors is not None
for _ in range(3): d2, s2, p2 = sidx.search_arrays(q, k=k)
t0 = time.time()
for _ in range(20): d2, s2, p2 = sidx.search_arrays(q, k=k)
sd_ms = (time.time()-t0)/20*1000
print(f"single-device raw probe {sd_ms:.2f} ms / {b} queries -> ratio {mesh_ms/sd_ms:.2f}x")
agree = np.mean([len(set(p1[i]) & set(p2[i])) / k for i in range(b)])
print(f"top-{k} agreement mesh vs single: {agree:.3f}")

# PQ contig on mesh
idxp = ShardedIVFIndex(d, mesh, metric="l2", dtype="bfloat16", num_clusters=256,
                       nprobe=16, min_train_size=100, pq_subspaces=32)
idxp.upsert(list(range(n)), x)
assert idxp.bucket_codes is not None, "contig ADC stripes not built!"
for _ in range(3): d3, p3 = idxp.search_arrays(q, k=k)
t0 = time.time()
for _ in range(20): d3, p3 = idxp.search_arrays(q, k=k)
print(f"mesh pq probe {(time.time()-t0)/20*1000:.2f} ms / {b} queries")
agree = np.mean([len(set(p3[i]) & set(p2[i])) / k for i in range(b)])
print(f"pq agreement vs raw: {agree:.3f}")
print("OK")
