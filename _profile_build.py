"""Stage-by-stage profile of the warm IVF build (BENCH config #3 shape)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from tostore_tpu.vector.ivf import (
    IVFVectorIndex, _ivf_assign_device, _place_and_contig, _expand_centroids,
)
from tostore_tpu.vector.pq import _kmeans_all_subspaces
from tostore_tpu.ops.runtime import round_up

def sync(x):
    # scalar-element readback: forces the producer to finish without
    # astype-copying the array (which both OOMs and recompiles per shape)
    if x is not None:
        float(jnp.asarray(x[(0,) * x.ndim], jnp.float32))

print("backend:", jax.default_backend(), flush=True)
n = round_up(1_000_000, 4096)
d = 768
idx = IVFVectorIndex(d, metric="l2", precision="bfloat16", num_clusters=1024, nprobe=16)
c = idx.corpus
c._ensure_capacity(n)
vecs = jax.random.normal(jax.random.PRNGKey(0), (n, c.d_pad), jnp.bfloat16)
c.vectors = vecs
c.valid = jnp.ones(n, jnp.bool_)
c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
c._slot_pks[:n] = np.arange(n, dtype=object)
c._pk_slot = {i: i for i in range(n)}
c._high = n
float(jnp.sum(c.sq_norms))

# cold full build to populate compile caches
t0 = time.time(); idx.train(force=True)
float(jnp.sum(idx.buckets_slots.astype(jnp.float32)))
print(f"cold build {time.time()-t0:.2f}s", flush=True)
t0 = time.time(); idx.train(force=True)
float(jnp.sum(idx.buckets_slots.astype(jnp.float32)))
warm = time.time()-t0
print(f"warm build {warm:.2f}s = {n*d*2/warm/1e9:.1f} GB/s", flush=True)

# --- staged warm profile -------------------------------------------------
# free the built layout so the staged copies fit in HBM
idx.bucket_vectors = None
idx.bucket_bias = None
idx.bucket_scales = None
idx.buckets_slots = None
idx._slot_dev = None
choices = counts = out = None
import gc
for rep in range(3):
    gc.collect()
    print(f"--- staged rep {rep} ---", flush=True)
    t0 = time.time()
    live = idx._live_slots()
    t1 = time.time(); print(f"  _live_slots: {t1-t0:.3f}s", flush=True)
    rng = np.random.default_rng(42)
    num_c = 1024
    sample = live if len(live) <= 65536 else rng.choice(live, 65536, replace=False)
    x = idx._stored_matrix_f32(sample)
    sync(x)
    t2 = time.time(); print(f"  sample gather: {t2-t1:.3f}s", flush=True)
    init = rng.choice(len(sample), num_c, replace=False)
    cents = _kmeans_all_subspaces(
        x[None, :, :], jnp.asarray(init[None, :], jnp.int32), k=num_c,
        iters=10, compute_dtype=jnp.bfloat16)[0]
    sync(cents)
    t3 = time.time(); print(f"  kmeans 10it: {t3-t2:.3f}s", flush=True)
    choices, counts = _ivf_assign_device(
        c.vectors, c.valid, cents, c.scales, chunk=idx.ASSIGN_CHUNK,
        l2=True)
    sync(counts)
    t4 = time.time(); print(f"  assign 1M: {t4-t3:.3f}s", flush=True)
    counts_np = np.asarray(counts, np.int64)
    t5 = time.time(); print(f"  counts readback: {t5-t4:.3f}s", flush=True)
    cap = idx._bucket_cap(len(live))
    nsl = np.maximum(1, -(-counts_np // cap))
    total = int(nsl.sum())
    c_exp = int(round_up(max(total, 8), 8))
    base = np.zeros(num_c, np.int64); base[1:] = np.cumsum(nsl)[:-1]
    sl_cl = np.full(c_exp, -1, np.int64)
    sl_cl[:total] = np.repeat(np.arange(num_c), nsl)
    ce, sb = _expand_centroids(cents, jnp.asarray(sl_cl, jnp.int32))
    sync(ce)
    t6 = time.time(); print(f"  install slices: {t6-t5:.3f}s", flush=True)
    out = _place_and_contig(
        choices[:, 0], c.valid, jnp.asarray(base, jnp.int32),
        c.vectors, c.sq_norms, cap=cap, c_exp=c_exp,
        with_vectors=True, bias_l2=True)
    sync(out[0]); sync(out[4])
    t7 = time.time(); print(f"  place+contig: {t7-t6:.3f}s", flush=True)
    scounts = np.array(out[3], np.int64)
    t8 = time.time(); print(f"  scounts readback: {t8-t7:.3f}s  TOTAL {t8-t0:.3f}s", flush=True)
print("OK", flush=True)
