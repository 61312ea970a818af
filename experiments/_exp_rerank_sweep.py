"""Rerank-pool sweep for IVF-PQ (VERDICT r4 #4): recall@10 + probe latency
vs pool size on the BENCH #8 shape (500k x 768 bf16, hard clustered,
C=1024, nprobe=16). Output feeds the auto-pool default + BENCH #8 curve."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tostore_tpu.ops.runtime import round_up
from tostore_tpu.ops.topk import flat_search
from tostore_tpu.vector.ivf import IVFVectorIndex, _ivf_probe_scan_pq_contig


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *a, reps=20):
    out = fn(*a)
    sync(out[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    sync(out[0])
    return (time.time() - t0) / reps * 1e3


def recall_at_k(slots, exact):
    hit = sum(
        len(set(map(int, s)) & set(map(int, e))) for s, e in zip(slots, exact)
    )
    return hit / exact.size


n = round_up(500_000, 4096)
d, k = 768, 10
cents = jax.random.normal(jax.random.PRNGKey(0), (2000, d), jnp.float32) * 3
assign = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 2000)
vecs = (
    cents[assign] + jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
).astype(jnp.bfloat16)


def mk(pq_m, pq_k=256):
    idx = IVFVectorIndex(
        d, metric="l2", precision="bfloat16", num_clusters=1024, nprobe=16,
        pq_subspaces=pq_m, pq_centroids=pq_k, rerank_factor=4,
        min_train_size=100,
    )
    c = idx.corpus
    c._ensure_capacity(n)
    c.vectors = vecs
    c.valid = jnp.ones(n, jnp.bool_)
    c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
    c._slot_pks[:n] = np.arange(n, dtype=object)
    c._pk_slot = {i: i for i in range(n)}
    c._high = n
    idx.train(force=True)
    return idx


rng = np.random.default_rng(5)
NQ = 256  # recall measured over many queries; latency at B=8
qi = rng.integers(0, n, NQ)
q = np.asarray(vecs[jnp.asarray(qi)].astype(jnp.float32)) + rng.standard_normal(
    (NQ, d)
).astype(np.float32) * 0.1
qj = jnp.asarray(q)

# exact oracle in chunks of 64
ex = []
for lo in range(0, NQ, 64):
    _, i_ex = flat_search(
        qj[lo : lo + 64],
        vecs,
        -jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1),
        k=k,
        alpha=2.0,
    )
    ex.append(np.asarray(i_ex))
ex = np.concatenate(ex)

for pq_m, pq_k, tag in ((96, 256, "adc8"), (192, 16, "adc4")):
    idx = mk(pq_m, pq_k)
    c = idx.corpus
    for pool in (160, 512, 1024, 2048, 4096, 8192):
        def probe(qq, pool=pool):
            return _ivf_probe_scan_pq_contig(
                qq, qq[:, :d], idx.centroids_exp, idx.centroids_exp[:, :d],
                idx.slice_bias, idx.buckets_slots, idx.bucket_codes,
                idx.pq.codebooks, c.vectors, c.scales, idx.bucket_bias,
                c.sq_norms, 2.0,
                nprobe=16, k=k, rerank=pool, adc_metric="l2",
                residual=idx.pq_residual,
            )

        # recall over all NQ (chunks of 64), latency at B=8
        slots = []
        for lo in range(0, NQ, 64):
            _, sl = probe(qj[lo : lo + 64])
            slots.append(np.asarray(sl))
        rec = recall_at_k(np.concatenate(slots), ex)
        ms = timeit(probe, qj[:8])
        print(
            f"{tag} pool={pool:5d}: recall@10={rec:.4f} probe_b8={ms:.2f} ms",
            flush=True,
        )
