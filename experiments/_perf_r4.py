"""Round-4 perf session: (a) B>=128 compute-regime scan — lane vs
grouped-emit Pallas; (b) IVF probe vs flat crossover for the large-batch
dispatch rule. Run alone on the TPU."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30, trials=3):
    r = fn(*args)
    float(jnp.asarray(r[0][(0,) * r[0].ndim], jnp.float32))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        float(jnp.asarray(r[0][(0,) * r[0].ndim], jnp.float32))
        best = min(best, (time.time() - t0) / reps)
    return best


def part_a():
    from tostore_tpu.ops import topk as T

    n, d, k = 1_048_576, 768, 10
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    for b in (128, 256):
        q = jax.random.normal(jax.random.PRNGKey(b), (b, d), jnp.float32)
        lane = jax.jit(lambda q, c, bb: T.flat_topk_lane(q, c, bb, k=k))
        per = timeit(lane, q, corpus, bias)
        print(f"B={b} lane(XLA):          {per*1e3:7.2f} ms  {b/per:8.0f} QPS", flush=True)
        for gsz_label, gsz in (("auto", None), (8, 8), (16, 16), (32, 32), (61, 61)):
            try:
                ge = jax.jit(lambda q, c, bb, g=gsz: T._fused_group_emit(
                    q, c, bb, k=k, alpha=1.0, blk_n=2048, gsz=g))
                per = timeit(ge, q, corpus, bias)
                print(f"B={b} group(gsz={gsz_label}):     {per*1e3:7.2f} ms  {b/per:8.0f} QPS", flush=True)
            except Exception as e:
                print(f"B={b} group(gsz={gsz_label}): FAIL {repr(e)[:120]}", flush=True)
        # per-block emit (the current Pallas B>32 path)
        try:
            em = jax.jit(lambda q, c, bb: T._fused_block_emit(
                q, c, bb, k=k, alpha=1.0, blk_n=2048))
            per = timeit(em, q, corpus, bias)
            print(f"B={b} emit(blk2048):     {per*1e3:7.2f} ms  {b/per:8.0f} QPS", flush=True)
        except Exception as e:
            print(f"B={b} emit: FAIL {repr(e)[:120]}", flush=True)
        # matmul-only floor (no selection): one pass, summed
        mm = jax.jit(lambda q, c: (jnp.einsum(
            "bd,nd->b", q.astype(jnp.bfloat16), c,
            preferred_element_type=jnp.float32)[:, None],))
        per = timeit(mm, q, corpus)
        print(f"B={b} matmul-only floor:  {per*1e3:7.2f} ms", flush=True)


def part_b():
    """IVF probe vs flat at growing B on 500k x 768 (BENCH config #8
    conditions: C=1024 sliced, nprobe=16, bf16)."""
    from tostore_tpu.vector.ivf import IVFVectorIndex, _ivf_probe_scan_contig
    from tostore_tpu.ops import topk as T
    from tostore_tpu.ops.runtime import round_up

    n = round_up(500_000, 4096)
    d = 768
    idx = IVFVectorIndex(d, metric="l2", precision="bfloat16",
                         num_clusters=1024, nprobe=16)
    c = idx.corpus
    c._ensure_capacity(n)
    vecs = jax.random.normal(jax.random.PRNGKey(0), (n, c.d_pad), jnp.bfloat16)
    c.vectors = vecs
    c.valid = jnp.ones(n, jnp.bool_)
    c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
    c._slot_pks[:n] = np.arange(n, dtype=object)
    c._pk_slot = {i: i for i in range(n)}
    c._high = n
    idx.train(force=True)
    print("ivf trained", flush=True)
    bias = jnp.zeros(n, jnp.float32)
    norms = c.sq_norms

    flat = jax.jit(lambda qq, cv, bb: T.flat_search(qq, cv, bb, k=10, alpha=2.0))
    neg_norms = -norms
    for b in (8, 32, 64, 128, 256):
        q = jax.random.normal(jax.random.PRNGKey(b), (b, c.d_pad), jnp.float32)

        def probe(qq):
            return _ivf_probe_scan_contig(
                qq, idx.centroids_exp, idx.slice_bias, idx.buckets_slots,
                idx.bucket_vectors, idx.bucket_scales, idx.bucket_bias,
                norms, 2.0, nprobe=16, k=10)

        p_per = timeit(probe, q, reps=20)
        print(f"B={b:4d}  probe {p_per*1e3:7.2f} ms ({b/p_per:8.0f} QPS)", flush=True)
        f_per = timeit(flat, q, c.vectors, neg_norms, reps=20)
        print(f"B={b:4d}  flat-auto {f_per*1e3:7.2f} ms ({b/f_per:8.0f} QPS)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    print("device:", jax.devices()[0], flush=True)
    if "a" in which:
        part_a()
    if "b" in which:
        part_b()
