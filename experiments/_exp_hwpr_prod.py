"""Measure the production flat_topk_hwpr (ops/topk.py, mode='fast') on the
1M x 768 bf16 headline shape: speed for kc in {32, 64, 128} at B=128/256
(default chunking), plus a tight recall estimate (4096 queries) for the
candidate default configs. Run alone on the real TPU."""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from tostore_tpu.ops.topk import flat_topk_hwpr, flat_topk_lane, flat_topk_xla, _hwpr_chunk_for


def bench(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.sum(out[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0]))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    n, d, k = 1003520, 768, 10
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    rng = np.random.default_rng(0)

    for b in (128, 256):
        print(f"B={b} default ch={_hwpr_chunk_for(b, n)}", flush=True)
        q = jnp.asarray(rng.standard_normal((b, d)), np.float32)
        es, ei = flat_topk_xla(q, corpus, bias, 1.0, k)
        ms = bench(functools.partial(flat_topk_lane, k=k), q, corpus, bias)
        print(f"  lane:    {ms:6.2f} ms ({b/ms*1e3:6.0f} QPS)", flush=True)
        for kc in (32, 64, 128):
            fn = functools.partial(flat_topk_hwpr, k=k, kc=kc)
            ms = bench(fn, q, corpus, bias)
            _, xi = fn(q, corpus, bias)
            r = float(np.mean([
                len(set(np.asarray(ei[i]).tolist()) & set(np.asarray(xi[i]).tolist())) / k
                for i in range(b)
            ]))
            print(f"  kc={kc:3d}: {ms:6.2f} ms ({b/ms*1e3:6.0f} QPS)  recall@10={r:.5f}", flush=True)

    # tight recall: 4096 queries x top-10 = 40960 hits
    b = 256
    tot = {32: [0, 0], 64: [0, 0]}
    for rep in range(16):
        q = jnp.asarray(rng.standard_normal((b, d)), np.float32)
        _, ei = flat_topk_xla(q, corpus, bias, 1.0, k)
        eset = [set(np.asarray(ei[i]).tolist()) for i in range(b)]
        for kc in tot:
            _, xi = flat_topk_hwpr(q, corpus, bias, k=k, kc=kc)
            xin = np.asarray(xi)
            for i in range(b):
                tot[kc][0] += len(eset[i] & set(xin[i].tolist()))
                tot[kc][1] += k
        print(f"rep {rep+1}/16", flush=True)
    for kc, (hit, n_) in tot.items():
        print(f"RECALL kc={kc}: {hit}/{n_} = {hit/n_:.6f} (miss {1-hit/n_:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
