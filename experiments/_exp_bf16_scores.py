"""Experiment: does a bf16 score tile close the B=256 lane-scan gap?

The B>=128 ceiling analysis (ops/topk.py) attributes the lane scan's
1.9x-of-floor time at B=256 to the f32 score tile ([256, 32768] =
33.5 MB/chunk) that XLA materializes between the matmul and the per-lane
reductions. Casting the tile to bf16 in the matmul epilogue halves that
traffic; selection then runs on bf16-rounded scores, and the winners'
exact f32 scores are recovered by re-scoring the k selected rows.

Run on the real TPU: python _exp_bf16_scores.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tostore_tpu.ops.runtime import LANE, NEG_INF
from tostore_tpu.ops.topk import _lane_chunk_for, flat_topk_lane


@functools.partial(jax.jit, static_argnames=("k", "alpha", "ch", "sdt"))
def lane_scan_sdt(q, corpus, bias, *, k, alpha=1.0, ch=None, sdt=jnp.bfloat16):
    """flat_topk_lane with the score tile cast to `sdt` before selection.
    Candidate scores are carried in sdt; the final top-k re-scores the
    selected rows in f32 (exact returned scores)."""
    b, d = q.shape
    n = corpus.shape[0]
    if ch is None:
        ch = _lane_chunk_for(b, n)
    qc = q.astype(corpus.dtype)

    def chunk_cands(cblk, bblk, off):
        s = jnp.dot(qc, cblk.T, preferred_element_type=jnp.float32)
        s = (alpha * s + bblk[None, :]).astype(sdt)
        r = s.shape[1] // LANE
        s3 = s.reshape(b, r, LANE)
        lane = jnp.arange(LANE, dtype=jnp.int32)[None, :]
        m1 = jnp.max(s3, axis=1)
        a1 = jnp.argmax(s3, axis=1).astype(jnp.int32)
        g1 = off + a1 * LANE + lane
        mask = jax.nn.one_hot(a1, r, axis=1, dtype=jnp.bool_)
        s3b = jnp.where(mask, jnp.asarray(NEG_INF, sdt), s3)
        m2 = jnp.max(s3b, axis=1)
        a2 = jnp.argmax(s3b, axis=1).astype(jnp.int32)
        g2 = off + a2 * LANE + lane
        return jnp.concatenate([m1, m2], 1), jnp.concatenate([g1, g2], 1)

    nch = n // ch
    offs = jnp.arange(nch, dtype=jnp.int32) * ch
    cr = corpus.reshape(nch, ch, d)
    br = bias.reshape(nch, ch)

    def body(carry, inp):
        cblk, bblk, off = inp
        return carry, chunk_cands(cblk, bblk, off)

    _, (ss, ii) = jax.lax.scan(body, 0, (cr, br, offs))
    flat_s = ss.transpose(1, 0, 2).reshape(b, -1)
    flat_i = ii.transpose(1, 0, 2).reshape(b, -1)
    _, pos = jax.lax.top_k(flat_s.astype(jnp.float32), k)
    top_i = jnp.take_along_axis(flat_i, pos, axis=1)
    # exact f32 re-score of the winners: [b, k, d] gather + einsum
    rows = corpus[top_i]  # [b, k, d]
    exact = jnp.einsum(
        "bd,bkd->bk", qc.astype(jnp.float32), rows.astype(jnp.float32)
    ) * alpha + bias[top_i]
    # re-sort by exact scores (bf16 selection order may differ)
    srt = jnp.argsort(-exact, axis=1)
    return jnp.take_along_axis(exact, srt, 1), jnp.take_along_axis(top_i, srt, 1)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))  # real sync (tunnel)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))
    return (time.time() - t0) / iters * 1e3


def main():
    n, d, b, k = 1003520 // 1003520 * 1048576, 768, 256, 10
    # keep N a multiple of every chunk size candidate
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, d)), np.float32)

    ms_f32 = bench(
        functools.partial(flat_topk_lane, k=k), q, corpus, bias
    )
    print(f"lane f32 scores   B={b}: {ms_f32:.2f} ms  ({b/ms_f32*1e3:.0f} QPS)")

    ms_bf16 = bench(
        functools.partial(lane_scan_sdt, k=k, sdt=jnp.bfloat16), q, corpus, bias
    )
    print(f"lane bf16 scores  B={b}: {ms_bf16:.2f} ms  ({b/ms_bf16*1e3:.0f} QPS)")

    # agreement check vs exact
    from tostore_tpu.ops.topk import flat_topk_xla
    es, ei = flat_topk_xla(q, corpus, bias, 1.0, k)
    bs, bi = lane_scan_sdt(q, corpus, bias, k=k)
    agree = np.mean([
        len(set(np.asarray(ei[i]).tolist()) & set(np.asarray(bi[i]).tolist())) / k
        for i in range(b)
    ])
    serr = float(jnp.max(jnp.abs(bs - es)))
    print(f"top-{k} agreement vs exact: {agree:.4f}; max |score err| of kept rows: {serr:.2e}")

    # also B=128
    q128 = q[:128]
    ms_f32_128 = bench(functools.partial(flat_topk_lane, k=k), q128, corpus, bias)
    ms_bf16_128 = bench(
        functools.partial(lane_scan_sdt, k=k, sdt=jnp.bfloat16), q128, corpus, bias
    )
    print(f"B=128: f32 {ms_f32_128:.2f} ms | bf16 {ms_bf16_128:.2f} ms")


if __name__ == "__main__":
    main()
