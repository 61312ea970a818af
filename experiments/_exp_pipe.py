"""Lever (a) of VERDICT r4 #5: software-pipelined Pallas lane scan.

The group-emit kernel loses to XLA at B>=128 (7.2 vs 5.7 ms) because the
per-block VPU top-2 selection serializes against the MXU matmul in
Mosaic's pipeline. This prototype breaks the dependency: step ni writes
its biased score tile to a parity-indexed VMEM scratch and selects the
PREVIOUS step's tile, so the MXU (dot of block ni) and the VPU (top-2 of
block ni-1) have no data dependency and can overlap.

Exactness contract unchanged: per-(group, lane) top-2 buckets.
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tostore_tpu.ops.runtime import LANE, NEG_INF, round_up
from tostore_tpu.ops.topk import flat_topk_lane, flat_topk_xla


def _top2_merge(s, blk_n, n_base, acc_s_ref, acc_i_ref):
    """Per-lane top-2 of one biased score tile, merged into the running
    per-lane top-2 accumulator (same 4-way sorted merge as the group
    kernel)."""
    blk_b = s.shape[0]
    r = blk_n // LANE
    s3 = s.reshape(blk_b, r, LANE)

    best = s3[:, 0, :]
    bidx = jnp.zeros((blk_b, LANE), jnp.int32)
    for ri in range(1, r):
        v = s3[:, ri, :]
        upd = v > best
        best = jnp.where(upd, v, best)
        bidx = jnp.where(upd, ri, bidx)
    best2 = jnp.full((blk_b, LANE), NEG_INF, jnp.float32)
    bidx2 = jnp.zeros((blk_b, LANE), jnp.int32)
    for ri in range(r):
        v = jnp.where(bidx == ri, NEG_INF, s3[:, ri, :])
        upd = v > best2
        best2 = jnp.where(upd, v, best2)
        bidx2 = jnp.where(upd, ri, bidx2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk_b, LANE), 1)
    m1, g1 = best, bidx * LANE + lane + n_base
    m2, g2 = best2, bidx2 * LANE + lane + n_base

    r1, r2 = acc_s_ref[0, :, :], acc_s_ref[1, :, :]
    i1, i2 = acc_i_ref[0, :, :], acc_i_ref[1, :, :]
    w = r1 >= m1
    t1 = jnp.where(w, r1, m1)
    j1 = jnp.where(w, i1, g1)
    c2a = jnp.where(w, m1, r1)
    j2a = jnp.where(w, g1, i1)
    c2b = jnp.where(w, r2, m2)
    j2b = jnp.where(w, i2, g2)
    w2 = c2a >= c2b
    t2 = jnp.where(w2, c2a, c2b)
    j2 = jnp.where(w2, j2a, j2b)
    acc_s_ref[0, :, :] = t1
    acc_s_ref[1, :, :] = t2
    acc_i_ref[0, :, :] = j1
    acc_i_ref[1, :, :] = j2
    return t1, t2, j1, j2


def _pipe_kernel(alpha, blk_n, gsz, n_blocks, q_ref, c_ref, b_ref,
                 out_s_ref, out_i_ref, s0_ref, s1_ref, acc_s_ref, acc_i_ref):
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _():
        acc_s_ref[...] = jnp.full(acc_s_ref.shape, NEG_INF, jnp.float32)
        acc_i_ref[...] = jnp.zeros(acc_i_ref.shape, jnp.int32)

    # 1) MXU: score block ni into parity scratch (biased).
    c = c_ref[...]
    if c.dtype == jnp.int8:
        c = c.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q_ref[...], c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = alpha * s + b_ref[...]

    @pl.when(ni % 2 == 0)
    def _():
        s0_ref[...] = s

    @pl.when(ni % 2 == 1)
    def _():
        s1_ref[...] = s

    # 2) VPU: select block ni-1 from the other parity (no dep on the dot).
    def select(sel_parity, sel_block):
        tile = s0_ref[...] if sel_parity == 0 else s1_ref[...]
        return _top2_merge(tile, blk_n, sel_block * blk_n,
                           acc_s_ref, acc_i_ref)

    @pl.when((ni > 0) & (ni % 2 == 1))
    def _():
        t1, t2, j1, j2 = select(0, ni - 1)
        @pl.when(ni % gsz == 0)
        def _():
            out_s_ref[...] = jnp.concatenate([t1, t2], axis=1)
            out_i_ref[...] = jnp.concatenate([j1, j2], axis=1)
            acc_s_ref[...] = jnp.full(acc_s_ref.shape, NEG_INF, jnp.float32)
            acc_i_ref[...] = jnp.zeros(acc_i_ref.shape, jnp.int32)

    @pl.when((ni > 0) & (ni % 2 == 0))
    def _():
        t1, t2, j1, j2 = select(1, ni - 1)
        @pl.when(ni % gsz == 0)
        def _():
            out_s_ref[...] = jnp.concatenate([t1, t2], axis=1)
            out_i_ref[...] = jnp.concatenate([j1, j2], axis=1)
            acc_s_ref[...] = jnp.full(acc_s_ref.shape, NEG_INF, jnp.float32)
            acc_i_ref[...] = jnp.zeros(acc_i_ref.shape, jnp.int32)

    # 3) drain: last step also selects its own tile (serializes once).
    last_parity = (n_blocks - 1) % 2

    @pl.when(ni == n_blocks - 1)
    def _():
        t1, t2, j1, j2 = select(last_parity, ni)
        out_s_ref[...] = jnp.concatenate([t1, t2], axis=1)
        out_i_ref[...] = jnp.concatenate([j1, j2], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "alpha", "blk_n", "blk_b",
                                             "gsz"))
def pipe_topk(q, corpus, bias, *, k, alpha=1.0, blk_n=2048, blk_b=256,
              gsz=None):
    b, d = q.shape
    n = corpus.shape[0]
    n_blocks = n // blk_n
    assert n % blk_n == 0
    if gsz is None:
        gsz = max(2, n_blocks // 16)
        while n_blocks % gsz:
            gsz -= 1
    assert n_blocks % gsz == 0 and gsz >= 2
    n_groups = n_blocks // gsz
    blk_b = min(blk_b, round_up(b, 8))
    b_pad = round_up(b, blk_b)
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    q = q.astype(corpus.dtype if corpus.dtype != jnp.int8 else jnp.bfloat16)
    bias2d = bias.reshape(1, n).astype(jnp.float32)
    cw = 2 * LANE

    kernel = functools.partial(_pipe_kernel, alpha, blk_n, gsz, n_blocks)
    flat_s, flat_i = pl.pallas_call(
        kernel,
        grid=(b_pad // blk_b, n_blocks),
        in_specs=[
            pl.BlockSpec((blk_b, d), lambda bi, ni: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_n, d), lambda bi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_n), lambda bi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk_b, cw),
                         lambda bi, ni: (bi, jnp.maximum(ni - 1, 0) // gsz),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_b, cw),
                         lambda bi, ni: (bi, jnp.maximum(ni - 1, 0) // gsz),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_groups * cw), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_groups * cw), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_b, blk_n), jnp.float32),
            pltpu.VMEM((blk_b, blk_n), jnp.float32),
            pltpu.VMEM((2, blk_b, LANE), jnp.float32),
            pltpu.VMEM((2, blk_b, LANE), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d,
            bytes_accessed=corpus.size * corpus.dtype.itemsize,
            transcendentals=0,
        ),
    )(q, corpus, bias2d)

    top_s, pos = jax.lax.top_k(flat_s, k)
    top_i = jnp.take_along_axis(flat_i, pos, axis=1)
    return top_s[:b], top_i[:b]


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
    n, d = 1048576, 768
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    rng = np.random.default_rng(1)

    for b in (128, 256):
        q = jnp.asarray(rng.standard_normal((b, d)), np.float32)
        # correctness vs exact first (small iters)
        ts, ti = pipe_topk(q, corpus, bias, k=10)
        es, ei = flat_topk_xla(q, corpus, bias, 1.0, 10)
        agree = float(jnp.mean((jnp.sort(ti, 1) == jnp.sort(ei, 1)).all(1)))
        serr = float(jnp.max(jnp.abs(ts - es)))
        print(f"B={b}: idx agree={agree:.4f} max|ds|={serr:.2e}", flush=True)
        ms_lane = bench(functools.partial(flat_topk_lane, k=10), q, corpus, bias)
        print(f"  lane (XLA):           {ms_lane:6.2f} ms", flush=True)
        for blk_b in (128, 256):
            if blk_b > b:
                continue
            for blk_n in (1024, 2048):
                try:
                    fn = functools.partial(pipe_topk, k=10, blk_n=blk_n,
                                           blk_b=blk_b)
                    ms = bench(fn, q, corpus, bias)
                    print(f"  pipe blk_b={blk_b} blk_n={blk_n}: {ms:6.2f} ms",
                          flush=True)
                except Exception as e:
                    print(f"  pipe blk_b={blk_b} blk_n={blk_n}: FAIL "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
