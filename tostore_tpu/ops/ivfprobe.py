"""IVF bucket-probe kernel: scalar-prefetched contiguous cluster scans.

Replaces the reference's per-candidate beam scoring over paged NGH
partitions (ngh_graph_engine.dart:145 beam search; vector_index_manager
pages) for the probe stage. The TPU problem with probing is the gather:
XLA lowers `vectors[slots]` over random slots to row-at-a-time DMA, which
measured 12 ms for an 8-query x 16-probe scan that touches only 30 MB of
unique data. This kernel probes the bucket-CONTIGUOUS corpus copy
([C, cap, D], the classic inverted-list layout) with one DMA per
(query, probe) step whose source block index comes from a scalar-prefetched
probe table — sequential 3 MB reads at HBM streaming rate instead of
254k scattered row fetches.

Grid (B, P): step (b, p) DMAs cluster block `probes[b, p]` into VMEM
(double-buffered by the Pallas pipeline), scores it against query b on the
MXU, adds the bucket bias (validity/-inf + folded l2 norms) and writes
[cap] scores. Top-k selection over [B, P*cap] runs in XLA outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret_mode


# Lanes of (subspace, centroid) pairs folded per one-hot matmul group:
# [GROUP_LANES, cap] bf16 one-hot tile stays ~4 MB in VMEM at cap~2k.
ADC_GROUP_LANES = 1024


def adc_kernel_supported(m: int, k: int) -> bool:
    """The one-hot LUT kernel needs lane-aligned table groups: K must
    divide the group width and M*K must be a multiple of 128 (Mosaic lane
    slices). Unsupported (M, K) combos fall back to the XLA gather path."""
    return (m * k) % 128 == 0 and ADC_GROUP_LANES % k == 0


def _adc_kernel(k, packed, probes_ref, tab_ref, codes_ref, bias_ref, out_ref):
    """ADC over one bucket's codes. The reference's scalar hot loop
    (vector_quantizer.dart:414 adcDistance: d += tab[m][code]) has no TPU
    analogue — Mosaic has no per-lane dynamic gather — so the lookup is a
    one-hot matmul: onehot(code) @ tab rides the MXU, and the group loop
    bounds the one-hot tile in VMEM. The table arrives pre-flattened
    [1, M*K] (the [mg, K] -> [1, mg*K] reshape crosses sublanes for
    K < 128, which Mosaic rejects; lane slices of a flat row are always
    legal at 128-aligned offsets). With `packed`, codes hold TWO 4-bit
    subspaces per byte (byte row j = subspaces 2j | 2j+1); the nibbles
    unpack with VPU shifts, halving the codes DMA. Scores are NEGATED
    distances plus the bucket bias (higher = better, dead entries -inf)."""
    del probes_ref
    codes = codes_ref[0]  # [M or M/2, cap] u8, subspaces on sublanes
    rows, cap = codes.shape
    codes_i = codes.astype(jnp.int32)
    acc = jnp.zeros((1, cap), jnp.float32)
    group_rows = max(1, ADC_GROUP_LANES // k)
    # packed: two planes over the SAME code bytes (hi nibbles = even
    # subspaces, lo = odd), with the flat table permuted evens-then-odds
    # by the caller — plane separation avoids the sublane interleave a
    # stacked layout would force (measured 1.7x slower)
    for plane in range(2 if packed else 1):
        for g in range(0, rows, group_rows):
            mg = min(group_rows, rows - g)
            cg = codes_i[g : g + mg, :]  # [mg, cap]
            if packed:
                cg = (cg >> 4) if plane == 0 else (cg & 0xF)
            iota = jax.lax.broadcasted_iota(jnp.int32, (mg, k, cap), 1)
            oh = (cg[:, None, :] == iota).astype(jnp.bfloat16)  # [mg, k, cap]
            oh2 = oh.reshape(mg * k, cap)
            base = (plane * rows + g) * k
            tg = tab_ref[0, 0, :, base : base + mg * k]
            acc += jax.lax.dot_general(
                tg.astype(jnp.bfloat16), oh2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0, 0] = -acc + bias_ref[0]


@jax.jit
def adc_bucket_scores(tabs, probes, bucket_codes, bucket_bias):
    """tabs [B, P, M, K] f32 per-(query, probe) ADC tables (lower = closer)
    — per-probe so residual-PQ tables, built from q - centroid[probe], ride
    the same kernel; non-residual callers broadcast a per-query table over
    P. probes [B, P] i32, bucket_codes [C, M, cap] u8 (bucket-contiguous,
    subspaces on sublanes; [C, M/2, cap] nibble-PACKED when K=16),
    bucket_bias [C, cap]. Returns scores [B, P, cap] f32 (negated
    distances + bias). K is generic — 4-bit codebooks (K=16) cut the
    one-hot VPU work 16x per lane group and pack two codes per byte."""
    b, p = probes.shape
    m = tabs.shape[2]
    c, code_rows, cap = bucket_codes.shape
    packed = code_rows * 2 == m
    k = tabs.shape[3]
    bias3 = bucket_bias[:, None, :]
    if packed:
        # plane order: even subspaces (hi nibbles) then odd (lo nibbles)
        perm = jnp.concatenate([jnp.arange(0, m, 2), jnp.arange(1, m, 2)])
        tabs = tabs[:, :, perm, :]
    tabs_flat = tabs.reshape(b, p, 1, m * k)  # XLA reshape: free
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, m * k), lambda bi, pi, pr: (bi, pi, 0, 0)
            ),
            pl.BlockSpec(
                (1, code_rows, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0)
            ),
            pl.BlockSpec((1, 1, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, cap), lambda bi, pi, pr: (bi, pi, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_adc_kernel, k, packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 1, cap), jnp.float32),
        interpret=interpret_mode(),
    )(probes, tabs_flat, bucket_codes, bias3)
    return out.reshape(b, p, cap)


def _kernel(has_scale, probes_ref, q_ref, bv_ref, *rest):
    if has_scale:
        sc_ref, bias_ref, out_ref = rest
    else:
        bias_ref, out_ref = rest
        sc_ref = None
    del probes_ref  # consumed by the index maps
    block = bv_ref[0]  # [cap, d]
    if block.dtype == jnp.int8:
        block = block.astype(jnp.bfloat16)
    # select query row bi without a dynamic sublane index (Mosaic needs
    # statically 8-aligned row indexes); a masked reduce over B<=256 rows
    # is free next to the [cap, d] DMA. Alpha is pre-folded into q.
    bi = pl.program_id(0)
    qall = q_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, qall.shape, 0)
    qv = jnp.sum(
        jnp.where(rows == bi, qall, jnp.zeros_like(qall)), axis=0
    ).astype(block.dtype)[None, :]  # [1, d]
    s = jax.lax.dot_general(
        qv, block, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, cap] — kept 2-d (1-d reshapes cross sublanes, unsupported)
    if sc_ref is not None:
        s = s * sc_ref[0]  # per-row int8 dequant factors [1, cap]
    out_ref[0, 0] = s + bias_ref[0]


@functools.partial(jax.jit, static_argnames=())
def bucket_probe_scores(q, probes, bucket_vectors, bucket_bias, bucket_scale=None):
    """q [B, D] (alpha folded in, dtype matching bucket compute), probes
    [B, P] i32 cluster ids, bucket_vectors [C, cap, D], bucket_bias
    [C, cap] f32 additive (NEG_INF = dead entry; -|x|^2 folded for l2),
    bucket_scale [C, cap] f32 optional per-row multiplicative dequant
    factors (per-vector int8). Returns scores [B, P, cap] f32."""
    b, d = q.shape
    _, p = probes.shape
    c, cap, _ = bucket_vectors.shape
    # TPU block rules want the last two block dims divisible by (8, 128)
    # or equal to the array dims: q rides along whole (row selected by
    # masked reduce), bias/out get unit middle axes
    bias3 = bucket_bias[:, None, :]
    in_specs = [
        pl.BlockSpec((b, d), lambda bi, pi, pr: (0, 0)),
        pl.BlockSpec((1, cap, d), lambda bi, pi, pr: (pr[bi, pi], 0, 0)),
    ]
    operands = [q, bucket_vectors]
    if bucket_scale is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0))
        )
        operands.append(bucket_scale[:, None, :])
    in_specs.append(
        pl.BlockSpec((1, 1, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0))
    )
    operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 1, cap), lambda bi, pi, pr: (bi, pi, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, bucket_scale is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 1, cap), jnp.float32),
        interpret=interpret_mode(),
    )(probes, *operands)
    return out.reshape(b, p, cap)
