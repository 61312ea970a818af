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


# Subspaces folded per one-hot matmul group: [MG*K, cap] bf16 stays ~4 MB
# in VMEM at K=256, cap~2k.
ADC_GROUP = 4


def _adc_kernel(probes_ref, tab_ref, codes_ref, bias_ref, out_ref):
    """ADC over one bucket's codes. The reference's scalar hot loop
    (vector_quantizer.dart:414 adcDistance: d += tab[m][code]) has no TPU
    analogue — Mosaic has no per-lane dynamic gather — so the lookup is a
    one-hot matmul: onehot(code) @ tab rides the MXU, and the group loop
    bounds the one-hot tile in VMEM. Scores are NEGATED distances plus the
    bucket bias (higher = better, dead entries -inf)."""
    del probes_ref
    codes = codes_ref[0]  # [M, cap] u8, subspaces on sublanes
    m, cap = codes.shape
    k = tab_ref.shape[3]
    codes_i = codes.astype(jnp.int32)
    acc = jnp.zeros((1, cap), jnp.float32)
    for g in range(0, m, ADC_GROUP):
        mg = min(ADC_GROUP, m - g)
        cg = codes_i[g : g + mg, :]  # [mg, cap]
        iota = jax.lax.broadcasted_iota(jnp.int32, (mg, k, cap), 1)
        oh = (cg[:, None, :] == iota).astype(jnp.bfloat16)  # [mg, k, cap]
        oh2 = oh.reshape(mg * k, cap)
        tg = tab_ref[0, 0, g : g + mg, :].reshape(1, mg * k).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            tg, oh2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = -acc + bias_ref[0]


@jax.jit
def adc_bucket_scores(tabs, probes, bucket_codes, bucket_bias):
    """tabs [B, P, M, K] f32 per-(query, probe) ADC tables (lower = closer)
    — per-probe so residual-PQ tables, built from q - centroid[probe], ride
    the same kernel; non-residual callers broadcast a per-query table over
    P. probes [B, P] i32, bucket_codes [C, M, cap] u8 (bucket-contiguous,
    subspaces on sublanes), bucket_bias [C, cap]. Returns scores
    [B, P, cap] f32 (negated distances + bias)."""
    b, p = probes.shape
    c, m, cap = bucket_codes.shape
    bias3 = bucket_bias[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec(
                (1, 1, m, tabs.shape[3]), lambda bi, pi, pr: (bi, pi, 0, 0)
            ),
            pl.BlockSpec((1, m, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0)),
            pl.BlockSpec((1, 1, cap), lambda bi, pi, pr: (pr[bi, pi], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, cap), lambda bi, pi, pr: (bi, pi, 0, 0)
        ),
    )
    out = pl.pallas_call(
        _adc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 1, cap), jnp.float32),
        interpret=interpret_mode(),
    )(probes, tabs, bucket_codes, bias3)
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
