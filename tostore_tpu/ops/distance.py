"""Distance / similarity scoring on the MXU.

The reference computes exact L2/IP/cosine distances in scalar Dart loops
(ngh_graph_engine.dart:908-946) and normalizes cosine queries on the host
(vector_index_manager.dart:514-520). Here every metric is expressed as one
`[B, D] x [D, N]` matmul plus a per-column bias so the whole scan rides the
MXU, and so the fused Pallas top-k kernel (topk.py) can treat all three
metrics uniformly:

    score = alpha * (q @ corpus.T) + bias            (higher is better)

    dot    : alpha = 1, bias = 0,           distance = -score
    cosine : alpha = 1, bias = 0 (inputs L2-normalized), distance = 1 - score
    l2     : alpha = 2, bias = -||c||^2,    squared distance = ||q||^2 - score

Invalid/tombstoned/padded slots are folded into `bias` as -inf, which is how
hybrid predicate filtering fuses into the kernel (BASELINE.json config #4).
Score→user-facing "score" mapping matches the reference exactly
(vector_index_manager.dart:1411-1423): l2 -> 1/(1+d), ip -> sigmoid(ip),
cosine -> 1 - d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .runtime import NEG_INF

METRICS = ("cosine", "l2", "dot")


def l2_norms(x: jax.Array) -> jax.Array:
    """Squared L2 norms per row, f32."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return (xf / jnp.maximum(n, eps)).astype(x.dtype)


def metric_alpha(metric: str) -> float:
    return 2.0 if metric == "l2" else 1.0


def make_bias(metric: str, corpus_sq_norms: jax.Array | None, valid: jax.Array) -> jax.Array:
    """Per-corpus-row additive bias folding the metric term and validity.

    valid: bool [N]; corpus_sq_norms: f32 [N] (required for l2).
    """
    if metric == "l2":
        if corpus_sq_norms is None:
            raise ValueError("l2 metric requires corpus squared norms")
        bias = -corpus_sq_norms
    else:
        bias = jnp.zeros(valid.shape, jnp.float32)
    return jnp.where(valid, bias, NEG_INF)


def score_matrix(q: jax.Array, corpus: jax.Array, bias: jax.Array, alpha: float) -> jax.Array:
    """Unfused reference scorer: [B, N] f32 scores. Used as oracle/fallback."""
    prec = jax.lax.Precision.HIGHEST if corpus.dtype == jnp.float32 else None
    s = jnp.dot(
        q.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return alpha * s + bias[None, :]


def scores_to_distances(metric: str, scores: jax.Array, q_sq_norms: jax.Array) -> jax.Array:
    """Convert kernel scores back to the metric's true distance.

    q_sq_norms: f32 [B] squared L2 norms of the (pre-normalization) queries.
    """
    if metric == "dot":
        return -scores
    if metric == "cosine":
        return 1.0 - scores
    if metric == "l2":
        return jnp.sqrt(jnp.maximum(q_sq_norms[:, None] - scores, 0.0))
    raise ValueError(f"unknown metric {metric!r}")


def scores_to_distances_np(metric: str, scores, q_sq_norms) -> "np.ndarray":
    """Host-side scores_to_distances for results already read back: the
    jnp version would re-upload them through the tunnel (~30 ms roundtrip)
    just for elementwise arithmetic."""
    import numpy as np

    scores = np.asarray(scores, np.float32)
    if metric == "dot":
        return -scores
    if metric == "cosine":
        return (1.0 - scores).astype(np.float32)
    if metric == "l2":
        q = np.asarray(q_sq_norms, np.float32)
        return np.sqrt(np.maximum(q[:, None] - scores, 0.0)).astype(np.float32)
    raise ValueError(f"unknown metric {metric!r}")


import functools


@functools.partial(jax.jit, static_argnames=("metric",))
def finalize_results(metric: str, scores, slots, q_sq_norms):
    """Fold miss-masking + distance conversion into ONE device program so
    the host needs only two readbacks (dists, slots) per search — each
    np.asarray is a ~30 ms roundtrip on the tunneled TPU; the old tail
    read scores a third time just to compute the miss mask on host."""
    miss = scores <= NEG_INF / 2
    d = scores_to_distances(metric, scores, q_sq_norms)
    d = jnp.where(miss, jnp.inf, d)
    s = jnp.where(miss, -1, slots)
    return d, s


def distances_to_scores(metric: str, distances: jax.Array) -> jax.Array:
    """User-facing relevance score, identical to the reference mapping
    (vector_index_manager.dart:1411-1423)."""
    if metric == "l2":
        return 1.0 / (1.0 + distances)
    if metric == "dot":
        ip = -distances
        return jax.nn.sigmoid(ip)
    if metric == "cosine":
        return 1.0 - distances
    raise ValueError(f"unknown metric {metric!r}")
