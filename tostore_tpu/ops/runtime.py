"""Runtime helpers shared by all kernels: padding, platform detection.

TPU tiling wants the trailing dim a multiple of 128 and row blocks a
multiple of the dtype sublane count (f32: 8, bf16: 16, int8: 32) — see the
Pallas TPU guide. All device corpora in this framework are block-padded so
every kernel sees static, aligned shapes (the reference instead pages
variable-size nodes through 16 KB pages, ngh_page.dart:145-450; on TPU the
padding replaces the page machinery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Row-block granularity for device corpora — matches the fused top-k
# kernel's corpus block so capacities are always kernel-aligned.
ROW_BLOCK = 2048

# Lane width of the VPU / MXU edge.
LANE = 128

_SUBLANES = {
    jnp.float32.dtype: 8,
    jnp.bfloat16.dtype: 16,
    jnp.int8.dtype: 32,
    jnp.uint8.dtype: 32,
    jnp.int32.dtype: 8,
    jnp.uint32.dtype: 8,
}


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sublanes(dtype) -> int:
    return _SUBLANES.get(jnp.dtype(dtype), 8)


@functools.lru_cache(maxsize=None)
def interpret_mode() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def pad_rows(a: np.ndarray | jax.Array, n_rows: int, fill=0):
    """Pad axis 0 of `a` up to `n_rows` with `fill`."""
    cur = a.shape[0]
    if cur == n_rows:
        return a
    if cur > n_rows:
        raise ValueError(f"cannot pad {cur} rows down to {n_rows}")
    pad_width = [(0, n_rows - cur)] + [(0, 0)] * (a.ndim - 1)
    if isinstance(a, np.ndarray):
        return np.pad(a, pad_width, constant_values=fill)
    return jnp.pad(a, pad_width, constant_values=fill)


def pad_cols(a, n_cols: int, fill=0):
    """Pad the trailing axis of `a` up to `n_cols` with `fill`."""
    cur = a.shape[-1]
    if cur == n_cols:
        return a
    if cur > n_cols:
        raise ValueError(f"cannot pad {cur} cols down to {n_cols}")
    pad_width = [(0, 0)] * (a.ndim - 1) + [(0, n_cols - cur)]
    if isinstance(a, np.ndarray):
        return np.pad(a, pad_width, constant_values=fill)
    return jnp.pad(a, pad_width, constant_values=fill)


NEG_INF = float(np.finfo(np.float32).min)
