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


@functools.lru_cache(maxsize=None)
def enable_compile_cache() -> bool:
    """Turn on JAX's persistent compilation cache for the engine (called at
    Database init; respects an existing user/app setting). On a tunneled
    TPU a single remote kernel compile costs 20-40 s and even eager scalar
    ops cost ~0.05-0.5 s each — a cold engine start replays HUNDREDS of
    them. Persisting everything (min_compile_time 0: the sub-0.5 s scalar
    storm is exactly what the default threshold refuses to cache) makes
    every start after the first hit disk instead of the compiler."""
    import os

    try:
        if jax.config.jax_compilation_cache_dir:
            return True  # app already configured a cache — leave it alone
        # Scope the dir by backend + host fingerprint: XLA:CPU AOT results
        # encode the COMPILING machine's features (amx/avx512...), and a
        # shared dir served cross-host loads that warn "could lead to
        # SIGILL". TPU programs target the (remote) device, so backend
        # name alone scopes them; CPU programs add a cpuinfo-flags hash.
        backend = jax.default_backend()
        cache_dir = "~/.cache/jax_comp"  # TPU: programs target the device
        if backend == "cpu":
            import hashlib

            try:
                with open("/proc/cpuinfo") as f:
                    flags = next(
                        (ln for ln in f if ln.startswith("flags")), ""
                    )
            except OSError:
                import platform

                flags = platform.machine() + platform.processor()
            tag = "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:12]
            cache_dir = f"~/.cache/jax_comp/{tag}"
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False  # ancient jax / read-only home: compile-only mode


# Measured on the tunneled v5e (ROUND_NOTES "Environment facts"): one
# 201 MB async host->device transfer drained in 47-257 s run to run,
# while the same bytes as ~50 MB waves drained in 1.5 s (~100 MB/s) —
# large single RPCs through the tunnel stall; chunked streams pipeline.
H2D_CHUNK_BYTES = 48 << 20


def _chunk_rows(shape, itemsize: int) -> int:
    """Largest pow2 row count whose chunk stays under H2D_CHUNK_BYTES
    (pow2 keeps the eager update/slice programs a tiny shape family)."""
    row_bytes = itemsize
    for s in shape[1:]:
        row_bytes *= s
    c = max(1, H2D_CHUNK_BYTES // max(row_bytes, 1))
    return 1 << (c.bit_length() - 1)


def upload_rows(
    dest: jax.Array, host: np.ndarray, start_row: int = 0, cast_to=None
) -> jax.Array:
    """dest[start_row : start_row+len(host)] = host, streaming the host
    array in <=H2D_CHUNK_BYTES row chunks. Offsets ride as device scalars
    so every chunk reuses ONE dynamic_update_slice program per
    (dest shape, chunk shape). The tail keeps its exact shape (a fresh
    tail shape costs one sub-second copy-program compile, cached
    persistently — far cheaper than padding the wire). `cast_to` converts
    each chunk on DEVICE after transfer (ship the narrow wire dtype)."""
    rows = host.shape[0]
    if rows == 0:
        return dest
    chunk = _chunk_rows(host.shape, host.dtype.itemsize)
    zeros_tail = (jnp.int32(0),) * (host.ndim - 1)
    for off in range(0, rows, chunk):
        blk = host[off : off + chunk]
        if not blk.flags.c_contiguous:
            blk = np.ascontiguousarray(blk)
        dev = jnp.asarray(blk)
        if cast_to is not None and dev.dtype != jnp.dtype(cast_to):
            dev = dev.astype(cast_to)
        dest = jax.lax.dynamic_update_slice(
            dest, dev, (jnp.int32(start_row + off),) + zeros_tail
        )
    return dest


def download_rows(dev: jax.Array, m: int) -> np.ndarray:
    """np.asarray(dev[:m]) via <=H2D_CHUNK_BYTES row chunks (device->host
    readbacks through the tunnel stall on large single RPCs exactly like
    uploads; see H2D_CHUNK_BYTES). Chunks slice with device-scalar
    offsets: one program per (dev shape, chunk shape)."""
    if m == 0:
        return np.zeros((0,) + dev.shape[1:], dev.dtype)
    chunk = _chunk_rows(dev.shape, jnp.dtype(dev.dtype).itemsize)
    if m <= chunk:
        return np.asarray(dev[:m])
    sizes = (chunk,) + dev.shape[1:]
    zeros_tail = (jnp.int32(0),) * (dev.ndim - 1)
    parts = []
    nfull = m // chunk
    for i in range(nfull):
        blk = jax.lax.dynamic_slice(
            dev, (jnp.int32(i * chunk),) + zeros_tail, sizes
        )
        parts.append(np.asarray(blk))
    rem = m - nfull * chunk
    if rem:
        off = nfull * chunk
        if off + chunk <= dev.shape[0]:
            blk = jax.lax.dynamic_slice(
                dev, (jnp.int32(off),) + zeros_tail, sizes
            )
            parts.append(np.asarray(blk)[:rem])
        else:  # dynamic_slice would CLAMP the start; exact static tail
            parts.append(np.asarray(dev[off:m]))
    return np.concatenate(parts)


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
