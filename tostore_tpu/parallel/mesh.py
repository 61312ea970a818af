"""Mesh construction + sharding helpers.

Axes:
  - "shard": the corpus axis — N rows striped across chips over ICI;
  - "dp":    the query axis — independent query batches in parallel.

Multi-host pods extend the same mesh over DCN via `jax.distributed`
(initialize() before building the mesh); nothing else changes — XLA routes
the `all_gather`/`psum` merges over ICI within a host and DCN across.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_cpu_devices: int | None = None,
) -> None:
    """Join a multi-host job BEFORE building the mesh: every process calls
    this, then `make_mesh()` spans the global device set and XLA routes
    collectives over ICI within a host and DCN across (the scaling-book
    recipe — nothing else in the engine changes).

    `local_cpu_devices` forces a virtual CPU backend with that many local
    devices (CI / smoke tests without TPU pods); jax.config is used rather
    than env vars, which a preloaded jaxlib ignores."""
    import jax

    if local_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_cpu_devices))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_to_global(x, mesh: Mesh, spec: P):
    """Assemble a global sharded array from this process's host-local
    shard (each process holds its stripe of the corpus; multi-host
    device_put of a full array onto non-addressable devices is illegal)."""
    import jax.experimental.multihost_utils as mhu

    return mhu.host_local_array_to_global_array(x, mesh, spec)


def read_to_host(x) -> np.ndarray:
    """np readback that works across hosts: a sharded global array is not
    fully addressable in a multi-process job, so np.asarray would throw —
    process_allgather assembles the global value on every host instead.
    Single-process meshes take the direct path."""
    if jax.process_count() > 1 and not x.is_fully_addressable:
        from jax.experimental import multihost_utils as mhu

        return np.asarray(mhu.process_allgather(x, tiled=True))
    return np.asarray(x)


def replicated_from_host(x: np.ndarray, mesh: Mesh, spec: P):
    """device_put that works across hosts: placing host data onto
    non-addressable devices is illegal in a multi-process job, so the
    host-local value (identical on every process by construction) is
    declared the global value instead."""
    import jax.numpy as jnp

    if jax.process_count() > 1:
        import jax.experimental.multihost_utils as mhu

        return mhu.host_local_array_to_global_array(
            np.asarray(x), mesh, P(*([None] * np.ndim(x)))
        )
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def make_mesh(
    n_devices: int | None = None,
    dp: int = 1,
    axis_names: tuple[str, str] = ("dp", "shard"),
    devices=None,
) -> Mesh:
    """Build a (dp, shard) mesh over the first n_devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % dp != 0:
        raise ValueError(f"n_devices {n} not divisible by dp {dp}")
    grid = np.array(devs).reshape(dp, n // dp)
    return Mesh(grid, axis_names)


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Rows striped over the shard axis, replicated over dp."""
    return NamedSharding(mesh, P("shard", None))


def query_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_count(mesh: Mesh) -> int:
    return mesh.shape["shard"]
