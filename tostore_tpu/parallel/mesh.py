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
