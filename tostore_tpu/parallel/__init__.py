"""Multi-chip scaling: mesh construction, sharded corpora, ICI top-k merge.

The reference's only distributed element is central-server ID segments
(SURVEY.md §2.4 — no distributed query or replication exists). The
TPU-native framework builds the real thing: the corpus shards across a
`jax.sharding.Mesh` (data-parallel over ICI), searches run per-shard
scans with an `all_gather` top-k merge, queries scale over an independent
`dp` axis, and index training (k-means) is one `psum` data-parallel Lloyd
step — exactly the BASELINE.json config #5 plan.
"""

from .mesh import make_mesh, corpus_sharding, replicated
from .sharded import (
    sharded_flat_topk,
    sharded_kmeans,
    sharded_kmeans_step,
    ShardedFlatIndex,
)

__all__ = [
    "make_mesh",
    "corpus_sharding",
    "replicated",
    "sharded_flat_topk",
    "sharded_kmeans",
    "sharded_kmeans_step",
    "ShardedFlatIndex",
]
