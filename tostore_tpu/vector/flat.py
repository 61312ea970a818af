"""FlatVectorIndex — exact kNN over a DeviceCorpus.

The TPU-native replacement for the reference's `vectorSearch` read path
(vector_index_manager.dart:475-588 + ngh_graph_engine.dart:67-143): instead
of beam search over a paged Vamana graph with ADC, the whole corpus is
scored in one fused MXU scan (ops/topk.py). Distance/score result semantics
are identical to the reference (primaryKey, distance, score mapping
vector_index_manager.dart:1411-1423), including cosine query normalization
(:518) and optional distance threshold filtering.

Hybrid filtering (BASELINE.json config #4): a validity bitmask over slots —
computed from structured predicates — folds into the kernel's bias, so
filtered search costs the same scan instead of post-filtering.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.results import VectorSearchResult
from ..ops import distance as D
from ..ops import topk as T
from ..ops.runtime import NEG_INF
from .corpus import DeviceCorpus

_METRIC_ALIASES = {
    "cosine": "cosine",
    "l2": "l2",
    "innerProduct": "dot",
    "dot": "dot",
}


class FlatVectorIndex:
    """Flat full-scan index: metric in {'cosine','l2','dot'/'innerProduct'}.

    mode='auto' (default) may use the per-lane candidate selection (miss
    probability ~1e-5..1e-8 per query, ops/topk.py:26-35); mode='exact'
    forces the exact chunked scan (reference exact semantics);
    mode='fast' uses the TPU's hardware-binned top-k (highest throughput,
    real ~1e-3 miss — ops/topk.py flat_topk_hwpr)."""

    index_type = "flat"
    search_mode = "auto"  # schema VectorIndexConfig.search_mode overrides

    def __init__(self, dims: int, metric: str = "cosine", precision: str = "float32"):
        metric = _METRIC_ALIASES.get(metric)
        if metric is None:
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.corpus = DeviceCorpus(dims, precision, normalize=(metric == "cosine"))

    # --- mutation (engine flush path calls these) ---------------------------

    def upsert(self, pks, vectors: np.ndarray):
        return self.corpus.upsert(pks, vectors)

    def delete(self, pks) -> int:
        return self.corpus.delete(pks)

    def compact(self):
        self.corpus.compact()

    def maybe_compact(self, ratio_threshold: float = 0.10):
        """Tombstone compaction trigger, reference 10% rule (vim:897)."""
        if self.corpus.deleted_ratio >= ratio_threshold and self.corpus.deleted_count > 0:
            self.corpus.compact()
            return True
        return False

    def __len__(self):
        return len(self.corpus)

    @property
    def dims(self):
        return self.corpus.dims

    # --- search ----------------------------------------------------------------

    def _prep_queries(self, q: np.ndarray) -> tuple[jax.Array, jax.Array, bool]:
        q = np.asarray(q, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        if q.shape[1] != self.corpus.dims:
            raise ValueError(f"query dims {q.shape[1]} != index dims {self.corpus.dims}")
        qsq = jnp.asarray(np.sum(q * q, axis=1))
        if self.metric == "cosine":
            n = np.linalg.norm(q, axis=1, keepdims=True)
            q = q / np.maximum(n, 1e-12)
        if self.corpus.d_pad != q.shape[1]:
            q = np.pad(q, ((0, 0), (0, self.corpus.d_pad - q.shape[1])))
        return jnp.asarray(q), qsq, single

    def _bias_alpha(self, slot_mask: jax.Array | None):
        """Per-slot additive bias folding metric term, tombstones and the
        hybrid predicate mask; plus the kernel's matmul scale alpha and the
        per-row int8 dequant factors (corpus.scales; sq_norms are stored
        dequantized, so only the q.e product needs them)."""
        c = self.corpus
        valid = c.valid
        if slot_mask is not None:
            valid = jnp.logical_and(valid, slot_mask)
        norms = c.sq_norms if self.metric == "l2" else None
        alpha = D.metric_alpha(self.metric)
        bias = D.make_bias(self.metric, norms, valid)
        return bias, alpha, c.scales

    def search_arrays(
        self,
        q: np.ndarray,
        k: int,
        slot_mask: jax.Array | None = None,
        mode: str = "auto",
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch search. Returns (distances [B,k] f32, slots [B,k] i64 with
        -1 for no-hit, pks [B,k] object)."""
        c = self.corpus
        if c.capacity == 0 or len(c) == 0:
            b = 1 if np.asarray(q).ndim == 1 else np.asarray(q).shape[0]
            dist = np.full((b, k), np.inf, np.float32)
            slots = np.full((b, k), -1, np.int64)
            return dist, slots, np.full((b, k), None, dtype=object)

        qj, qsq, single = self._prep_queries(q)
        bias, alpha, row_scale = self._bias_alpha(slot_mask)
        scores, idx = T.flat_search(
            qj, c.vectors, bias, k=k, alpha=alpha, mode=mode, row_scale=row_scale
        )
        d_dev, s_dev = D.finalize_results(self.metric, scores, idx, qsq)
        dist_np = np.array(d_dev, np.float32)
        idx_np = np.array(s_dev, np.int64)
        pks = c.pks_for_slots(idx_np)
        return dist_np, idx_np, pks

    def search(
        self,
        q: np.ndarray,
        top_k: int = 10,
        threshold: float | None = None,
        slot_mask: jax.Array | None = None,
        mode: str = "auto",
    ) -> list[VectorSearchResult]:
        """Single-query search with reference result semantics."""
        dist, slots, pks = self.search_arrays(q, top_k, slot_mask, mode)
        dist, slots, pks = dist[0], slots[0], pks[0]
        score = np.asarray(
            D.distances_to_scores(self.metric, jnp.asarray(np.where(np.isfinite(dist), dist, 0)))
        )
        out = []
        for j in range(len(slots)):
            if slots[j] < 0 or not np.isfinite(dist[j]):
                continue
            if threshold is not None and dist[j] > threshold:
                continue
            out.append(
                VectorSearchResult(
                    primary_key=pks[j], distance=float(dist[j]), score=float(score[j])
                )
            )
        return out

    # --- persistence ---------------------------------------------------------

    def state_dict(self) -> dict:
        return {"metric": self.metric, "corpus": self.corpus.state_dict(), "type": "flat"}

    @staticmethod
    def from_state_dict(d: dict) -> "FlatVectorIndex":
        idx = FlatVectorIndex.__new__(FlatVectorIndex)
        idx.metric = d["metric"]
        idx.corpus = DeviceCorpus.from_state_dict(d["corpus"])
        return idx
