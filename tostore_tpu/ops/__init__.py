"""TPU kernel substrate: distance scoring, fused top-k, PQ, IVF primitives.

This layer is pure JAX/Pallas — no storage, no engine state. It is the
TPU-native replacement for the reference's hot compute loops
(reference ngh_graph_engine.dart:145 beam search + ADC,
vector_quantizer.dart:81-457 PQ k-means/encode/ADC,
handler/topk_heap.dart:1-81 bounded top-k heaps).
"""

from .runtime import round_up, pad_rows, interpret_mode
from .distance import (
    l2_norms,
    normalize,
    score_matrix,
    scores_to_distances,
    distances_to_scores,
)
from .topk import (
    flat_topk_xla, flat_topk_lane, flat_topk_hwpr, fused_flat_topk,
    flat_search,
)

__all__ = [
    "round_up",
    "pad_rows",
    "interpret_mode",
    "l2_norms",
    "normalize",
    "score_matrix",
    "scores_to_distances",
    "distances_to_scores",
    "flat_topk_xla",
    "flat_topk_lane",
    "flat_topk_hwpr",
    "fused_flat_topk",
    "flat_search",
]
