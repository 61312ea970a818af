"""Vector index engines: device-resident corpora, flat exact kNN, IVF ANN,
Product Quantization.

TPU-native replacement for the reference vector stack (SURVEY.md §2.1):
the NGH/Vamana graph + paged PQ codes + 3-level caches
(core/ngh_graph_engine.dart, ngh_partition_manager.dart, ngh_page.dart,
vector_cache.dart) collapse into block-padded HBM arrays scanned by the
fused kernels in ops/.
"""

from .corpus import DeviceCorpus
from .flat import FlatVectorIndex
from .pq import PQCodebook, train_pq, pq_encode, adc_search
from .ivf import IVFVectorIndex

__all__ = [
    "DeviceCorpus",
    "FlatVectorIndex",
    "PQCodebook",
    "train_pq",
    "pq_encode",
    "adc_search",
    "IVFVectorIndex",
]
