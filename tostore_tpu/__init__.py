"""tostore_tpu — a TPU-native structured + vector data engine.

A brand-new framework with the capability surface of tocreator/tostore
(reference: /root/reference, a Dart embedded database with structured tables,
B+Tree secondary indexes, an NGH/Vamana vector index with Product
Quantization, a KV store, WAL durability, ACID transactions, schema
migration, encryption and multi-space isolation — see SURVEY.md), re-designed
TPU-first:

- embeddings live as block-padded bf16/f32 device matrices in HBM,
- distance scoring is MXU matmuls with a fused Pallas top-k kernel,
- the ANN index is an IVF coarse quantizer + PQ/ADC on device,
- hybrid structured+vector queries fuse predicate bitmasks into the
  distance kernel instead of post-filtering,
- multi-chip scaling shards the corpus over a `jax.sharding.Mesh` and
  merges per-shard top-k over ICI collectives.

Public API mirrors the reference facade (reference lib/tostore.dart:1-1196).
"""

from .models.schema import (
    TableSchema,
    FieldSchema,
    IndexSchema,
    DataType,
    PrimaryKeyConfig,
    PrimaryKeyType,
    VectorFieldConfig,
    VectorPrecision,
    VectorIndexType,
    VectorDistanceMetric,
    VectorIndexConfig,
    ForeignKeySchema,
    ForeignKeyAction,
    TableTtlConfig,
)
from .models.config import (
    DataStoreConfig,
    DistributedNodeConfig,
    EncryptionConfig,
    SpaceConfig,
)
from .models.results import (
    BusinessError,
    DbResult,
    ResultType,
    QueryResult,
    VectorSearchResult,
    TransactionResult,
)
from .models.aggregation import Agg
from .models.expr import Expr
from .utils.crypto import ToCrypto
from .utils.logging import LogConfig
from .query.condition import QueryCondition
from .api import ToStoreTPU

__version__ = "0.1.0"

__all__ = [
    "LogConfig",
    "ToStoreTPU",
    "TableSchema",
    "FieldSchema",
    "IndexSchema",
    "DataType",
    "PrimaryKeyConfig",
    "PrimaryKeyType",
    "VectorFieldConfig",
    "VectorPrecision",
    "VectorIndexType",
    "VectorDistanceMetric",
    "VectorIndexConfig",
    "ForeignKeySchema",
    "ForeignKeyAction",
    "TableTtlConfig",
    "DataStoreConfig",
    "DistributedNodeConfig",
    "EncryptionConfig",
    "DbResult",
    "ResultType",
    "QueryResult",
    "VectorSearchResult",
    "TransactionResult",
    "Expr",
    "QueryCondition",
    "Agg",
    "BusinessError",
    "SpaceConfig",
    "ToCrypto",
]
