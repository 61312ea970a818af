"""Engine core: tables, durability, transactions, spaces, KV.

Re-design of the reference's L2/L5-L7 stack (SURVEY.md §1): DataStoreImpl
orchestration (data_store_impl.dart), paged B+Tree storage
(table_tree_partition_manager.dart), WAL/journal pipeline
(wal_manager.dart, parallel_journal_manager.dart) and transaction manager —
rebuilt as a columnar host store (vectorized NumPy reads feeding device
bitmasks) + device-resident vector corpora + snapshot/WAL durability.
"""

from .database import Database

__all__ = ["Database"]
