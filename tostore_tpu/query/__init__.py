"""Query layer: condition trees, planning, vectorized execution.

Re-design of the reference query stack (reference lib/src/query/: 6,039 LoC
QueryExecutor/QueryOptimizer/QueryPlan/CostEstimator/QueryCondition) for a
columnar host store + device bitmask world: predicates evaluate vectorized
over NumPy columns (and compile to device bitmasks for hybrid vector
search) instead of row-at-a-time Dart matchers.
"""

from .condition import QueryCondition

__all__ = ["QueryCondition"]
