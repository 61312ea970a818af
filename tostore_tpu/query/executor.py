"""Query planning + execution over the columnar store.

Replaces the reference's QueryExecutor/QueryOptimizer pair
(query/query_executor.dart:62 execute, query_optimizer.dart:18 optimize):
predicates evaluate as vectorized column masks (the tableScan plan), with a
sorted-index fast path for single-field range/equality + orderBy
(the indexScan plan); joins are hash joins; aggregates/groupBy/having,
distinct, dual offset/cursor pagination and join semantics match the
reference surface.
"""

from __future__ import annotations

import copy
import base64
import json
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..models.aggregation import Agg
from .condition import QueryCondition


@dataclass
class JoinSpec:
    table: str
    left_field: str
    right_field: str
    kind: str = "inner"  # inner | left | right


@dataclass
class QuerySpec:
    condition: QueryCondition | None = None
    select: list[str] | None = None
    aliases: dict[str, str] = field(default_factory=dict)  # field -> alias
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (field, desc)
    limit: int | None = None
    offset: int = 0
    cursor: str | None = None
    joins: list[JoinSpec] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    aggregates: list[Agg] = field(default_factory=list)
    having: QueryCondition | None = None
    distinct: bool = False
    use_cache: bool = True  # reference query-cache controls (:258-266)

    def fingerprint(self) -> str:
        return json.dumps(
            {
                "c": self.condition.to_map() if self.condition else None,
                "s": self.select,
                "a": self.aliases,
                "o": self.order_by,
                "l": self.limit,
                "off": self.offset,
                "cur": self.cursor,
                "j": [(j.table, j.left_field, j.right_field, j.kind) for j in self.joins],
                "g": self.group_by,
                "agg": [(a.op, a.field, a.alias) for a in self.aggregates],
                "h": self.having.to_map() if self.having else None,
                "d": self.distinct,
            },
            default=str,
            sort_keys=True,
        )


@dataclass
class ExplainInfo:
    plan: str  # 'indexScan' | 'tableScan'
    index: str | None = None
    estimated_rows: int = 0


def _encode_cursor(values: list, pk) -> str:
    return base64.urlsafe_b64encode(json.dumps([values, pk]).encode()).decode()


def _decode_cursor(tok: str):
    return json.loads(base64.urlsafe_b64decode(tok.encode()))


def _copy_record(r: dict) -> dict:
    """Cache-boundary copy: callers own returned records, so list/dict
    cells must not alias the cached copy (columnstore get() guards the
    store the same way)."""
    return {
        k: copy.deepcopy(v) if isinstance(v, (list, dict)) else v
        for k, v in r.items()
    }


def _sort_key(v):
    # None sorts first; mixed types compare via (typeclass, value)
    if v is None:
        return (0, 0)
    if isinstance(v, bool):
        return (1, int(v))
    if isinstance(v, (int, float)):
        return (2, v)
    return (3, str(v))


class QueryExecutor:
    # per-table-generation invalidated result cache (reference
    # query_executor.dart:33-49)
    CACHE_CAP = 256

    def __init__(self, database):
        self.db = database
        self._cache: dict[tuple, tuple] = {}

    def _gen_signature(self, space: str, table_name: str, spec: QuerySpec):
        names = [table_name] + [j.table for j in spec.joins]
        return tuple(self.db._table(n, space).store.generation for n in names)

    # --- planning -----------------------------------------------------------

    def choose_plan(self, table, spec: QuerySpec) -> ExplainInfo:
        """Index selection (reference query_optimizer.dart:30-43): a sorted
        index is used when the AND-leaves constrain its first field with an
        equality/range, or when it matches orderBy alone."""
        cond = spec.condition
        leaves = cond.and_leaves() if cond else []
        for name, sidx in table.sorted_indexes.items():
            first = sidx.fields[0]
            for f, op, v in leaves:
                if f == first and op in ("=", ">", "<", ">=", "<=", "between"):
                    return ExplainInfo("indexScan", name, len(table.store))
        if spec.order_by and not leaves:
            fields_ = tuple(f for f, _ in spec.order_by)
            for name, sidx in table.sorted_indexes.items():
                if sidx.fields[: len(fields_)] == fields_:
                    return ExplainInfo("indexScan", name, len(table.store))
        return ExplainInfo("tableScan", None, len(table.store))

    # --- execution -----------------------------------------------------------

    def execute(self, space: str, table_name: str, spec: QuerySpec):
        from ..models.results import QueryResult

        table = self.db._table(table_name, space)
        store = table.store

        cache_key = None
        if spec.use_cache:
            cache_key = (space, table_name, spec.fingerprint())
            hit = self._cache.get(cache_key)
            if hit is not None and hit[0] == self._gen_signature(space, table_name, spec):
                res = hit[1]
                return QueryResult(
                    records=[_copy_record(r) for r in res.records],
                    next_cursor=res.next_cursor,
                    prev_cursor=res.prev_cursor,
                    has_more=res.has_more,
                    total=res.total,
                )

        plan = self.choose_plan(table, spec)

        # 1. candidate rows
        if plan.plan == "indexScan":
            rows = self._index_scan(table, plan.index, spec)
        else:
            rows = np.flatnonzero(store.valid_view())
        # 2. residual predicate as vectorized mask
        if spec.condition is not None and not spec.condition.is_empty and len(rows):
            mask = spec.condition.mask(lambda f: store.column_view(f)[rows], len(rows))
            rows = rows[mask]

        # 3. materialize + joins
        records = [store.read_row(r) for r in rows]
        for rec in records:
            rec.pop("_system_ingest_ts_ms", None)
        for j in spec.joins:
            records = self._join(space, records, j)

        # 4. aggregates / grouping
        if spec.aggregates or spec.group_by:
            return self._aggregate(records, spec)

        # 5. ordering
        pk_name = table.schema.primary_key.name
        order = spec.order_by or [(pk_name, False)]
        records.sort(
            key=lambda r: tuple(
                _sort_key(r.get(f)) if not desc else _NegKey(_sort_key(r.get(f)))
                for f, desc in order
            )
        )

        if spec.distinct:
            seen = set()
            uniq = []
            sel = spec.select or None
            for r in records:
                key = json.dumps(
                    {k: str(v) for k, v in sorted(r.items()) if sel is None or k in sel},
                    default=str,
                )
                if key not in seen:
                    seen.add(key)
                    uniq.append(r)
            records = uniq

        total = len(records)

        # 6. pagination: cursor beats offset
        start = 0
        if spec.cursor:
            vals, last_pk = _decode_cursor(spec.cursor)
            ckey = tuple(
                _sort_key(v) if not desc else _NegKey(_sort_key(v))
                for v, (f, desc) in zip(vals, order)
            ) + (_sort_key(last_pk),)
            start = len(records)
            for i, r in enumerate(records):
                rk = tuple(
                    _sort_key(r.get(f)) if not desc else _NegKey(_sort_key(r.get(f)))
                    for f, desc in order
                ) + (_sort_key(r.get(pk_name)),)
                if rk > ckey:  # first record strictly after the cursor row
                    start = i
                    break
        elif spec.offset:
            start = min(spec.offset, self.db.config.max_query_offset)

        limit = spec.limit if spec.limit is not None else self.db.config.default_query_limit
        page = records[start : start + limit]
        has_more = start + limit < total

        next_cursor = None
        if page and has_more:
            last = page[-1]
            next_cursor = _encode_cursor([last.get(f) for f, _ in order], last.get(pk_name))
        prev_cursor = None
        if page and start > 0:
            first = page[0]
            prev_cursor = _encode_cursor([first.get(f) for f, _ in order], first.get(pk_name))

        # 7. projection
        if spec.select:
            page = [
                {spec.aliases.get(k, k): r.get(k) for k in spec.select} for r in page
            ]
        elif spec.aliases:
            page = [
                {spec.aliases.get(k, k): v for k, v in r.items()} for r in page
            ]

        result = QueryResult(
            records=page,
            next_cursor=next_cursor,
            prev_cursor=prev_cursor,
            has_more=has_more,
            total=total,
        )
        if cache_key is not None:
            if len(self._cache) >= self.CACHE_CAP:
                self._cache.pop(next(iter(self._cache)))
            self._cache[cache_key] = (
                self._gen_signature(space, table_name, spec),
                QueryResult(
                    records=[_copy_record(r) for r in page],
                    next_cursor=next_cursor,
                    prev_cursor=prev_cursor,
                    has_more=has_more,
                    total=total,
                ),
            )
        return result

    def _index_scan(self, table, index_name: str, spec: QuerySpec) -> np.ndarray:
        from ..models.schema import DataType

        sidx = table.sorted_indexes[index_name]
        first = sidx.fields[0]
        fs = table.schema.field_map.get(first)

        def coerce(v):
            # quoted numerics compare numerically (reference quirk)
            if fs is not None and isinstance(v, str) and fs.type in (
                DataType.integer, DataType.bigInt, DataType.double, DataType.datetime
            ):
                try:
                    fv = float(v)
                    return int(fv) if fv.is_integer() and fs.type != DataType.double else fv
                except ValueError:
                    return v
            return v

        lo = hi = None
        lo_open = hi_open = False
        leaves = spec.condition.and_leaves() if spec.condition else []
        for f, op, v in leaves:
            if f != first:
                continue
            v = coerce(v) if not isinstance(v, tuple) else tuple(coerce(x) for x in v)
            if op == "=":
                lo = hi = v
            elif op == ">":
                lo, lo_open = v, True
            elif op == ">=":
                lo = v
            elif op == "<":
                hi, hi_open = v, True
            elif op == "<=":
                hi = v
            elif op == "between":
                lo, hi = v
        # index scan only needs SUPERSET semantics (the residual predicate
        # re-filters) — widen float bounds on integer columns
        import math

        if fs is not None and fs.type in (DataType.integer, DataType.bigInt, DataType.datetime):
            if isinstance(lo, float):
                lo, lo_open = math.floor(lo), False
            if isinstance(hi, float):
                hi, hi_open = math.ceil(hi), False
        if lo is None and hi is None:
            return sidx.ordered_rows(table.store)
        return sidx.range_rows(table.store, lo, hi, lo_open, hi_open)

    def _join(self, space: str, records: list[dict], j: JoinSpec) -> list[dict]:
        right = self.db._table(j.table, space)
        rstore = right.store
        rrows = np.flatnonzero(rstore.valid_view())
        rvals = rstore.column_view(j.right_field)[rrows]
        rmap: dict = {}
        for rr, rv in zip(rrows, rvals):
            if rv is not None:
                rmap.setdefault(rv, []).append(rr)

        out = []
        matched_right = set()
        for rec in records:
            lv = rec.get(j.left_field)
            hits = rmap.get(lv, []) if lv is not None else []
            if hits:
                for rr in hits:
                    matched_right.add(rr)
                    rrec = rstore.read_row(rr)
                    rrec.pop("_system_ingest_ts_ms", None)
                    merged = dict(rec)
                    for k, v in rrec.items():
                        merged.setdefault(k, v)
                        merged[f"{j.table}.{k}"] = v
                    out.append(merged)
            elif j.kind == "left":
                out.append(dict(rec))
        if j.kind == "right":
            for rr in rrows:
                if rr not in matched_right:
                    rrec = rstore.read_row(rr)
                    rrec.pop("_system_ingest_ts_ms", None)
                    merged = dict(rrec)
                    for k, v in rrec.items():
                        merged[f"{j.table}.{k}"] = v
                    out.append(merged)
        return out

    def _aggregate(self, records: list[dict], spec: QuerySpec):
        from ..models.results import QueryResult

        groups: dict[tuple, list[dict]] = {}
        for r in records:
            key = tuple(r.get(g) for g in spec.group_by) if spec.group_by else ()
            groups.setdefault(key, []).append(r)

        aggs = spec.aggregates or [Agg.count()]
        out = []
        for key, recs in groups.items():
            row = dict(zip(spec.group_by, key))
            for a in aggs:
                vals = [r.get(a.field) for r in recs] if a.field else [1] * len(recs)
                row[a.name] = a.apply(vals)
            out.append(row)
        if spec.having is not None:
            out = [r for r in out if spec.having.matches(r)]
        if spec.order_by:
            out.sort(
                key=lambda r: tuple(
                    _sort_key(r.get(f)) if not desc else _NegKey(_sort_key(r.get(f)))
                    for f, desc in spec.order_by
                )
            )
        total = len(out)
        if spec.offset or spec.limit:
            end = spec.offset + spec.limit if spec.limit else None
            out = out[spec.offset : end]
        return QueryResult(records=out, total=total)


class _NegKey:
    """Inverts comparison for descending sort of heterogeneous keys."""

    __slots__ = ("k",)

    def __init__(self, k):
        self.k = k

    def __lt__(self, other):
        return other.k < self.k

    def __eq__(self, other):
        return self.k == other.k

    def __le__(self, other):
        return other.k <= self.k

    def __gt__(self, other):
        return other.k > self.k

    def __ge__(self, other):
        return other.k >= self.k
