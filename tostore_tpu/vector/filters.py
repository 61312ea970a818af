"""Device-resident predicate columns for hybrid filtered search.

BASELINE.json config #4 wants the structured predicate evaluated as a
bitmask *inside* the distance kernel. The host could compute the mask and
upload it, but that ships N bools per filtered query; instead, columns
referenced by predicates live as device arrays aligned with the vector
corpus slots, and a QueryCondition compiles to a few element-wise device
ops producing the mask directly in HBM — only the comparison scalars
travel.

Column kinds:
  - "float" (double/boolean fields): one f32 array; None encodes as NaN
    (comparisons with NaN are False, matching SQL-ish null semantics).
  - "int" (integer/bigInt/datetime fields): an exact (hi int32, lo uint32,
    isnull bool) triple with lexicographic pair comparisons — a single f32
    column cannot distinguish epoch-millisecond timestamps closer than
    ~131 s (24-bit mantissa), which silently corrupted equality/range
    filters.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..query.condition import QueryCondition

_DEVICE_OPS = {"=", "!=", ">", "<", ">=", "<=", "between", "in", "is", "isNot"}
_MAX_IN = 16  # larger IN lists fall back to the host path
_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1


def _int_pair(v: int) -> tuple[int, int]:
    return (v >> 32, v & 0xFFFFFFFF)


class FilterColumns:
    """Slot-aligned predicate columns living next to a DeviceCorpus."""

    def __init__(self):
        self.columns: dict[str, jax.Array] = {}  # float kind: f32 [cap]
        # int kind: name -> (hi i32 [cap], lo u32 [cap], isnull bool [cap])
        self.int_columns: dict[str, tuple[jax.Array, jax.Array, jax.Array]] = {}

    def names(self) -> set[str]:
        return set(self.columns) | set(self.int_columns)

    def ensure(self, name: str, capacity: int):
        if name in self.columns:
            col = self.columns[name]
            if col.shape[0] < capacity:
                new = jnp.full((capacity,), jnp.nan, jnp.float32)
                self.columns[name] = jax.lax.dynamic_update_slice(new, col, (0,))
        elif name in self.int_columns:
            hi, lo, nu = self.int_columns[name]
            if hi.shape[0] < capacity:
                nhi = jnp.zeros((capacity,), jnp.int32)
                nlo = jnp.zeros((capacity,), jnp.uint32)
                nnu = jnp.ones((capacity,), jnp.bool_)
                self.int_columns[name] = (
                    jax.lax.dynamic_update_slice(nhi, hi, (0,)),
                    jax.lax.dynamic_update_slice(nlo, lo, (0,)),
                    jax.lax.dynamic_update_slice(nnu, nu, (0,)),
                )

    def update(self, name: str, slots: np.ndarray, values: list, capacity: int,
               kind: str = "float"):
        idx = jnp.asarray(slots, jnp.int32)
        if kind == "int":
            if name not in self.int_columns:
                self.int_columns[name] = (
                    jnp.zeros((capacity,), jnp.int32),
                    jnp.zeros((capacity,), jnp.uint32),
                    jnp.ones((capacity,), jnp.bool_),
                )
            self.ensure(name, capacity)
            his = np.zeros(len(values), np.int32)
            los = np.zeros(len(values), np.uint32)
            nus = np.zeros(len(values), np.bool_)
            for j, v in enumerate(values):
                if v is None:
                    nus[j] = True
                else:
                    iv = int(v)
                    if not (_I64_MIN <= iv <= _I64_MAX):
                        raise OverflowError(f"{name}: {iv} out of int64 range")
                    h, l = _int_pair(iv)
                    his[j], los[j] = h, l
            hi, lo, nu = self.int_columns[name]
            self.int_columns[name] = (
                hi.at[idx].set(jnp.asarray(his)),
                lo.at[idx].set(jnp.asarray(los)),
                nu.at[idx].set(jnp.asarray(nus)),
            )
        else:
            if name not in self.columns:
                self.columns[name] = jnp.full((capacity,), jnp.nan, jnp.float32)
            self.ensure(name, capacity)
            vals = np.asarray(
                [math.nan if v is None else float(v) for v in values], np.float32
            )
            self.columns[name] = self.columns[name].at[idx].set(jnp.asarray(vals))

    def gather_permute(self, gather: jax.Array, new_cap: int):
        """Re-pack all columns through a slot permutation (compaction)."""
        m = gather.shape[0]
        for name, col in list(self.columns.items()):
            new = jnp.full((new_cap,), jnp.nan, jnp.float32)
            if m:
                new = new.at[:m].set(col[gather])
            self.columns[name] = new
        for name, (hi, lo, nu) in list(self.int_columns.items()):
            nhi = jnp.zeros((new_cap,), jnp.int32)
            nlo = jnp.zeros((new_cap,), jnp.uint32)
            nnu = jnp.ones((new_cap,), jnp.bool_)
            if m:
                nhi = nhi.at[:m].set(hi[gather])
                nlo = nlo.at[:m].set(lo[gather])
                nnu = nnu.at[:m].set(nu[gather])
            self.int_columns[name] = (nhi, nlo, nnu)

    def gather_host(self, slots) -> dict:
        """Host-side snapshot of the columns at the given slots."""
        idx = jnp.asarray(np.asarray(slots), jnp.int32)
        return {
            "float": {k: np.asarray(v[idx]) for k, v in self.columns.items()},
            "int": {
                k: (np.asarray(hi[idx]), np.asarray(lo[idx]), np.asarray(nu[idx]))
                for k, (hi, lo, nu) in self.int_columns.items()
            },
        }

    def scatter(self, host_state: dict, slots, capacity: int):
        """Write a gather_host snapshot back at (possibly different) slots."""
        idx = jnp.asarray(np.asarray(slots), jnp.int32)
        for k, v in host_state.get("float", {}).items():
            if k not in self.columns:
                self.columns[k] = jnp.full((capacity,), jnp.nan, jnp.float32)
            self.ensure(k, capacity)
            self.columns[k] = self.columns[k].at[idx].set(jnp.asarray(v, jnp.float32))
        for k, (hi, lo, nu) in host_state.get("int", {}).items():
            if k not in self.int_columns:
                self.int_columns[k] = (
                    jnp.zeros((capacity,), jnp.int32),
                    jnp.zeros((capacity,), jnp.uint32),
                    jnp.ones((capacity,), jnp.bool_),
                )
            self.ensure(k, capacity)
            chi, clo, cnu = self.int_columns[k]
            self.int_columns[k] = (
                chi.at[idx].set(jnp.asarray(hi, jnp.int32)),
                clo.at[idx].set(jnp.asarray(lo, jnp.uint32)),
                cnu.at[idx].set(jnp.asarray(nu, jnp.bool_)),
            )

    def state_dict(self, upto: int | None = None):
        s = slice(None, upto)
        return {
            "float": {k: np.asarray(v[s]) for k, v in self.columns.items()},
            "int": {
                k: (np.asarray(hi[s]), np.asarray(lo[s]), np.asarray(nu[s]))
                for k, (hi, lo, nu) in self.int_columns.items()
            },
        }

    def load_state_dict(self, d, capacity: int):
        # legacy flat format: {name: f32 array}
        if d and "float" not in d and "int" not in d:
            d = {"float": d, "int": {}}
        for k, v in d.get("float", {}).items():
            full = jnp.full((capacity,), jnp.nan, jnp.float32)
            self.columns[k] = full.at[: len(v)].set(jnp.asarray(v, jnp.float32))
        for k, (hi, lo, nu) in d.get("int", {}).items():
            m = len(hi)
            nhi = jnp.zeros((capacity,), jnp.int32).at[:m].set(jnp.asarray(hi, jnp.int32))
            nlo = jnp.zeros((capacity,), jnp.uint32).at[:m].set(jnp.asarray(lo, jnp.uint32))
            nnu = jnp.ones((capacity,), jnp.bool_).at[:m].set(jnp.asarray(nu, jnp.bool_))
            self.int_columns[k] = (nhi, nlo, nnu)


def _coerce_scalar(v) -> float | None:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)  # quoted-numeric reference quirk
        except ValueError:
            return None
    return None


def _coerce_int_scalar(v) -> int | float | None:
    """For int columns: exact int, or a non-integral float (handled by
    bound adjustment), or None if unusable."""
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v if _I64_MIN <= v <= _I64_MAX else None
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, str):
        try:
            f = float(v)
        except ValueError:
            return None
        return int(f) if f.is_integer() else f
    return None


def compilable(cond: QueryCondition, available: set[str]) -> bool:
    """Can this condition tree evaluate fully on device columns?"""
    for f, op, v in cond._clauses:
        if f not in available or op not in _DEVICE_OPS:
            return False
        if op in ("is", "isNot"):
            if v is not None:
                return False
        elif op == "between":
            if any(_coerce_scalar(x) is None for x in v):
                return False
        elif op == "in":
            if len(v) > _MAX_IN or any(_coerce_scalar(x) is None for x in v):
                return False
        elif _coerce_scalar(v) is None:
            return False
    return all(compilable(c, available) for c in cond._and + cond._or)


def _float_leaf(col, op, v, capacity):
    s = _coerce_scalar(v)
    return {
        "=": col == s,
        "!=": (col != s) & ~jnp.isnan(col),
        ">": col > s,
        "<": col < s,
        ">=": col >= s,
        "<=": col <= s,
    }[op]


def _int_leaf(hi, lo, nu, op, v, capacity):
    s = _coerce_int_scalar(v)
    if s is None:
        return jnp.zeros((capacity,), jnp.bool_)
    if isinstance(s, float):  # non-integral bound: adjust to int semantics
        if op == "=":
            return jnp.zeros((capacity,), jnp.bool_)
        if op == "!=":
            return ~nu
        if op in (">", ">="):
            op, s = ">=", math.ceil(s)
        else:  # <, <=
            op, s = "<=", math.floor(s)
    shi, slo = _int_pair(int(s))
    shi = jnp.int32(shi)
    slo = jnp.uint32(slo)
    eq = (hi == shi) & (lo == slo)
    gt = (hi > shi) | ((hi == shi) & (lo > slo))
    ok = ~nu
    return {
        "=": eq & ok,
        "!=": (~eq) & ok,
        ">": gt & ok,
        ">=": (gt | eq) & ok,
        "<": (~gt) & (~eq) & ok,
        "<=": (~gt) & ok,
    }[op]


def device_mask(cond: QueryCondition, fc: FilterColumns, capacity: int):
    """Compile + evaluate the condition into a bool [capacity] device mask.
    Caller must have checked `compilable` against fc.names() first."""
    if not cond._clauses and not cond._and:
        # OR-only node must not be vacuously true (see condition.matches)
        if not cond._or:
            return jnp.ones((capacity,), jnp.bool_)
        alt = jnp.zeros((capacity,), jnp.bool_)
        for c in cond._or:
            alt = alt | device_mask(c, fc, capacity)
        return alt
    m = jnp.ones((capacity,), jnp.bool_)
    for f, op, v in cond._clauses:
        is_int = f in fc.int_columns
        if is_int:
            hi, lo, nu = fc.int_columns[f]
        else:
            col = fc.columns[f]
        if op == "is":  # IS NULL
            leaf = nu if is_int else jnp.isnan(col)
        elif op == "isNot":
            leaf = ~nu if is_int else ~jnp.isnan(col)
        elif op == "between":
            lo_v, hi_v = v
            if is_int:
                leaf = _int_leaf(hi, lo, nu, ">=", lo_v, capacity) & _int_leaf(
                    hi, lo, nu, "<=", hi_v, capacity
                )
            else:
                leaf = _float_leaf(col, ">=", lo_v, capacity) & _float_leaf(
                    col, "<=", hi_v, capacity
                )
        elif op == "in":
            leaf = jnp.zeros((capacity,), jnp.bool_)
            for x in v:
                leaf = leaf | (
                    _int_leaf(hi, lo, nu, "=", x, capacity)
                    if is_int
                    else _float_leaf(col, "=", x, capacity)
                )
        else:
            leaf = (
                _int_leaf(hi, lo, nu, op, v, capacity)
                if is_int
                else _float_leaf(col, op, v, capacity)
            )
        m = m & leaf
    for c in cond._and:
        m = m & device_mask(c, fc, capacity)
    if cond._or:
        alt = jnp.zeros((capacity,), jnp.bool_)
        for c in cond._or:
            alt = alt | device_mask(c, fc, capacity)
        m = m | alt
    return m
