"""Device-resident predicate columns for hybrid filtered search.

BASELINE.json config #4 wants the structured predicate evaluated as a
bitmask *inside* the distance kernel. The host could compute the mask and
upload it, but that ships N bools per filtered query; instead, numeric/
boolean/datetime columns referenced by predicates live as f32 device arrays
aligned with the vector corpus slots, and a QueryCondition compiles to a
few element-wise device ops producing the mask directly in HBM — only the
comparison scalars travel.

Nulls are encoded as NaN (every comparison with NaN is False, which matches
SQL-ish null semantics for ordered comparisons and equality).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..query.condition import QueryCondition

_DEVICE_OPS = {"=", "!=", ">", "<", ">=", "<=", "between", "in", "is", "isNot"}
_MAX_IN = 16  # larger IN lists fall back to the host path


def encode_filter_value(v) -> float:
    """Host-side scalar -> the f32 the device column stores."""
    if v is None:
        return math.nan
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    raise TypeError(f"not device-filterable: {type(v)}")


class FilterColumns:
    """Slot-aligned f32 columns living next to a DeviceCorpus."""

    def __init__(self):
        self.columns: dict[str, jax.Array] = {}

    def ensure(self, name: str, capacity: int):
        col = self.columns.get(name)
        if col is None or col.shape[0] < capacity:
            new = jnp.full((capacity,), jnp.nan, jnp.float32)
            if col is not None:
                new = jax.lax.dynamic_update_slice(new, col, (0,))
            self.columns[name] = new

    def update(self, name: str, slots: np.ndarray, values: list, capacity: int):
        self.ensure(name, capacity)
        vals = np.asarray([encode_filter_value(v) for v in values], np.float32)
        self.columns[name] = self.columns[name].at[jnp.asarray(slots, jnp.int32)].set(
            jnp.asarray(vals)
        )

    def state_dict(self):
        return {k: np.asarray(v) for k, v in self.columns.items()}

    def load_state_dict(self, d):
        self.columns = {k: jnp.asarray(v, jnp.float32) for k, v in d.items()}


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


def device_mask(cond: QueryCondition, columns: dict[str, jax.Array], capacity: int):
    """Compile + evaluate the condition into a bool [capacity] device mask.
    Caller must have checked `compilable` first."""
    m = jnp.ones((capacity,), jnp.bool_)
    for f, op, v in cond._clauses:
        col = columns[f]
        if op == "is":  # IS NULL
            leaf = jnp.isnan(col)
        elif op == "isNot":
            leaf = ~jnp.isnan(col)
        elif op == "between":
            lo, hi = (_coerce_scalar(x) for x in v)
            leaf = (col >= lo) & (col <= hi)
        elif op == "in":
            leaf = jnp.zeros((capacity,), jnp.bool_)
            for x in v:
                leaf = leaf | (col == _coerce_scalar(x))
        else:
            s = _coerce_scalar(v)
            leaf = {
                "=": col == s,
                "!=": (col != s) & ~jnp.isnan(col),
                ">": col > s,
                "<": col < s,
                ">=": col >= s,
                "<=": col <= s,
            }[op]
        m = m & leaf
    for c in cond._and:
        m = m & device_mask(c, columns, capacity)
    if cond._or:
        alt = jnp.zeros((capacity,), jnp.bool_)
        for c in cond._or:
            alt = alt | device_mask(c, columns, capacity)
        m = m | alt
    return m
