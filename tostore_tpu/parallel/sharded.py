"""Sharded kernels + the sharded flat index.

Per-shard partial top-k + ICI all_gather merge (BASELINE config #5): each
chip scans only its corpus stripe with the same fused kernel as the
single-chip path, produces k local candidates, and an `all_gather` over the
"shard" axis (k*n_shards values — tiny) merges them; the final top-k is
computed redundantly on every shard. Queries scale independently over the
"dp" axis. Index training is one `psum` data-parallel Lloyd step per
iteration.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import topk as T
from ..ops import distance as D
from ..ops.runtime import NEG_INF, ROW_BLOCK, round_up
from .mesh import (
    corpus_sharding, read_to_host, replicated, replicated_from_host,
    shard_count,
)


@functools.partial(jax.jit, static_argnames=("k", "alpha", "mesh", "mode"))
def sharded_flat_topk(q, corpus, bias, *, k: int, alpha: float = 1.0, mesh,
                      mode: str = "auto", row_scale=None):
    """q: [B, D] sharded over dp; corpus: [N, D] sharded over shard;
    bias: [N]; row_scale: optional [N] per-row dequant factors (per-vector
    int8) sharded over shard. Returns (scores [B, k], global idx [B, k])
    sharded over dp, replicated over shard."""
    n = corpus.shape[0]
    nsh = shard_count(mesh)
    n_local = n // nsh

    def local(qb, c, b, sc):
        b = b.reshape(-1)
        rs = sc.reshape(-1) if row_scale is not None else None
        s, i = T.flat_search(
            qb, c, b, k=min(k, n_local), alpha=alpha, mode=mode, row_scale=rs
        )
        if s.shape[1] < k:
            pad = k - s.shape[1]
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, pad)))
        i = i + jax.lax.axis_index("shard") * n_local
        s_all = jax.lax.all_gather(s, "shard")  # [nsh, Bl, k]
        i_all = jax.lax.all_gather(i, "shard")
        bl = s.shape[0]
        s_flat = s_all.transpose(1, 0, 2).reshape(bl, nsh * k)
        i_flat = i_all.transpose(1, 0, 2).reshape(bl, nsh * k)
        ts, pos = jax.lax.top_k(s_flat, k)
        return ts, jnp.take_along_axis(i_flat, pos, axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("shard", None), P("shard"), P("shard")),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    sc_arg = row_scale if row_scale is not None else bias  # unused placeholder
    return fn(q, corpus, bias, sc_arg)


@functools.partial(jax.jit, static_argnames=("mesh", "iters"))
def sharded_kmeans(x, centroids, valid, scales=None, *, mesh, iters: int = 1):
    """`iters` data-parallel Lloyd iterations in ONE dispatch (a scan over
    the psum step — one program instead of `iters` sequential shard_map
    dispatches): x [N, D] sharded over (dp, shard) jointly; centroids
    [K, D] replicated; valid [N] bool; scales: optional [N] per-row
    dequant factors (int8 corpora). Returns new centroids (replicated)."""
    k = centroids.shape[0]

    def local(xl, c0, vl, sc):
        vl = vl.reshape(-1)
        if scales is not None:  # dequantize int8 rows into true space
            xl = xl * sc.reshape(-1)[:, None]

        def step(c, _):
            d2 = (
                jnp.sum(xl * xl, axis=1, keepdims=True)
                - 2.0 * jnp.dot(xl, c.T, preferred_element_type=jnp.float32)
                + jnp.sum(c * c, axis=1)[None, :]
            )
            assign = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * vl[:, None]
            counts = jnp.sum(onehot, axis=0)
            sums = jnp.dot(onehot.T, xl, preferred_element_type=jnp.float32)
            counts = jax.lax.psum(counts, ("dp", "shard"))
            sums = jax.lax.psum(sums, ("dp", "shard"))
            new_c = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts, 1.0)[:, None], c,
            )
            return new_c, None

        c_out, _ = jax.lax.scan(step, c0, None, length=iters)
        return c_out

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(("dp", "shard"), None), P(), P(("dp", "shard")),
            P(("dp", "shard")),
        ),
        out_specs=P(),
        check_vma=False,
    )
    sc_arg = scales if scales is not None else valid  # unused placeholder
    return fn(x.astype(jnp.float32), centroids, valid, sc_arg)


def sharded_kmeans_step(x, centroids, valid, scales=None, *, mesh):
    """One Lloyd iteration (callers that drive their own loop)."""
    return sharded_kmeans(x, centroids, valid, scales, mesh=mesh, iters=1)


def state_vectors_f32(d: dict) -> np.ndarray:
    """Storage-space f32 rows from a sharded index state dict: int8
    states carry raw codes + per-row scales (dequantized here — the
    upsert path re-quantizes to the identical codes/scales), bf16/f32
    states upcast directly."""
    vecs = np.asarray(d["vectors"])
    if vecs.dtype == np.int8:
        return vecs.astype(np.float32) * np.asarray(
            d["scales"], np.float32
        )[:, None]
    return np.asarray(vecs, np.float32)


class ShardedFlatIndex:
    """Flat exact kNN over a mesh-sharded corpus.

    The multi-chip counterpart of vector.FlatVectorIndex: same metric and
    result semantics, corpus rows striped over the "shard" axis. Inserts
    append round-robin so stripes stay balanced (the reference's analogue
    is nodes fetching disjoint ID ranges, id_generator.dart:1300)."""

    index_type = "sharded_flat"

    def __init__(self, dims: int, mesh, metric: str = "cosine", dtype: str = "float32"):
        from ..vector.flat import _METRIC_ALIASES

        self.metric = _METRIC_ALIASES[metric]
        self.mesh = mesh
        self.dims = dims
        self.d_pad = round_up(max(dims, 128), 128)
        self.dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8,
        }[dtype]
        self.nsh = shard_count(mesh)
        self.block = ROW_BLOCK * self.nsh  # capacity granularity
        self.capacity = 0
        self.vectors = None  # [cap, d_pad] sharded over shard axis
        self.valid = None  # [cap] bool
        self.sq_norms = None  # [cap] f32
        self.scales = None  # [cap] f32 per-row dequant factors (int8 only)
        self._slot_pks = np.empty(0, dtype=object)
        self._pk_slot: dict = {}
        # per-shard next free position (round-robin fill keeps stripes even)
        self._shard_fill = np.zeros(self.nsh, np.int64)
        self.deleted_count = 0
        from ..vector.filters import FilterColumns

        self.filter_columns = FilterColumns()

    def __len__(self):
        return len(self._pk_slot)

    # slot s lives on shard s // rows_per_shard when arrays are sharded by
    # stripe; jax NamedSharding stripes contiguous blocks, so slot layout is
    # [shard0 rows | shard1 rows | ...] — we allocate per-shard regions.
    def _rows_per_shard(self):
        return self.capacity // self.nsh if self.capacity else 0

    def _ensure_capacity(self, per_shard_needed: int):
        rps = self._rows_per_shard()
        if per_shard_needed <= rps:
            return
        new_rps = max(ROW_BLOCK, round_up(per_shard_needed, ROW_BLOCK))
        new_cap = new_rps * self.nsh
        sh = corpus_sharding(self.mesh)
        sh1 = NamedSharding(self.mesh, P("shard"))
        vec = jnp.zeros((new_cap, self.d_pad), self.dtype, device=sh)
        val = jnp.zeros((new_cap,), jnp.bool_, device=sh1)
        nrm = jnp.zeros((new_cap,), jnp.float32, device=sh1)
        scl = (
            jnp.full((new_cap,), 1.0, jnp.float32, device=sh1)
            if self.dtype == jnp.int8 else None
        )
        if self.capacity:
            # re-stripe old shard regions into the new layout
            old_rps = rps
            for s in range(self.nsh):
                n_used = int(self._shard_fill[s])
                if n_used == 0:
                    continue
                src = slice(s * old_rps, s * old_rps + n_used)
                dst = s * new_rps
                vec = jax.lax.dynamic_update_slice(vec, self.vectors[src], (dst, 0))
                val = jax.lax.dynamic_update_slice(val, self.valid[src], (dst,))
                nrm = jax.lax.dynamic_update_slice(nrm, self.sq_norms[src], (dst,))
                if scl is not None:
                    scl = jax.lax.dynamic_update_slice(scl, self.scales[src], (dst,))
            pks = np.empty(new_cap, dtype=object)
            old_pk_slot = {}
            for s in range(self.nsh):
                n_used = int(self._shard_fill[s])
                for j in range(n_used):
                    pk = self._slot_pks[s * old_rps + j]
                    pks[s * new_rps + j] = pk
                    if pk is not None:
                        old_pk_slot[pk] = s * new_rps + j
            self._slot_pks = pks
            self._pk_slot = old_pk_slot
        else:
            self._slot_pks = np.empty(new_cap, dtype=object)
        self.vectors, self.valid, self.sq_norms = vec, val, nrm
        self.scales = scl
        self.capacity = new_cap

    @staticmethod
    def _balanced_take(fills: np.ndarray, k: int) -> np.ndarray:
        """How many new rows each shard receives so stripes water-fill to
        an even level (the vectorized equivalent of k argmin round-robin
        steps — the old per-record np.argmin loop cost ~1 s per 200k-row
        batch)."""
        take = np.zeros(len(fills), np.int64)
        if k <= 0:
            return take
        f = fills.astype(np.int64)
        lo, hi = int(f.min()), int(f.max()) + k
        while lo < hi:  # smallest level L with sum(max(0, L - f)) >= k
            mid = (lo + hi) // 2
            if int(np.maximum(mid - f, 0).sum()) >= k:
                hi = mid
            else:
                lo = mid + 1
        take = np.maximum(lo - f, 0)
        excess = int(take.sum()) - k
        if excess > 0:
            raised = np.flatnonzero(take > 0)
            take[raised[-excess:]] -= 1
        return take

    def upsert(self, pks, raw: np.ndarray, _prepped: np.ndarray | None = None):
        if _prepped is not None:  # already normalized + padded storage rows
            x = np.asarray(_prepped, np.float32)
        else:
            x = np.asarray(raw, np.float32)
            if self.metric == "cosine":
                x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            if self.d_pad != x.shape[1]:
                x = np.pad(x, ((0, 0), (0, self.d_pad - x.shape[1])))
        pks = list(pks)
        # assign slots: existing pks keep theirs; new ones water-fill the
        # shard stripes (vectorized; duplicates within the batch reuse the
        # first occurrence's slot)
        seen = set(self._pk_slot)
        new_count = 0
        for pk in pks:
            if pk not in seen:
                new_count += 1
                seen.add(pk)
        max_fill = int(self._shard_fill.max()) + (new_count // self.nsh + 1)
        self._ensure_capacity(max_fill)
        rps = self._rows_per_shard()
        take = self._balanced_take(self._shard_fill, new_count)
        new_slots = iter(
            np.concatenate([
                s * rps + self._shard_fill[s] + np.arange(take[s])
                for s in range(self.nsh)
            ]).tolist() if new_count else ()
        )
        self._shard_fill += take
        slots = np.empty(len(pks), np.int64)
        for j, pk in enumerate(pks):
            slot = self._pk_slot.get(pk)
            if slot is None:
                slot = next(new_slots)
                self._pk_slot[pk] = slot
                self._slot_pks[slot] = pk
            slots[j] = slot
        idx = jnp.asarray(slots, jnp.int32)
        if self.dtype == jnp.int8:
            from ..vector.corpus import quantize_int8

            enc, dq = quantize_int8(x)
            self.vectors = self.vectors.at[idx].set(jnp.asarray(enc))
            self.scales = self.scales.at[idx].set(jnp.asarray(dq))
            deq = enc.astype(np.float32) * dq[:, None]
            self.sq_norms = self.sq_norms.at[idx].set(
                jnp.asarray(np.sum(deq * deq, axis=1))
            )
        else:
            self.vectors = self.vectors.at[idx].set(jnp.asarray(x).astype(self.dtype))
            self.sq_norms = self.sq_norms.at[idx].set(jnp.asarray(np.sum(x * x, axis=1)))
        self.valid = self.valid.at[idx].set(True)
        return slots

    def delete(self, pks) -> int:
        slots = [self._pk_slot.pop(pk, None) for pk in pks]
        slots = [s for s in slots if s is not None]
        for s in slots:
            self._slot_pks[s] = None
        if not slots:
            return 0
        self.valid = self.valid.at[jnp.asarray(slots, jnp.int32)].set(False)
        self.deleted_count += len(slots)
        return len(slots)

    # engine duck-type parity with FlatVectorIndex/IVFVectorIndex ---------

    @property
    def corpus(self):
        """The engine addresses `idx.corpus` for slot/pk/filter machinery;
        the sharded index owns its slots, so it is its own corpus."""
        return self

    @property
    def precision(self) -> str:
        if self.dtype == jnp.int8:
            return "int8"
        return "bfloat16" if self.dtype == jnp.bfloat16 else "float32"

    @property
    def deleted_ratio(self) -> float:
        used = len(self._pk_slot) + self.deleted_count
        return self.deleted_count / used if used else 0.0

    def slots_for_pks(self, pks) -> np.ndarray:
        return np.asarray([self._pk_slot.get(pk, -1) for pk in pks], np.int64)

    def compact(self):
        """Re-stripe live rows evenly across shards (one gather pass)."""
        live_pks = list(self._pk_slot)
        if not live_pks:
            self.__init__(self.dims, self.mesh, self.metric, self.precision)
            return
        slots = self.slots_for_pks(live_pks)
        idxs = jnp.asarray(slots, jnp.int32)
        vecs = read_to_host(self.vectors[idxs]).astype(np.float32)
        if self.dtype == jnp.int8:
            # dequantize: _prepped rows must be TRUE storage-space values
            # (re-quantization resets the per-vector scales otherwise)
            vecs = vecs * read_to_host(self.scales[idxs])[:, None]
        fcols = self.filter_columns.gather_host(slots)
        metric, mesh, dims, prec = self.metric, self.mesh, self.dims, self.precision
        self.__init__(dims, mesh, metric, prec)
        # vectors are already normalized/padded in storage space: bypass
        # upsert's prep by writing through the raw path
        new_slots = self.upsert(live_pks, vecs[:, : dims], _prepped=vecs)
        self.filter_columns.scatter(fcols, new_slots, self.capacity)
        self.deleted_count = 0

    def maybe_compact(self, ratio_threshold: float = 0.10):
        if self.deleted_ratio >= ratio_threshold and self.deleted_count > 0:
            self.compact()
            return True
        return False

    def state_dict(self) -> dict:
        live_pks = list(self._pk_slot)
        slots = self.slots_for_pks(live_pks)
        scales_out = None
        if live_pks:
            idxs = jnp.asarray(slots, jnp.int32)
            # vectors persist in STORAGE dtype (raw bytes through the
            # snapshot codec's native-dtype ndarray framing): bf16 at
            # 2 B/dim, int8 at 1 B/dim with its per-row scales beside it —
            # the old dequant-to-f32 form cost 2-4x the snapshot bytes
            vecs = read_to_host(self.vectors[idxs])
            if self.dtype == jnp.int8:
                scales_out = read_to_host(self.scales[idxs])
        else:
            vecs = np.zeros((0, self.d_pad), np.float32)
        return {
            "type": "sharded_flat",
            "metric": self.metric,
            "dims": self.dims,
            "precision": self.precision,
            "vectors": vecs,
            "scales": scales_out,
            "pks": live_pks,
            "filter_columns": self.filter_columns.gather_host(slots)
            if live_pks
            else {},
        }

    @staticmethod
    def from_state_dict(d: dict, mesh) -> "ShardedFlatIndex":
        idx = ShardedFlatIndex(d["dims"], mesh, d["metric"], d["precision"])
        if d["pks"]:
            vecs = state_vectors_f32(d)
            slots = idx.upsert(d["pks"], vecs[:, : d["dims"]], _prepped=vecs)
            idx.filter_columns.scatter(d.get("filter_columns", {}), slots, idx.capacity)
        return idx

    def search(self, q, top_k: int = 10, threshold=None, slot_mask=None, **kw):
        """kw (e.g. nprobe) forwards to the subclass's search_arrays."""
        from ..models.results import VectorSearchResult

        dist, pks = self.search_arrays(q, top_k, slot_mask=slot_mask, **kw)
        dist, pks = dist[0], pks[0]
        score = np.asarray(
            D.distances_to_scores(
                self.metric, jnp.asarray(np.where(np.isfinite(dist), dist, 0))
            )
        )
        out = []
        for j in range(len(pks)):
            if pks[j] is None or not np.isfinite(dist[j]):
                continue
            if threshold is not None and dist[j] > threshold:
                continue
            out.append(
                VectorSearchResult(
                    primary_key=pks[j], distance=float(dist[j]), score=float(score[j])
                )
            )
        return out

    def search_arrays(self, q, k: int, slot_mask=None, mode: str = "auto"):
        if self.capacity == 0 or len(self) == 0:
            b = 1 if np.asarray(q).ndim == 1 else np.asarray(q).shape[0]
            return (
                np.full((b, k), np.inf, np.float32),
                np.full((b, k), None, dtype=object),
            )
        qx = np.asarray(q, np.float32)
        single = qx.ndim == 1
        if single:
            qx = qx[None]
        qsq = np.sum(qx * qx, axis=1)
        if self.metric == "cosine":
            qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        if self.d_pad != qx.shape[1]:
            qx = np.pad(qx, ((0, 0), (0, self.d_pad - qx.shape[1])))
        # pad B to dp multiple
        dp = self.mesh.shape["dp"]
        b = qx.shape[0]
        b_pad = round_up(b, dp)
        if b_pad != b:
            qx = np.pad(qx, ((0, b_pad - b), (0, 0)))
        qj = replicated_from_host(qx, self.mesh, P("dp", None))
        norms = self.sq_norms if self.metric == "l2" else None
        valid = self.valid
        if slot_mask is not None:
            valid = jnp.logical_and(valid, jnp.asarray(slot_mask))
        bias = D.make_bias(self.metric, norms, valid)
        alpha = D.metric_alpha(self.metric)
        scores, idx = sharded_flat_topk(
            qj, self.vectors, bias, k=k, alpha=alpha, mesh=self.mesh,
            mode=mode, row_scale=self.scales,
        )
        scores = read_to_host(scores)[:b]
        idx = read_to_host(idx)[:b]
        dists = D.scores_to_distances_np(self.metric, scores, qsq)
        idx_np = np.asarray(idx, np.int64)
        miss = np.asarray(scores) <= NEG_INF / 2
        dists[miss] = np.inf
        pks = np.empty(idx_np.shape, dtype=object)
        flat = pks.reshape(-1)
        for j, s in enumerate(idx_np.reshape(-1)):
            flat[j] = self._slot_pks[s] if 0 <= s < self.capacity else None
        pks[miss] = None
        return dists, pks
