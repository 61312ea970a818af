"""DeviceCorpus — a growable, mutable vector matrix in HBM.

This replaces the reference's entire NGH storage substrate: 16 KB paged
raw-vector/graph/PQ pages with nodeId->(partition,page,slot) math
(ngh_page.dart:145-450, ngh_index_meta.dart:451-490), free-list page
allocation (ngh_partition_manager.dart:607), tombstone flags
(NghNodeFlags.deleted, ngh_page.dart:105) and the BFS locality reorder
(vector_index_manager.dart:932). On TPU the corpus is one block-padded
[capacity, D_pad] device array plus a validity mask:

  - slot allocation = a host-side free list + monotonically growing tail
    (the reference's nextNodeId, ngh_index_meta.dart:77);
  - delete = clearing a validity bit (tombstone);
  - compaction/reorder = ONE device gather that re-packs live rows
    (the reference needs a 3-page-kind rebuild with id remapping);
  - capacity growth = allocate a larger array and copy (amortized doubling
    in ROW_BLOCK units so shapes stay kernel-aligned and jit caches stay
    warm across many inserts).

Primary-key mapping (the reference's nodeId<->PK dual B+Trees,
vector_index_manager.dart:1256) is a host numpy object array slot->pk plus
a dict pk->slot; top-k index gathers resolve through numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.runtime import (
    LANE, ROW_BLOCK, download_rows, round_up, upload_rows,
)

_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float32,  # stored f32 on device (reference-compat alias)
    "bfloat16": jnp.bfloat16,
    "int8": jnp.int8,
}

# Legacy int8 dequant rule value/127 (reference ngh_page.dart:310-450
# int8 raw-vector pages): kept for PRE-EXISTING snapshots. New int8 rows
# store a PER-VECTOR dequant factor scale_i = max|x_i|/127 (ScaNN/FAISS-SQ
# style), which neither clips values outside [-1, 1] nor wastes the int8
# range on small-magnitude normalized vectors (at D=768 a unit row's
# entries are ~1/sqrt(D) ~ 0.036 -> the global rule quantizes them to
# +-5 levels; per-vector scaling recovers the full +-127).
INT8_SCALE = 127.0


def quantize_int8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vector int8 quantization: (codes int8, dequant factors f32) with
    scale_i = max|x_i|/INT8_SCALE (1/INT8_SCALE for all-zero rows). The ONE
    implementation shared by DeviceCorpus and the mesh-sharded indexes."""
    amax = np.max(np.abs(x), axis=1)
    dq = np.where(amax > 0, amax / INT8_SCALE, 1.0 / INT8_SCALE).astype(np.float32)
    enc = np.clip(np.round(x / dq[:, None]), -INT8_SCALE, INT8_SCALE).astype(np.int8)
    return enc, dq


class DeviceCorpus:
    """Mutable [capacity, D_pad] device matrix with tombstones and PK map."""

    def __init__(self, dims: int, precision: str = "float32", normalize: bool = False):
        if precision not in _DTYPES:
            raise ValueError(f"unsupported precision {precision!r}")
        self.dims = dims
        self.d_pad = round_up(max(dims, LANE), LANE)
        self.precision = precision
        self.dtype = _DTYPES[precision]
        self.normalize = normalize  # cosine metric stores L2-normalized rows

        self.capacity = 0
        self.vectors: jax.Array | None = None  # [capacity, d_pad] dtype
        self.valid: jax.Array | None = None  # [capacity] bool
        self.sq_norms: jax.Array | None = None  # [capacity] f32 (of stored rows)
        # per-row dequant factor (int8 only): x = enc * scales[i]
        self.scales: jax.Array | None = None  # [capacity] f32

        self._slot_pks = np.empty(0, dtype=object)  # slot -> pk
        self._pk_slot: dict = {}  # pk -> slot
        self._free: list[int] = []
        self._high = 0  # first never-used slot
        self.deleted_count = 0

        # slot-aligned device predicate columns (vector/filters.py); owned
        # here so compaction re-packs them with the vectors
        from .filters import FilterColumns

        self.filter_columns = FilterColumns()

    # --- capacity ---------------------------------------------------------

    def __len__(self) -> int:
        return len(self._pk_slot)

    @property
    def live_count(self) -> int:
        return len(self._pk_slot)

    @property
    def deleted_ratio(self) -> float:
        used = self._high
        return (self.deleted_count / used) if used else 0.0

    @staticmethod
    def canonical_cap(n_slots: int) -> int:
        """Canonical capacity covering n_slots: block count rounded up to a
        3-fraction-bit float (m * 2^e blocks, m in [8, 15]). Every kernel
        that closes over the capacity (flat scan, IVF place/probe, growth
        copies) then compiles against a small recurring shape family
        instead of one shape per workload's growth history — on a tunneled
        TPU where one remote kernel compile costs 20-40 s, recurring
        shapes turn a bulk load's first search from a compile storm into
        persistent-cache hits (r5: the BENCH #12 'vec ingest' was ~85%
        compiles, not data). Pure powers of two would bound the family
        harder but cost up to +100% scan overscan just above a boundary
        (the scan reads ALL capacity rows, masked by validity bias);
        eighth-steps cap overscan at 1/8 (~6% typical) while a monotonic
        doubling load still touches only log-many members."""
        blocks = max(1, (n_slots + ROW_BLOCK - 1) // ROW_BLOCK)
        if blocks <= 8:
            return ROW_BLOCK * blocks
        e = blocks.bit_length() - 4  # blocks >> e lands in [8, 15]
        m = (blocks + (1 << e) - 1) >> e  # ceil(blocks / 2^e)
        if m == 16:
            m, e = 8, e + 1
        return ROW_BLOCK * (m << e)

    def _ensure_capacity(self, n_slots: int):
        if n_slots <= self.capacity:
            return
        new_cap = n_slots
        if self.capacity:
            new_cap = max(new_cap, 2 * self.capacity)  # amortized doubling
        new_cap = self.canonical_cap(new_cap)
        vec = jnp.zeros((new_cap, self.d_pad), self.dtype)
        val = jnp.zeros((new_cap,), jnp.bool_)
        nrm = jnp.zeros((new_cap,), jnp.float32)
        scl = (
            jnp.full((new_cap,), 1.0 / INT8_SCALE, jnp.float32)
            if self.precision == "int8" else None
        )
        if self.capacity:
            vec = jax.lax.dynamic_update_slice(vec, self.vectors, (0, 0))
            val = jax.lax.dynamic_update_slice(val, self.valid, (0,))
            nrm = jax.lax.dynamic_update_slice(nrm, self.sq_norms, (0,))
            if scl is not None:
                scl = jax.lax.dynamic_update_slice(scl, self.scales, (0,))
        self.vectors, self.valid, self.sq_norms = vec, val, nrm
        self.scales = scl
        pks = np.empty(new_cap, dtype=object)
        pks[: len(self._slot_pks)] = self._slot_pks
        self._slot_pks = pks
        self.capacity = new_cap

    # --- host-side encode -------------------------------------------------

    def _prepare(self, raw: np.ndarray):
        """[m, dims] float input -> ([m, d_pad] host array in storage dtype,
        [m] f32 per-row dequant factors or None)."""
        x = np.asarray(raw, np.float32)
        if x.ndim != 2 or x.shape[1] != self.dims:
            raise ValueError(f"expected [m, {self.dims}] vectors, got {x.shape}")
        if self.normalize:
            n = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(n, 1e-12)
        if self.d_pad != self.dims:
            x = np.pad(x, ((0, 0), (0, self.d_pad - self.dims)))
        if self.precision == "int8":
            return quantize_int8(x)
        return x, None

    def _stored_sq_norms(self, enc: np.ndarray, dq: np.ndarray | None) -> np.ndarray:
        # no-copy when enc is already f32 (bf16 corpora encode from f32;
        # the old unconditional astype copied the whole batch)
        x = enc if enc.dtype == np.float32 else enc.astype(np.float32)
        if dq is not None:
            x = x * dq[:, None]
        return np.einsum("ij,ij->i", x, x)

    # --- mutation ----------------------------------------------------------

    def upsert(self, pks, raw: np.ndarray) -> np.ndarray:
        """Insert or overwrite vectors for `pks`. Returns slot indices."""
        pks = list(pks)
        enc, dq = self._prepare(raw)
        if len(pks) != enc.shape[0]:
            raise ValueError("pks/vectors length mismatch")
        m = len(pks)
        if m == 0:
            return np.zeros(0, np.int64)
        if not self._free and not self._pk_slot:
            # bulk-load fast path (empty corpus, all pks new): vectorized
            # slot assignment — the 200k-iteration per-pk dict loop was a
            # visible slice of the r4 soak's first flush
            slots = np.arange(self._high, self._high + m, dtype=np.int64)
            self._high += m
            self._pk_slot = dict(zip(pks, slots.tolist()))
            self._ensure_capacity(self._high)
            self._slot_pks[slots] = np.asarray(pks, dtype=object)
        else:
            slots = np.empty(m, np.int64)
            for j, pk in enumerate(pks):
                slot = self._pk_slot.get(pk)
                if slot is None:
                    if self._free:
                        slot = self._free.pop()
                        self.deleted_count = max(0, self.deleted_count - 1)
                    else:
                        slot = self._high
                        self._high += 1
                    self._pk_slot[pk] = slot
                slots[j] = slot
            self._ensure_capacity(self._high)
            for j, pk in enumerate(pks):
                self._slot_pks[slots[j]] = pk

        # convert on host (~4 GB/s) so the tunnel moves the STORED dtype's
        # bytes: half the wire for a bf16 corpus vs shipping f32 and
        # converting on device
        host = np.asarray(enc).astype(np.dtype(self.dtype), copy=False)
        nrm = self._stored_sq_norms(enc, dq)
        # contiguous-slot batches (bulk loads: fresh slots are consecutive)
        # ride ONE dynamic_update_slice per array — a contiguous block
        # copy. XLA lowers a multi-row scatter on TPU essentially row-at-
        # a-time: 8 waves of 25k-row .at[idx].set measured 237 s on a v5e
        # where the same bytes as update-slices take ~2 s. Blocks pad to a
        # power of two (valid=False rows past the batch) so the program
        # compiles once per (capacity, pow2) instead of per drain size.
        start = int(slots[0])
        if m >= 64 and np.array_equal(slots, np.arange(start, start + m)):
            bucket = 1 << (m - 1).bit_length()
            self._ensure_capacity(start + bucket)
            pad = bucket - m
            if pad:
                nrm = np.concatenate([nrm, np.zeros(pad, nrm.dtype)])
            val_block = np.zeros(bucket, np.bool_)
            val_block[:m] = True
            pos = (jnp.int32(start),)
            # vectors stream in <=H2D_CHUNK_BYTES chunks (upload_rows):
            # one 200 MB async transfer measured 47-257 s through the
            # tunnel vs 1.5 s as ~50 MB waves. Only the EXACT m rows ship
            # — pad rows keep whatever bytes the buffer held (valid=False
            # masks them everywhere, same as tombstoned slots); the 1-D
            # arrays pad to the pow2 bucket so their tiny update programs
            # stay a log-size shape family.
            self.vectors = upload_rows(self.vectors, host, start)
            self.valid = jax.lax.dynamic_update_slice(
                self.valid, jnp.asarray(val_block), pos
            )
            self.sq_norms = jax.lax.dynamic_update_slice(
                self.sq_norms, jnp.asarray(nrm, jnp.float32), pos
            )
            if dq is not None:
                dqb = np.concatenate(
                    [dq, np.full(pad, 1.0 / INT8_SCALE, np.float32)]
                ) if pad else dq
                self.scales = jax.lax.dynamic_update_slice(
                    self.scales, jnp.asarray(dqb, jnp.float32), pos
                )
            return slots
        # general (overwrite / free-list reuse) path: row scatter
        idx = jnp.asarray(slots, jnp.int32)
        self.vectors = self.vectors.at[idx].set(jnp.asarray(host))
        self.valid = self.valid.at[idx].set(True)
        self.sq_norms = self.sq_norms.at[idx].set(jnp.asarray(nrm))
        if dq is not None:
            self.scales = self.scales.at[idx].set(jnp.asarray(dq))
        return slots

    def delete(self, pks) -> int:
        """Tombstone rows for `pks`. Returns number actually deleted."""
        slots = []
        for pk in pks:
            slot = self._pk_slot.pop(pk, None)
            if slot is not None:
                slots.append(slot)
                self._slot_pks[slot] = None
                self._free.append(slot)
        if not slots:
            return 0
        idx = jnp.asarray(np.asarray(slots, np.int64), jnp.int32)
        self.valid = self.valid.at[idx].set(False)
        self.deleted_count += len(slots)
        return len(slots)

    def compact(self):
        """Re-pack live rows to the front with one device gather (the TPU
        analogue of compactTombstones + reorderByLocality,
        vector_index_manager.dart:877-1159)."""
        live = np.flatnonzero(np.asarray([pk is not None for pk in self._slot_pks[: self._high]]))
        m = len(live)
        if m == self._high and not self._free:
            return
        gather = jnp.asarray(live, jnp.int32)
        new_cap = self.canonical_cap(max(m, 1))  # same shape family as growth
        vec = jnp.zeros((new_cap, self.d_pad), self.dtype)
        vec = vec.at[: m].set(self.vectors[gather]) if m else vec
        val = jnp.zeros((new_cap,), jnp.bool_).at[:m].set(True) if m else jnp.zeros((new_cap,), jnp.bool_)
        nrm = jnp.zeros((new_cap,), jnp.float32)
        if m:
            nrm = nrm.at[:m].set(self.sq_norms[gather])
        self.vectors, self.valid, self.sq_norms = vec, val, nrm
        if self.scales is not None:
            scl = jnp.full((new_cap,), 1.0 / INT8_SCALE, jnp.float32)
            if m:
                scl = scl.at[:m].set(self.scales[gather])
            self.scales = scl
        self.filter_columns.gather_permute(gather, new_cap)

        pks = np.empty(new_cap, dtype=object)
        pks[:m] = self._slot_pks[live]
        self._slot_pks = pks
        self._pk_slot = {pk: j for j, pk in enumerate(pks[:m])}
        self._free = []
        self._high = m
        self.capacity = new_cap
        self.deleted_count = 0

    # --- lookup -------------------------------------------------------------

    def pks_for_slots(self, slots: np.ndarray) -> np.ndarray:
        """slot indices -> pks (object array; None for invalid/padded)."""
        out = np.empty(slots.shape, dtype=object)
        flat = slots.reshape(-1)
        res = out.reshape(-1)
        for j, s in enumerate(flat):
            res[j] = self._slot_pks[s] if 0 <= s < self.capacity else None
        return out

    def slots_for_pks(self, pks) -> np.ndarray:
        return np.asarray([self._pk_slot.get(pk, -1) for pk in pks], np.int64)

    def get_vectors(self, pks) -> np.ndarray:
        """Fetch stored (dequantized, possibly normalized) vectors by pk."""
        slots = self.slots_for_pks(pks)
        if np.any(slots < 0):
            missing = [pk for pk, s in zip(pks, slots) if s < 0]
            raise KeyError(f"pks not in corpus: {missing[:5]}")
        idx = jnp.asarray(slots, jnp.int32)
        x = np.asarray(self.vectors[idx], np.float32)
        if self.scales is not None:
            x = x * np.asarray(self.scales[idx])[:, None]
        return x[:, : self.dims]

    # --- persistence ----------------------------------------------------------

    def state_dict(self) -> dict:
        self.compact()  # persist a packed corpus
        m = self._high
        return {
            "dims": self.dims,
            "precision": self.precision,
            "normalize": self.normalize,
            # chunked readback: one big d2h RPC stalls like uploads do
            "vectors": (
                download_rows(self.vectors, m)
                if m else np.zeros((0, self.d_pad))
            ),
            "scales": (
                np.asarray(self.scales[:m])
                if self.scales is not None and m else None
            ),
            # persisted so restores skip a full-corpus host recompute (it
            # dominated vector-table open time in the r4 scale soak)
            "sq_norms": np.asarray(self.sq_norms[:m], np.float32) if m else None,
            "pks": list(self._slot_pks[:m]),
            "filter_columns": self.filter_columns.state_dict(upto=m),
        }

    @staticmethod
    def from_state_dict(d: dict) -> "DeviceCorpus":
        c = DeviceCorpus(d["dims"], d["precision"], d["normalize"])
        vecs = np.asarray(d["vectors"])
        pks = d["pks"]
        if len(pks):
            m = len(pks)
            c._ensure_capacity(m)
            # upload in the STORED dtype, chunked (upload_rows), converting
            # per chunk on device — the host astype pass over a multi-GB
            # corpus was a top open cost, and one-shot transfers stall
            c.vectors = upload_rows(c.vectors, vecs, 0, cast_to=c.dtype)
            c.valid = c.valid.at[:m].set(True)
            dq = d.get("scales")
            if c.precision == "int8":
                # legacy snapshots (no per-row scales) keep the global
                # value/127 rule their codes were quantized under
                dq = (
                    np.asarray(dq, np.float32)
                    if dq is not None
                    else np.full(m, 1.0 / INT8_SCALE, np.float32)
                )
                c.scales = c.scales.at[:m].set(jnp.asarray(dq))
            else:
                dq = None
            nrm = d.get("sq_norms")
            if nrm is not None and len(nrm) == m:
                nrm_dev = jnp.asarray(np.asarray(nrm, np.float32))
            else:  # legacy snapshot: recompute on DEVICE, not host numpy
                x = c.vectors[:m].astype(jnp.float32)
                if dq is not None:
                    x = x * jnp.asarray(dq)[:, None]
                nrm_dev = jnp.sum(x * x, axis=1)
            c.sq_norms = c.sq_norms.at[:m].set(nrm_dev)
            c._slot_pks[:m] = np.asarray(pks, dtype=object)
            c._pk_slot = {pk: j for j, pk in enumerate(pks)}
            c._high = m
            c.filter_columns.load_state_dict(d.get("filter_columns", {}), c.capacity)
        return c
