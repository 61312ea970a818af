"""ShardedIVFIndex — IVF over a mesh-striped corpus.

The multi-chip ANN path: centroids are trained data-parallel (psum Lloyd,
sharded.py) and replicated; every shard keeps its OWN bucket table over its
corpus stripe (bucket entries are shard-local slot positions, so probe
gathers never cross ICI). A query broadcasts to all shards, each probes the
same nprobe clusters within its stripe, scans locally, and the per-shard
top-k candidates merge with one all_gather — identical communication shape
to the sharded flat scan, with nprobe/C of the FLOPs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.results import VectorSearchResult
from ..ops import distance as D
from ..ops.runtime import NEG_INF, round_up
from ..vector.ivf import _build_core
from .mesh import query_sharding, shard_count
from .sharded import ShardedFlatIndex, sharded_kmeans_step


@functools.partial(
    jax.jit, static_argnames=("n_choices", "cap", "chunk", "l2", "mesh")
)
def _sharded_ivf_build(
    vectors, valid, centroids, *, n_choices: int, cap: int, chunk: int,
    l2: bool, mesh
):
    """Per-shard device bucket build: every shard assigns + places its
    corpus stripe locally (bucket entries are shard-local positions, as the
    probe expects), one dispatch for the whole mesh. Returns
    (buckets [nsh*C, cap], counts [nsh, C], leftover [nsh])."""

    def local(v, va, c):
        buckets, _, _, counts, leftover = _build_core(
            v, va.reshape(-1), c,
            n_choices=n_choices, cap=cap, chunk=chunk, l2=l2,
        )
        return buckets, counts[None, :], leftover[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shard", None), P("shard"), P()),
        out_specs=(P("shard", None), P("shard", None), P("shard")),
        check_vma=False,
    )
    return fn(vectors, valid, centroids)


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "mesh"))
def _sharded_ivf_probe(
    q, centroids, buckets, vectors, valid, sq_norms, alpha, *, nprobe: int, k: int, mesh
):
    """q [B, Dp] sharded over dp; centroids [C, Dp] replicated; buckets
    [nsh*C, cap] i32 shard-local positions, sharded over shard axis;
    vectors [capT, Dp] / valid / sq_norms sharded over shard axis."""
    nsh = shard_count(mesh)
    cap = buckets.shape[1]
    rps = vectors.shape[0] // nsh

    def local(qb, cents, bk, vl, va, nrm):
        va = va.reshape(-1)
        nrm = nrm.reshape(-1)
        cs = jnp.dot(qb, cents.T, preferred_element_type=jnp.float32)
        if sq_norms is not None:
            cn = jnp.sum(cents * cents, axis=1)
            cs = 2.0 * cs - cn[None, :]
        _, probe = jax.lax.top_k(cs, nprobe)  # [Bl, nprobe]

        def per_query(qv, probes):
            slots = bk[probes].reshape(nprobe * cap)  # local positions
            safe = jnp.maximum(slots, 0)
            vecs = vl[safe]
            if vecs.dtype == jnp.int8:
                vecs = vecs.astype(jnp.bfloat16)
            s = alpha * jnp.dot(
                vecs, qv.astype(vecs.dtype), preferred_element_type=jnp.float32
            )
            if sq_norms is not None:
                s = s - nrm[safe]
            ok = jnp.logical_and(slots >= 0, va[safe])
            s = jnp.where(ok, s, NEG_INF)
            kk = min(k, nprobe * cap)
            ts, ti = jax.lax.top_k(s, kk)
            gl = slots[ti] + jax.lax.axis_index("shard") * rps
            if kk < k:
                ts = jnp.pad(ts, ((0, k - kk),), constant_values=NEG_INF)
                gl = jnp.pad(gl, ((0, k - kk),))
            return ts, gl

        ts, ti = jax.vmap(per_query)(qb, probe)  # [Bl, k] local winners
        s_all = jax.lax.all_gather(ts, "shard")  # [nsh, Bl, k]
        i_all = jax.lax.all_gather(ti, "shard")
        bl = ts.shape[0]
        s_flat = s_all.transpose(1, 0, 2).reshape(bl, nsh * k)
        i_flat = i_all.transpose(1, 0, 2).reshape(bl, nsh * k)
        fs, pos = jax.lax.top_k(s_flat, k)
        return fs, jnp.take_along_axis(i_flat, pos, axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None), P(), P("shard", None), P("shard", None),
            P("shard"), P("shard"),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    nrm_arg = sq_norms if sq_norms is not None else jnp.zeros(vectors.shape[0], jnp.float32)
    return fn(q, centroids, buckets, vectors, valid, nrm_arg)


class ShardedIVFIndex(ShardedFlatIndex):
    """IVF over the striped corpus of ShardedFlatIndex. Falls back to the
    flat sharded scan until trained (same tiny-corpus behavior as the
    single-device IVFVectorIndex)."""

    index_type = "sharded_ivf"
    BALANCE_FACTOR = 2.0

    def __init__(self, dims, mesh, metric="cosine", dtype="float32",
                 num_clusters: int = 0, nprobe: int = 8, min_train_size: int = 4096):
        super().__init__(dims, mesh, metric, dtype)
        self.num_clusters_cfg = num_clusters
        self.nprobe = nprobe
        self.min_train_size = min_train_size
        self.centroids: jax.Array | None = None  # replicated [C, Dp]
        self.buckets: jax.Array | None = None  # [nsh*C, cap] local positions
        self._bucket_counts: np.ndarray | None = None  # host [nsh, C]
        self._trained_size = 0

    @property
    def trained(self) -> bool:
        return self.centroids is not None

    # --- training ----------------------------------------------------------

    def train(self, force: bool = False):
        n = len(self)
        if n < 1 or (self.trained and not force):
            return False
        from ..vector.ivf import auto_num_clusters

        num_c = self.num_clusters_cfg or auto_num_clusters(n)
        rng = np.random.default_rng(42)
        live_pks = list(self._pk_slot)
        sample_pks = (
            live_pks
            if len(live_pks) <= 65536
            else [live_pks[i] for i in rng.choice(len(live_pks), 65536, replace=False)]
        )
        slots = self.slots_for_pks(sample_pks)
        x = self.vectors[jnp.asarray(slots, jnp.int32)].astype(jnp.float32)
        num_c = min(num_c, len(sample_pks))
        init = rng.choice(len(sample_pks), num_c, replace=False)
        cents = x[jnp.asarray(init, jnp.int32)]
        # data-parallel Lloyd over the FULL sharded corpus
        for _ in range(10):
            cents = sharded_kmeans_step(self.vectors, cents, self.valid, mesh=self.mesh)
        self.centroids = jax.device_put(cents, NamedSharding(self.mesh, P()))
        self._trained_size = n
        self._rebuild_buckets()
        return True

    def _maybe_retrain(self) -> bool:
        """Returns True when a (re)train ran — train() ends in
        _rebuild_buckets(), which already places every live slot, so the
        caller must NOT append the same batch again."""
        n = len(self)
        if not self.trained:
            if n >= self.min_train_size:
                return self.train()
        elif n >= 4 * max(self._trained_size, 1):
            return self.train(force=True)
        return False

    # --- buckets -------------------------------------------------------------

    def _assign(self, slots: np.ndarray) -> np.ndarray:
        out = np.empty(len(slots), np.int64)
        for a in range(0, len(slots), 65536):
            chunk = slots[a : a + 65536]
            v = self.vectors[jnp.asarray(chunk, jnp.int32)].astype(jnp.float32)
            s = jnp.dot(v, self.centroids.T, preferred_element_type=jnp.float32)
            if self.metric == "l2":
                cn = jnp.sum(self.centroids * self.centroids, axis=1)
                s = 2.0 * s - cn[None, :]
            out[a : a + len(chunk)] = np.asarray(jnp.argmax(s, axis=1), np.int64)
        return out

    def _rebuild_buckets(self):
        num_c = self.centroids.shape[0]
        rps = self._rows_per_shard()
        live = np.fromiter(
            self._pk_slot.values(), np.int64, len(self._pk_slot)
        )
        if len(live):
            # per-shard device build (assignment + placement in one
            # dispatch); host fallback only if a shard overflows entirely
            n_live = len(live)
            avg = max(1, n_live // max(1, num_c))
            cap_d = int(
                max(64, round_up(int(self.BALANCE_FACTOR * avg / max(1, self.nsh)) + 1, 64))
            )
            buckets, counts, leftover = _sharded_ivf_build(
                self.vectors, self.valid, self.centroids,
                n_choices=3, cap=cap_d,
                chunk=min(65536, rps), l2=(self.metric == "l2"),
                mesh=self.mesh,
            )
            if int(np.asarray(leftover).sum()) == 0:
                self.buckets = buckets
                self._bucket_counts = np.array(counts, np.int64)
                return
        n_live = len(live)
        avg = max(1, n_live // max(1, num_c))  # per-cluster across shards
        cap = int(
            max(64, round_up(int(self.BALANCE_FACTOR * avg / max(1, self.nsh)) + 1, 64))
        )
        if n_live == 0:
            self.buckets = jax.device_put(
                jnp.full((self.nsh * num_c, cap), -1, jnp.int32),
                NamedSharding(self.mesh, P("shard", None)),
            )
            self._bucket_counts = np.zeros((self.nsh, num_c), np.int64)
            return
        assign = self._assign(live)
        shard_of = live // rps
        pos_in_shard = live % rps
        # per (shard, cluster) grouping with a bounded cap: overflow rows
        # spill round-robin into the same shard's non-full buckets (bounded
        # memory even when k-means collapses; a no-spill cap let one skewed
        # cluster inflate the table to C x N/nsh entries)
        group = shard_of * num_c + assign
        order = np.argsort(group, kind="stable")
        g_sorted = group[order]
        p_sorted = pos_in_shard[order]
        from ..vector.ivf import IVFVectorIndex

        within = IVFVectorIndex._group_positions(g_sorted)
        buckets = np.full((self.nsh * num_c, cap), -1, np.int32)
        keep = within < cap
        buckets[g_sorted[keep], within[keep]] = p_sorted[keep]
        counts2d = np.bincount(group[order[keep]], minlength=self.nsh * num_c).reshape(
            self.nsh, num_c
        )
        if not keep.all():
            ov_group = g_sorted[~keep]
            ov_pos = p_sorted[~keep]
            for sh in range(self.nsh):
                sel = (ov_group // num_c) == sh
                m = int(sel.sum())
                if not m:
                    continue
                free = np.repeat(
                    np.arange(num_c), np.maximum(cap - counts2d[sh], 0)
                )
                take = free[:m]  # already sorted by cluster
                cols = counts2d[sh][take] + IVFVectorIndex._group_positions(take)
                buckets[sh * num_c + take, cols] = ov_pos[sel]
                np.add.at(counts2d[sh], take, 1)
        self.buckets = jax.device_put(
            jnp.asarray(buckets), NamedSharding(self.mesh, P("shard", None))
        )
        self._bucket_counts = counts2d

    def _append_to_buckets(self, slots: np.ndarray) -> bool:
        """Incremental bucket append for freshly inserted slots; returns
        False when any bucket would overflow (caller rebuilds)."""
        num_c = self.centroids.shape[0]
        rps = self._rows_per_shard()
        cap = self.buckets.shape[1]
        assign = self._assign(slots)
        group = (slots // rps) * num_c + assign
        order = np.argsort(group, kind="stable")
        g_sorted = group[order]
        p_sorted = (slots % rps)[order]
        from ..vector.ivf import IVFVectorIndex

        within = IVFVectorIndex._group_positions(g_sorted)
        flat_counts = self._bucket_counts.reshape(-1)
        pos = flat_counts[g_sorted] + within
        if pos.max() >= cap:
            return False
        self.buckets = self.buckets.at[
            jnp.asarray(g_sorted, jnp.int32), jnp.asarray(pos, jnp.int32)
        ].set(jnp.asarray(p_sorted, jnp.int32))
        np.add.at(flat_counts, g_sorted, 1)
        self._bucket_counts = flat_counts.reshape(self.nsh, num_c)
        return True

    def upsert(self, pks, raw, _prepped=None):
        existing = [pk for pk in pks if pk in self._pk_slot]
        slots = super().upsert(pks, raw, _prepped=_prepped)
        rebuilt = self._maybe_retrain()
        if self.trained and not rebuilt:
            if existing or not self._append_to_buckets(np.asarray(slots, np.int64)):
                # overwrites may change cluster; overflow needs a new layout
                self._rebuild_buckets()
        return slots

    def compact(self):
        """Re-stripe live rows, preserving IVF configuration + training
        (the inherited compact re-runs __init__, which would reset
        num_clusters/nprobe and drop the centroids — reachable from the
        background compaction cron)."""
        cfg = (self.num_clusters_cfg, self.nprobe, self.min_train_size)
        cents, tsize = self.centroids, self._trained_size
        sup_min = self.min_train_size
        self.min_train_size = 1 << 62  # suppress retrain during re-stripe
        try:
            super().compact()
        finally:
            self.num_clusters_cfg, self.nprobe, self.min_train_size = cfg
            self.min_train_size = sup_min
        self.centroids = cents
        self._trained_size = tsize
        if self.trained:
            self._rebuild_buckets()

    # --- search -----------------------------------------------------------------

    def search_arrays(self, q, k: int, slot_mask=None, nprobe: int | None = None):
        if not self.trained or self.capacity == 0 or len(self) == 0:
            # incl. trained-but-emptied indexes restored from snapshots
            return super().search_arrays(q, k, slot_mask=slot_mask)
        qx = np.asarray(q, np.float32)
        single = qx.ndim == 1
        if single:
            qx = qx[None]
        qsq = jnp.asarray(np.sum(qx * qx, axis=1))
        if self.metric == "cosine":
            qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        if self.d_pad != qx.shape[1]:
            qx = np.pad(qx, ((0, 0), (0, self.d_pad - qx.shape[1])))
        dp = self.mesh.shape["dp"]
        b = qx.shape[0]
        b_pad = round_up(b, dp)
        if b_pad != b:
            qx = np.pad(qx, ((0, b_pad - b), (0, 0)))
        qj = jax.device_put(jnp.asarray(qx), query_sharding(self.mesh))
        valid = self.valid
        if slot_mask is not None:
            valid = jnp.logical_and(valid, jnp.asarray(slot_mask))
        alpha = D.metric_alpha(self.metric)
        sqn = self.sq_norms if self.metric == "l2" else None
        np_probe = min(int(nprobe or self.nprobe), self.centroids.shape[0])
        scores, idx = _sharded_ivf_probe(
            qj, self.centroids, self.buckets, self.vectors, valid, sqn, alpha,
            nprobe=np_probe, k=k, mesh=self.mesh,
        )
        scores = scores[:b]
        idx = idx[:b]
        dists = np.array(D.scores_to_distances(self.metric, scores, qsq), np.float32)
        idx_np = np.asarray(idx, np.int64)
        miss = np.asarray(scores) <= NEG_INF / 2
        dists[miss] = np.inf
        pks = np.empty(idx_np.shape, dtype=object)
        flat = pks.reshape(-1)
        for j, s in enumerate(idx_np.reshape(-1)):
            flat[j] = self._slot_pks[s] if 0 <= s < self.capacity else None
        pks[miss] = None
        return dists, pks

    # search(): inherited — the base passes extra kwargs (nprobe) through
    # to search_arrays polymorphically.

    # --- persistence ----------------------------------------------------------------

    def state_dict(self) -> dict:
        d = super().state_dict()
        d["type"] = "sharded_ivf"
        d["num_clusters_cfg"] = self.num_clusters_cfg
        d["nprobe"] = self.nprobe
        d["centroids"] = np.asarray(self.centroids) if self.trained else None
        d["trained_size"] = self._trained_size
        return d

    @staticmethod
    def from_state_dict(d: dict, mesh) -> "ShardedIVFIndex":
        idx = ShardedIVFIndex(
            d["dims"], mesh, d["metric"], d["precision"],
            num_clusters=d.get("num_clusters_cfg", 0), nprobe=d.get("nprobe", 8),
        )
        orig_min = idx.min_train_size
        idx.min_train_size = 1 << 62  # the saved centroids are about to be
        # installed — a retrain during the restore upsert would be thrown away
        try:
            if d["pks"]:
                vecs = np.asarray(d["vectors"], np.float32)
                slots = idx.upsert(d["pks"], vecs[:, : d["dims"]], _prepped=vecs)
                idx.filter_columns.scatter(
                    d.get("filter_columns", {}), slots, idx.capacity
                )
        finally:
            idx.min_train_size = orig_min
        if d.get("centroids") is not None:
            idx.centroids = jax.device_put(
                jnp.asarray(d["centroids"], jnp.float32), NamedSharding(mesh, P())
            )
            idx._trained_size = d.get("trained_size", len(idx))
            idx._rebuild_buckets()
        return idx
