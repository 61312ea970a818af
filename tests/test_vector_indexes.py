"""Vector index tests: corpus mutation, flat exact search, PQ, IVF recall.

Property tier of the test pyramid (SURVEY.md §4): recall@k vs exact flat
scan oracles, mutation/tombstone semantics, persistence round-trips.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tostore_tpu.vector import (
    DeviceCorpus,
    FlatVectorIndex,
    IVFVectorIndex,
    train_pq,
    pq_encode,
    adc_search,
)
from tostore_tpu.vector.pq import pq_decode, auto_subspaces


def exact_topk(q, x, k, metric="cosine"):
    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
        s = qn @ xn.T
        return np.argsort(-s, axis=-1)[..., :k]
    if metric == "l2":
        d = np.linalg.norm(q[:, None, :] - x[None], axis=-1)
        return np.argsort(d, axis=-1)[..., :k]
    return np.argsort(-(q @ x.T), axis=-1)[..., :k]


class TestDeviceCorpus:
    def test_upsert_delete_compact(self, rng):
        c = DeviceCorpus(dims=32)
        x = rng.standard_normal((10, 32)).astype(np.float32)
        slots = c.upsert([f"pk{i}" for i in range(10)], x)
        assert len(c) == 10 and c.capacity >= 10
        np.testing.assert_allclose(c.get_vectors(["pk3"]), x[3:4], rtol=1e-6)
        # overwrite
        c.upsert(["pk3"], x[0:1])
        np.testing.assert_allclose(c.get_vectors(["pk3"]), x[0:1], rtol=1e-6)
        assert len(c) == 10
        # delete
        assert c.delete(["pk1", "pk9", "nope"]) == 2
        assert len(c) == 8 and c.deleted_count == 2
        # slot reuse
        c.upsert(["pk_new"], x[5:6])
        assert len(c) == 9 and c.deleted_count == 1
        # compact re-packs
        c.compact()
        assert c.deleted_count == 0 and len(c) == 9
        np.testing.assert_allclose(c.get_vectors(["pk3"]), x[0:1], rtol=1e-6)

    def test_int8_roundtrip(self, rng):
        c = DeviceCorpus(dims=16, precision="int8")
        x = np.clip(rng.standard_normal((4, 16)).astype(np.float32) * 0.3, -1, 1)
        c.upsert([1, 2, 3, 4], x)
        back = c.get_vectors([1, 2, 3, 4])
        np.testing.assert_allclose(back, x, atol=1.0 / 127)

    def test_state_dict_roundtrip(self, rng):
        c = DeviceCorpus(dims=8, precision="bfloat16", normalize=True)
        x = rng.standard_normal((5, 8)).astype(np.float32)
        c.upsert(list("abcde"), x)
        c.delete(["b"])
        c2 = DeviceCorpus.from_state_dict(c.state_dict())
        assert len(c2) == 4
        assert set(c2._pk_slot) == {"a", "c", "d", "e"}


class TestFlatIndex:
    @pytest.mark.parametrize("metric", ["cosine", "l2", "dot"])
    def test_exact_recall(self, rng, metric):
        n, d, k = 500, 64, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric=metric)
        idx.upsert(list(range(n)), x)
        q = rng.standard_normal((5, d)).astype(np.float32)
        _, _, pks = idx.search_arrays(q, k)
        ref = exact_topk(q, x, k, metric)
        for row, rref in zip(pks, ref):
            got = {p for p in row if p is not None}
            assert len(got & set(rref.tolist())) >= k - 1  # ties tolerance

    def test_search_result_semantics(self, rng):
        d = 32
        x = rng.standard_normal((50, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric="l2")
        idx.upsert([f"r{i}" for i in range(50)], x)
        res = idx.search(x[7], top_k=3)
        assert res[0].primary_key == "r7"
        assert res[0].distance == pytest.approx(0.0, abs=1e-2)
        assert res[0].score == pytest.approx(1.0 / (1.0 + res[0].distance), rel=1e-5)
        assert res[0].distance <= res[1].distance <= res[2].distance

    def test_threshold_filters(self, rng):
        d = 16
        x = rng.standard_normal((20, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric="l2")
        idx.upsert(list(range(20)), x)
        res = idx.search(x[0], top_k=5, threshold=1e-3)
        assert len(res) == 1 and res[0].primary_key == 0

    def test_delete_excludes_from_search(self, rng):
        d = 16
        x = rng.standard_normal((30, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric="cosine")
        idx.upsert(list(range(30)), x)
        top = idx.search(x[5], top_k=1)[0]
        assert top.primary_key == 5
        idx.delete([5])
        top = idx.search(x[5], top_k=1)[0]
        assert top.primary_key != 5

    def test_slot_mask_hybrid(self, rng):
        d = 16
        x = rng.standard_normal((40, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric="cosine")
        idx.upsert(list(range(40)), x)
        # mask allows only even slots
        mask = jnp.asarray(np.arange(idx.corpus.capacity) % 2 == 0)
        res = idx.search(x[11], top_k=10, slot_mask=mask)
        assert res and all((r.primary_key % 2 == 0) for r in res)

    def test_empty_index(self):
        idx = FlatVectorIndex(8)
        assert idx.search(np.zeros(8), top_k=3) == []

    def test_persistence(self, rng):
        d = 16
        x = rng.standard_normal((25, d)).astype(np.float32)
        idx = FlatVectorIndex(d, metric="cosine")
        idx.upsert(list(range(25)), x)
        idx2 = FlatVectorIndex.from_state_dict(idx.state_dict())
        r1 = [r.primary_key for r in idx.search(x[3], top_k=5)]
        r2 = [r.primary_key for r in idx2.search(x[3], top_k=5)]
        assert r1 == r2


class TestInt8PerVectorScaling:
    def test_small_magnitude_rows_keep_resolution(self, rng):
        # normalized high-d rows have entries ~1/sqrt(D); the legacy global
        # x*127 rule quantizes them to a handful of levels — per-vector
        # scales must keep int8 cosine scores close to f32 exact
        d, n, k = 256, 4096, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        q = x[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(np.float32) * 0.05
        i8 = FlatVectorIndex(d, metric="cosine", precision="int8")
        i8.upsert(list(range(n)), x)
        f32 = FlatVectorIndex(d, metric="cosine", precision="float32")
        f32.upsert(list(range(n)), x)
        d8, s8, _ = i8.search_arrays(q, k)
        df, sf, _ = f32.search_arrays(q, k)
        assert np.mean([
            len(set(s8[i].tolist()) & set(sf[i].tolist())) / k for i in range(8)
        ]) >= 0.9
        # distances agree to quantization tolerance
        assert np.max(np.abs(d8[:, 0] - df[:, 0])) < 0.01

    def test_values_outside_unit_range_not_clipped(self, rng):
        # the legacy rule clipped anything outside [-1, 1]; per-vector
        # scales must represent large-magnitude rows faithfully
        d = 64
        x = np.zeros((4, d), np.float32)
        x[0, 0] = 5.0
        x[1, 1] = 50.0
        x[2, 2] = -8.0
        x[3, 3] = 0.5
        idx = FlatVectorIndex(d, metric="l2", precision="int8")
        idx.upsert([0, 1, 2, 3], x)
        got = idx.corpus.get_vectors([0, 1, 2, 3])
        assert np.max(np.abs(got - x)) < 0.25  # 50/127 max step
        q = np.zeros(d, np.float32)
        q[1] = 49.0
        assert idx.search(q, top_k=1)[0].primary_key == 1

    def test_legacy_snapshot_loads_global_rule(self, rng):
        d, n = 32, 64
        x = (rng.standard_normal((n, d)) * 0.1).astype(np.float32)
        idx = FlatVectorIndex(d, metric="l2", precision="int8")
        idx.upsert(list(range(n)), x)
        st = idx.state_dict()
        assert st["corpus"]["scales"] is not None
        # simulate a round-1 snapshot: codes quantized under x*127, no scales
        legacy = dict(st)
        legacy["corpus"] = dict(st["corpus"])
        legacy["corpus"]["vectors"] = np.clip(
            np.round(np.pad(x, ((0, 0), (0, idx.corpus.d_pad - d))) * 127),
            -127, 127,
        ).astype(np.int8)
        legacy["corpus"].pop("scales")
        idx2 = FlatVectorIndex.from_state_dict(legacy)
        got = idx2.corpus.get_vectors(list(range(n)))
        assert np.max(np.abs(got - x)) < 1.0 / 127 + 1e-6

    def test_ivf_int8_recall(self, rng):
        nat, d, n, c, k = 30, 64, 10_000, 16, 10
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 4
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
        q = x[rng.integers(0, n, 8)].astype(np.float32)
        ex = exact_topk(q, x, k, metric="l2")
        idx = IVFVectorIndex(d, metric="l2", precision="int8", num_clusters=c,
                             nprobe=6, min_train_size=100)
        idx.upsert(list(range(n)), x)
        _, slots, _ = idx.search_arrays(q, k, nprobe=6)
        rec = np.mean([
            len(set(slots[i].tolist()) & set(ex[i].tolist())) / k for i in range(8)
        ])
        assert rec >= 0.85


class TestPQ:
    def test_auto_subspaces(self):
        assert auto_subspaces(128) == 16
        assert auto_subspaces(768) == 96
        assert auto_subspaces(64) == 8

    def test_encode_decode_reduces_error(self, rng):
        n, d = 1000, 64
        x = rng.standard_normal((n, d)).astype(np.float32)
        cb = train_pq(x, m=8, k=64, iters=8)
        codes = pq_encode(cb.codebooks, jnp.asarray(x))
        assert codes.shape == (n, 8) and codes.dtype == jnp.uint8
        rec = np.asarray(pq_decode(cb.codebooks, codes))
        err = np.mean(np.sum((x - rec) ** 2, axis=1)) / np.mean(np.sum(x**2, axis=1))
        assert err < 0.6  # 8 subspaces x 64 centroids on random data

    def test_adc_recall_vs_exact(self, rng):
        n, d, k = 2000, 64, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        cb = train_pq(x, m=16, k=128, iters=8)
        codes = pq_encode(cb.codebooks, jnp.asarray(x))
        q = rng.standard_normal((4, d)).astype(np.float32)
        _, idx = adc_search(cb, codes, jnp.asarray(q), 50, metric="l2")
        ref = exact_topk(q, x, k, "l2")
        # true top-10 should mostly appear in ADC top-50
        for arow, rrow in zip(np.asarray(idx), ref):
            assert len(set(arow.tolist()) & set(rrow.tolist())) >= 6

    def test_deterministic_seeded(self, rng):
        x = rng.standard_normal((500, 32)).astype(np.float32)
        c1 = train_pq(x, m=4, k=32, seed=42)
        c2 = train_pq(x, m=4, k=32, seed=42)
        np.testing.assert_array_equal(np.asarray(c1.codebooks), np.asarray(c2.codebooks))


class TestIVF:
    def test_recall_vs_flat(self, rng):
        # clustered data (IVF's regime): mixture of 32 Gaussians
        n, d, k, nc = 3200, 64, 10, 32
        centers = rng.standard_normal((nc, d)).astype(np.float32) * 4
        x = (centers[np.arange(n) % nc] + rng.standard_normal((n, d)) * 0.5).astype(
            np.float32
        )
        idx = IVFVectorIndex(d, metric="cosine", num_clusters=nc, nprobe=8)
        idx.upsert(list(range(n)), x)
        assert idx.trained
        qi = rng.choice(n, 8, replace=False)
        q = (x[qi] + rng.standard_normal((8, d)).astype(np.float32) * 0.1)
        _, _, pks = idx.search_arrays(q, k)
        ref = exact_topk(q, x, k, "cosine")
        recalls = []
        for row, rref in zip(pks, ref):
            got = {p for p in row if p is not None}
            recalls.append(len(got & set(rref.tolist())) / k)
        assert np.mean(recalls) >= 0.9

    def test_full_probe_is_exact(self, rng):
        n, d, k = 1000, 32, 5
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=16, nprobe=16)
        idx.upsert(list(range(n)), x)
        q = rng.standard_normal((4, d)).astype(np.float32)
        _, _, pks = idx.search_arrays(q, k, nprobe=16)
        ref = exact_topk(q, x, k, "l2")
        for row, rref in zip(pks, ref):
            got = {p for p in row if p is not None}
            assert len(got & set(rref.tolist())) >= k - 1

    def test_small_corpus_falls_back_exact(self, rng):
        d = 16
        x = rng.standard_normal((20, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="cosine")
        idx.upsert(list(range(20)), x)
        assert not idx.trained  # below min_train_size
        res = idx.search(x[3], top_k=1)
        assert res[0].primary_key == 3

    def test_incremental_insert_and_delete(self, rng):
        d = 32
        x = rng.standard_normal((600, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=8, nprobe=8, min_train_size=100)
        idx.upsert(list(range(400)), x[:400])
        assert idx.trained
        idx.upsert(list(range(400, 600)), x[400:])  # post-training inserts
        res = idx.search(x[555], top_k=1)
        assert res[0].primary_key == 555
        idx.delete([555])
        res = idx.search(x[555], top_k=1)
        assert res[0].primary_key != 555

    def test_persistence(self, rng):
        d = 32
        x = rng.standard_normal((500, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="cosine", num_clusters=8, nprobe=8, min_train_size=100)
        idx.upsert(list(range(500)), x)
        idx2 = IVFVectorIndex.from_state_dict(idx.state_dict())
        r1 = [r.primary_key for r in idx.search(x[42], top_k=5)]
        r2 = [r.primary_key for r in idx2.search(x[42], top_k=5)]
        assert r1[0] == r2[0] == 42

    def test_pq_adc_search_with_rerank(self, rng):
        # PQ mode: ADC candidate selection + exact re-rank (reference
        # beam-with-ADC + rerank pool, ngh_graph_engine.dart:87-134)
        nc, d, n = 16, 64, 2000
        centers = rng.standard_normal((nc, d)).astype(np.float32) * 4
        x = (centers[np.arange(n) % nc] + rng.standard_normal((n, d)) * 0.5).astype(
            np.float32
        )
        idx = IVFVectorIndex(
            d, metric="cosine", num_clusters=nc, nprobe=8,
            pq_subspaces=8, min_train_size=100,
        )
        idx.upsert(list(range(n)), x)
        assert idx.pq is not None and idx.codes is not None
        q = x[123] + rng.standard_normal(d).astype(np.float32) * 0.05
        assert idx.search(q, top_k=5)[0].primary_key == 123
        # post-training inserts keep codes fresh
        x2 = rng.standard_normal((20, d)).astype(np.float32)
        idx.upsert(list(range(5000, 5020)), x2)
        assert idx.search(x2[7], top_k=1)[0].primary_key == 5007
        idx.delete([123])
        assert idx.search(q, top_k=1)[0].primary_key != 123
        idx2 = IVFVectorIndex.from_state_dict(idx.state_dict())
        assert idx2.search(x2[7], top_k=1)[0].primary_key == 5007

    def test_hard_clustered_recall_raw_and_residual_pq(self, rng):
        # Regression for the round-2 recall fixes: on data with more natural
        # modes than centroids (k-means collapse), the adaptive bucket cap
        # must keep raw-IVF recall high, and residual (IVFADC) codes + the
        # 16k re-rank pool must keep PQ recall close to raw.
        nat, d, n, c, k, b = 100, 64, 20_000, 64, 10, 16
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 3
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
        q = x[rng.integers(0, n, b)] + rng.standard_normal((b, d)).astype(np.float32) * 0.1
        ex = exact_topk(q, x, k, metric="l2")

        def recall(idx, nprobe):
            _, slots, _ = idx.search_arrays(q, k, nprobe=nprobe)
            return np.mean([
                len(set(slots[i].tolist()) & set(ex[i].tolist())) / k
                for i in range(b)
            ])

        raw = IVFVectorIndex(d, metric="l2", num_clusters=c, nprobe=8,
                             min_train_size=100)
        raw.upsert(list(range(n)), x)
        assert recall(raw, 8) >= 0.95

        pq = IVFVectorIndex(d, metric="l2", num_clusters=c, nprobe=8,
                            pq_subspaces=16, min_train_size=100)
        pq.upsert(list(range(n)), x)
        assert pq.pq_residual
        r_pq = recall(pq, 8)
        assert r_pq >= 0.85
        # non-contiguous fallback path scores identically
        pq.bucket_codes = None
        assert abs(recall(pq, 8) - r_pq) < 1e-6

    def test_pq_residual_persistence_and_legacy_flag(self, rng):
        # round-trip keeps residual codes searchable; a legacy snapshot
        # (no pq_residual key) must load in raw-code mode
        d, n = 32, 3000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=16, nprobe=16,
                             pq_subspaces=8, min_train_size=100)
        idx.upsert(list(range(n)), x)
        st = idx.state_dict()
        assert st["pq_residual"] is True
        idx2 = IVFVectorIndex.from_state_dict(st)
        assert idx2.search(x[42], top_k=1)[0].primary_key == 42
        legacy = dict(st)
        legacy.pop("pq_residual")
        legacy.pop("pq_rerank")
        idx3 = IVFVectorIndex.from_state_dict(legacy)
        assert idx3.pq_residual is False

    def test_4bit_pq_packed_and_unpacked(self, rng):
        # K=16 codebooks: the ADC kernel runs with 16x less one-hot work
        # and (when M*K % 256 == 0) nibble-packs two codes per byte; both
        # layouts must match the unpacked gather path's results
        nat, d, n, k = 50, 64, 12_000, 10
        centers = rng.standard_normal((nat, d)).astype(np.float32) * 4
        x = (centers[rng.integers(0, nat, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
        q = x[rng.integers(0, n, 8)] + rng.standard_normal((8, d)).astype(np.float32) * 0.05
        ex = exact_topk(q, x, k, metric="l2")

        for m in (16, 8):  # m=16 -> packed (256 lanes), m=8 -> unpacked (128)
            idx = IVFVectorIndex(d, metric="l2", num_clusters=32, nprobe=8,
                                 pq_subspaces=m, pq_centroids=16,
                                 min_train_size=100)
            idx.upsert(list(range(n)), x)
            assert idx.pq.k == 16
            if m == 16:
                assert idx._pack_nibbles
                assert idx.bucket_codes.shape[1] == m // 2
            _, slots, _ = idx.search_arrays(q, k, nprobe=8)
            rec = np.mean([
                len(set(slots[i].tolist()) & set(ex[i].tolist())) / k
                for i in range(8)
            ])
            assert rec >= (0.8 if m == 16 else 0.6), (m, rec)
            # contiguous kernel path agrees with the gather fallback
            bc = idx.bucket_codes
            idx.bucket_codes = None
            _, slots2, _ = idx.search_arrays(q, k, nprobe=8)
            assert np.array_equal(slots, slots2)
            idx.bucket_codes = bc
            if m == 16:
                # incremental upsert keeps packed codes fresh (skipped at
                # m=8: codes that coarse collapse whole natural clusters to
                # ONE code, and the re-rank pool cuts the resulting ADC
                # ties by index order — a legitimate approximation
                # artifact, not staleness)
                xq = centers[3] + rng.standard_normal(d).astype(np.float32) * 0.2
                idx.upsert([77_000], xq[None].astype(np.float32))
                assert idx.search(xq, top_k=1)[0].primary_key == 77_000

    def test_adaptive_cap_grows_on_skewed_first_choice(self, rng):
        # two natural modes, many centroids: most rows' first choice
        # concentrates on few clusters; the adaptive retry must widen the
        # cap (up to MAX_BALANCE_FACTOR x avg) instead of spraying rows
        # into arbitrary buckets
        d, n = 16, 8000
        modes = rng.standard_normal((2, d)).astype(np.float32) * 10
        x = (modes[rng.integers(0, 2, n)]
             + rng.standard_normal((n, d)) * 0.1).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=32, nprobe=4,
                             min_train_size=100)
        idx.upsert(list(range(n)), x)
        q = x[17]
        assert idx.search(q, top_k=1, nprobe=4)[0].primary_key == 17

    def test_balanced_placement_caps_buckets(self, rng):
        # pathological data (one dominant mode) must not explode bucket
        # capacity: cap stays within BALANCE_FACTOR * average
        d, n = 16, 4000
        x = rng.standard_normal((n, d)).astype(np.float32) * 0.01  # one blob
        idx = IVFVectorIndex(d, metric="l2", num_clusters=16, nprobe=16, min_train_size=100)
        idx.upsert(list(range(n)), x)
        cap = idx.buckets_slots.shape[1]
        assert cap <= max(64, int(idx.BALANCE_FACTOR * (n / 16)) + 64)
        # still fully searchable with full probe
        q = x[7]
        assert idx.search(q, top_k=1, nprobe=16)[0].primary_key == 7


class TestBackgroundRetrain:
    def test_capture_build_install_roundtrip(self, rng):
        d, n = 32, 2000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=8, nprobe=8,
                             min_train_size=100)
        idx.defer_retrain = True
        idx.upsert(list(range(400)), x[:400])
        # engine-owned: even the INITIAL train defers to background
        # maintenance (bulk loads build once at the end); searches stay
        # exact via the flat fallback meanwhile
        assert not idx.trained
        assert idx.needs_retrain()
        assert idx.search(x[77], top_k=1)[0].primary_key == 77  # flat fallback
        cap0 = idx.capture_build_state()
        assert idx.install_retrained(cap0, idx.build_retrained(cap0))
        assert idx.trained
        idx.upsert(list(range(400, n)), x[400:])  # 4x growth: deferred
        assert idx.needs_retrain()  # inline retrain skipped
        cap = idx.capture_build_state()
        shadow = idx.build_retrained(cap)
        assert idx.install_retrained(cap, shadow)
        assert not idx.needs_retrain()
        assert idx.search(x[77], top_k=1)[0].primary_key == 77

    def test_stale_install_rejected(self, rng):
        d, n = 16, 1200
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=8, nprobe=8,
                             min_train_size=100)
        idx.defer_retrain = True
        idx.upsert(list(range(n)), x)
        cap = idx.capture_build_state()
        shadow = idx.build_retrained(cap)
        idx.upsert([99_999], x[:1])  # concurrent mutation
        assert not idx.install_retrained(cap, shadow)
        assert idx.search(x[5], top_k=1)[0].primary_key == 5  # still intact

    def test_engine_background_retrain(self):
        from tostore_tpu import ToStoreTPU
        from tostore_tpu.models.schema import (
            DataType, FieldSchema, IndexSchema, TableSchema,
            VectorFieldConfig, VectorIndexConfig,
        )

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=16)),
            ),
            indexes=(
                IndexSchema(fields=("emb",), type="vector",
                            vector_config=VectorIndexConfig(
                                index_type="ivf", metric="l2",
                                num_clusters=8, nprobe=8)),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            rng = np.random.default_rng(0)
            x = rng.standard_normal((2400, 16)).astype(np.float32)
            db.batch_insert("docs", [
                {"id": i + 1, "emb": x[i].tolist()} for i in range(300)
            ])
            # searches flush but DON'T train engine-owned indexes (exact
            # flat fallback until background maintenance builds — bulk
            # loads never pay a k-means inside a search)
            hit0 = db.vector_search("docs", "emb", x[0], top_k=1)[0]
            assert hit0.primary_key == 1
            t = [v for k, v in db.engine._tables.items() if k[1] == "docs"][0]
            vi = next(iter(t.vector_indexes.values()))
            assert vi.defer_retrain and not vi.trained
            assert db.engine.run_vector_maintenance() == 1  # initial build
            assert vi.trained
            db.batch_insert("docs", [
                {"id": i + 1, "emb": x[i].tolist()} for i in range(300, 2400)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush (no stall)
            assert vi.needs_retrain()
            assert db.engine.run_vector_maintenance() == 1
            assert not vi.needs_retrain()
            assert db.engine._counters["background_retrains"] == 2
            hit = db.vector_search("docs", "emb", x[1234], top_k=1)[0]
            assert hit.primary_key == 1235
        finally:
            db.close()


class TestBackgroundCompaction:
    def test_capture_build_install(self, rng):
        d, n = 16, 2000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=8, nprobe=8,
                             min_train_size=100)
        idx.upsert(list(range(n)), x)  # inline initial train
        idx.defer_retrain = True  # engine-owned from here on
        idx.delete(list(range(0, n, 3)))  # 33% tombstones
        assert idx.needs_compact(0.10)
        cap_before = idx.corpus.capacity
        cap = idx.capture_compact_state()
        shadow = idx.build_compacted(cap)
        assert idx.install_compacted(cap, shadow)
        assert idx.corpus.deleted_count == 0
        assert len(idx.corpus) == n - len(range(0, n, 3))
        assert idx.corpus.capacity <= cap_before
        assert idx.search(x[1], top_k=1)[0].primary_key == 1  # pk 1 survives
        assert all(r.primary_key % 3 != 0 for r in idx.search(x[4], top_k=10))

    def test_stale_compact_rejected(self, rng):
        d, n = 16, 1000
        x = rng.standard_normal((n, d)).astype(np.float32)
        idx = IVFVectorIndex(d, metric="l2", num_clusters=8, nprobe=8,
                             min_train_size=100)
        idx.defer_retrain = True
        idx.upsert(list(range(n)), x)
        idx.delete(list(range(200)))
        cap = idx.capture_compact_state()
        shadow = idx.build_compacted(cap)
        idx.upsert([55_555], x[:1])  # concurrent mutation
        assert not idx.install_compacted(cap, shadow)
        assert idx.search(x[500], top_k=1)[0].primary_key == 500

    def test_engine_background_compaction(self):
        from tostore_tpu import ToStoreTPU
        from tostore_tpu.models.schema import (
            DataType, FieldSchema, IndexSchema, TableSchema,
            VectorFieldConfig, VectorIndexConfig,
        )

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=16)),
            ),
            indexes=(
                IndexSchema(fields=("emb",), type="vector",
                            vector_config=VectorIndexConfig(
                                index_type="ivf", metric="l2",
                                num_clusters=8, nprobe=8)),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            rng = np.random.default_rng(1)
            x = rng.standard_normal((800, 16)).astype(np.float32)
            db.batch_insert("docs", [
                {"id": i + 1, "emb": x[i].tolist()} for i in range(800)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush
            assert db.engine.run_vector_maintenance() == 1  # initial build
            for pk in range(1, 300):
                db.delete_by_pk("docs", pk)
            db.vector_search("docs", "emb", x[300], top_k=1)  # flush deletes
            t = [v for k, v in db.engine._tables.items() if k[1] == "docs"][0]
            vi = next(iter(t.vector_indexes.values()))
            assert vi.needs_compact(0.10)
            assert db.engine.run_vector_maintenance() == 1
            assert vi.corpus.deleted_count == 0
            assert db.engine._counters["background_compactions"] == 1
            hit = db.vector_search("docs", "emb", x[500], top_k=1)[0]
            assert hit.primary_key == 501
        finally:
            db.close()

    def test_filter_update_invalidates_inflight_build(self):
        # review regression: a filter-only record update flushed during an
        # off-lock compaction build must invalidate the capture (the
        # swapped-in filter columns would otherwise predate the update)
        from tostore_tpu import ToStoreTPU, QueryCondition
        from tostore_tpu.models.schema import (
            DataType, FieldSchema, IndexSchema, TableSchema,
            VectorFieldConfig, VectorIndexConfig,
        )

        schema = TableSchema(
            name="docs",
            fields=(
                FieldSchema("views", DataType.integer),
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=8)),
            ),
            indexes=(IndexSchema(fields=("emb",), type="vector",
                                 vector_config=VectorIndexConfig(
                                     index_type="ivf", metric="l2",
                                     num_clusters=8, nprobe=8)),),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            rng = np.random.default_rng(2)
            x = rng.standard_normal((600, 8)).astype(np.float32)
            db.batch_insert("docs", [
                {"id": i + 1, "views": 0, "emb": x[i].tolist()}
                for i in range(600)
            ])
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush + train
            for pk in range(1, 100):
                db.delete_by_pk("docs", pk)
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush deletes
            t = [v for k, v in db.engine._tables.items() if k[1] == "docs"][0]
            vi = next(iter(t.vector_indexes.values()))
            cap = vi.capture_compact_state()
            shadow = vi.build_compacted(cap)
            # concurrent filter-only update + flush while the build ran
            db.update_by_pk("docs", 500, {"views": 9})
            db.vector_search("docs", "emb", x[0], top_k=1)  # flush filters
            assert not vi.install_compacted(cap, shadow)  # stale capture
            # the filter value survived and hybrid search sees it
            res = db.vector_search(
                "docs", "emb", x[499], top_k=1,
                condition=QueryCondition().where("views", "=", 9),
            )
            assert res and res[0].primary_key == 500
        finally:
            db.close()
