"""Kernel unit tests: distance scoring + fused top-k vs NumPy oracles.

This is the kernel tier of the test pyramid SURVEY.md §4 calls for (the
reference has no kernel tests; its math lives in ngh_graph_engine.dart:908
and is only exercised via integration scenarios).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tostore_tpu.ops import distance, topk
from tostore_tpu.ops.runtime import NEG_INF


def make_corpus(rng, n, d, dtype=np.float32):
    return rng.standard_normal((n, d)).astype(dtype)


def np_topk_dot(q, corpus, k, invalid=()):
    s = q @ corpus.T
    s[:, list(invalid)] = -np.inf
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


class TestFusedTopK:
    def test_matches_oracle_dot(self, rng):
        # k=2 <= CANDS_PER_LANE: the fused kernel is unconditionally exact
        n, d, b, k = 2048, 128, 7, 2
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = distance.make_bias("dot", None, jnp.ones(n, bool))
        s, i = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=k)
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ref_i)

    def test_fused_topk10_recall(self, rng):
        # k=10 at tiny N: (block, lane) bucket collisions are possible but
        # rare; assert near-perfect recall across many queries.
        n, d, b, k = 4096, 128, 32, 10
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = distance.make_bias("dot", None, jnp.ones(n, bool))
        _, i = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=k)
        _, ref_i = np_topk_dot(q, corpus, k)
        recall = np.mean(
            [len(set(a) & set(bb)) / k for a, bb in zip(np.asarray(i), ref_i)]
        )
        assert recall >= 0.99

    def test_exact_xla_chunked(self, rng):
        # force the chunked scan path (n > 2 * EXACT_CHUNK) at a reduced
        # chunk size to keep the test fast
        import tostore_tpu.ops.topk as topk_mod

        old = topk_mod.EXACT_CHUNK
        topk_mod.EXACT_CHUNK = 1024
        try:
            n, d, b, k = 8192, 64, 3, 7
            corpus = make_corpus(rng, n, d)
            q = rng.standard_normal((b, d)).astype(np.float32)
            bias = jnp.zeros(n, jnp.float32)
            s, i = topk_mod.flat_topk_xla(jnp.asarray(q), jnp.asarray(corpus), bias, 1.0, k)
            ref_s, ref_i = np_topk_dot(q, corpus, k)
            np.testing.assert_array_equal(np.asarray(i), ref_i)
            np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)
        finally:
            topk_mod.EXACT_CHUNK = old

    def test_validity_mask_excludes(self, rng):
        n, d, b, k = 2048, 128, 4, 8
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        invalid = [0, 5, 999, 1023]
        valid = np.ones(n, bool)
        valid[invalid] = False
        bias = distance.make_bias("dot", None, jnp.asarray(valid))
        _, i = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=k)
        assert not set(np.asarray(i).ravel()) & set(invalid)

    def test_l2_recall_exact(self, rng):
        # f32 dot-trick scores can swap near-ties vs numpy; assert set-recall
        # plus distance closeness instead of exact order (SURVEY.md §7 notes
        # the re-rank-in-f32 requirement for parity).
        n, d, b, k = 2048, 128, 5, 10
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        norms = distance.l2_norms(jnp.asarray(corpus))
        bias = distance.make_bias("l2", norms, jnp.ones(n, bool))
        s, i = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=k, alpha=2.0)
        d_true = np.linalg.norm(q[:, None, :] - corpus[None], axis=-1)
        ref_i = np.argsort(d_true, axis=1)[:, :k]
        recall = np.mean(
            [len(set(a) & set(bb)) / k for a, bb in zip(np.asarray(i), ref_i)]
        )
        assert recall >= 0.95
        dd = distance.scores_to_distances("l2", s, distance.l2_norms(jnp.asarray(q)))
        np.testing.assert_allclose(
            np.asarray(dd), np.sort(d_true, axis=1)[:, :k], rtol=1e-3, atol=1e-2
        )

    def test_cosine_normalized(self, rng):
        n, d, b, k = 2048, 128, 3, 5
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        cn = np.asarray(distance.normalize(jnp.asarray(corpus)))
        qn = np.asarray(distance.normalize(jnp.asarray(q)))
        bias = distance.make_bias("cosine", None, jnp.ones(n, bool))
        s, i = topk.fused_flat_topk(jnp.asarray(qn), jnp.asarray(cn), bias, k=k)
        sims = (q / np.linalg.norm(q, axis=1, keepdims=True)) @ (
            corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        ).T
        ref_i = np.argsort(-sims, axis=1)[:, :k]
        recall = np.mean([len(set(a) & set(bb)) / k for a, bb in zip(np.asarray(i), ref_i)])
        assert recall >= 0.95
        dd = distance.scores_to_distances("cosine", s, None if False else jnp.zeros(b))
        assert np.all(np.asarray(dd) >= -1e-4) and np.all(np.asarray(dd) <= 2 + 1e-4)

    def test_bf16_corpus(self, rng):
        n, d, b, k = 2048, 256, 4, 10
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = jnp.zeros(n, jnp.float32)
        s, i = topk.fused_flat_topk(
            jnp.asarray(q), jnp.asarray(corpus, jnp.bfloat16), bias, k=k
        )
        ref_s, ref_i = np_topk_dot(q, corpus, 50)
        # bf16 scoring: top-10 should be within the exact top-50
        for row_i, row_ref in zip(np.asarray(i), ref_i):
            assert len(set(row_i) & set(row_ref)) >= k - 2

    def test_k_larger_than_cands_falls_back(self, rng):
        n, d, b = 1024, 128, 2
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = jnp.zeros(n, jnp.float32)
        k = topk.CANDS_PER_LANE * 128 + 50
        s, i = topk.flat_search(jnp.asarray(q), jnp.asarray(corpus), bias, k=k)
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)

    def test_single_query_and_odd_batch(self, rng):
        n, d, k = 2048, 128, 2
        corpus = make_corpus(rng, n, d)
        for b in (1, 9, 17):
            q = rng.standard_normal((b, d)).astype(np.float32)
            bias = jnp.zeros(n, jnp.float32)
            s, i = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=k)
            _, ref_i = np_topk_dot(q, corpus, k)
            np.testing.assert_array_equal(np.asarray(i), ref_i)

    def test_all_invalid_returns_neg_inf(self, rng):
        n, d = 2048, 128
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((2, d)).astype(np.float32)
        bias = jnp.full(n, NEG_INF)
        s, _ = topk.fused_flat_topk(jnp.asarray(q), jnp.asarray(corpus), bias, k=5)
        assert np.all(np.asarray(s) <= NEG_INF / 2)

    def test_rejects_unpadded(self, rng):
        corpus = jnp.zeros((1000, 128))  # N not multiple of blk
        with pytest.raises(ValueError):
            topk.fused_flat_topk(jnp.zeros((1, 128)), corpus, jnp.zeros(1000), k=5)


class TestDistanceHelpers:
    def test_scores_roundtrip_l2(self, rng):
        q = rng.standard_normal((4, 64)).astype(np.float32)
        c = rng.standard_normal((16, 64)).astype(np.float32)
        s = distance.score_matrix(
            jnp.asarray(q), jnp.asarray(c),
            distance.make_bias("l2", distance.l2_norms(jnp.asarray(c)), jnp.ones(16, bool)),
            2.0,
        )
        dd = distance.scores_to_distances("l2", s, distance.l2_norms(jnp.asarray(q)))
        ref = np.linalg.norm(q[:, None] - c[None], axis=-1)
        np.testing.assert_allclose(np.asarray(dd), ref, rtol=1e-3, atol=1e-3)

    def test_score_mapping_matches_reference(self):
        # vector_index_manager.dart:1411-1423
        d = jnp.asarray([0.0, 1.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(distance.distances_to_scores("l2", d)), [1.0, 0.5, 0.25]
        )
        np.testing.assert_allclose(
            np.asarray(distance.distances_to_scores("cosine", d)), [1.0, 0.0, -2.0]
        )
        ip = -np.asarray(d)
        np.testing.assert_allclose(
            np.asarray(distance.distances_to_scores("dot", d)),
            1.0 / (1.0 + np.exp(-ip)),
            rtol=1e-6,
        )

    def test_normalize(self, rng):
        x = rng.standard_normal((8, 32)).astype(np.float32)
        nx = np.asarray(distance.normalize(jnp.asarray(x)))
        np.testing.assert_allclose(np.linalg.norm(nx, axis=1), 1.0, rtol=1e-5)


class TestLanePathXLA:
    def test_matches_oracle(self, rng):
        import tostore_tpu.ops.topk as tm

        n, d, b, k = 40000, 128, 5, 2  # k<=2: unconditionally exact; odd n
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        s, i = tm.flat_topk_lane(
            jnp.asarray(q), jnp.asarray(corpus), jnp.zeros(n), k=k, ch=16384
        )
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)

    def test_topk10_recall_and_mask(self, rng):
        import tostore_tpu.ops.topk as tm

        n, d, b, k = 33000, 64, 8, 10
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        invalid = [0, 7, 32999]
        valid = np.ones(n, bool)
        valid[invalid] = False
        bias = distance.make_bias("dot", None, jnp.asarray(valid))
        _, i = tm.flat_topk_lane(jnp.asarray(q), jnp.asarray(corpus), bias, k=k, ch=16384)
        assert not set(np.asarray(i).ravel()) & set(invalid)
        _, ref_i = np_topk_dot(q, corpus, k, invalid=invalid)
        recall = np.mean([len(set(a) & set(bb)) / k for a, bb in zip(np.asarray(i), ref_i)])
        assert recall >= 0.95


class TestGroupEmit:
    """Grouped-emission Pallas stage-1 (_fused_group_emit): per-lane top-2
    over groups of gsz blocks — gsz x fewer stage-2 candidates than the
    per-block emit path at the same exactness-bucket floor."""

    def test_matches_oracle_k2(self, rng):
        # k=2 and gsz=1: one group per block — unconditionally exact
        n, d, b, k = 4096, 128, 40, 2
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = distance.make_bias("dot", None, jnp.ones(n, bool))
        s, i = topk._fused_group_emit(
            jnp.asarray(q), jnp.asarray(corpus), bias, k=k, alpha=1.0,
            blk_n=2048, gsz=1,
        )
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ref_i)

    def test_grouped_recall_and_partial_group(self, rng):
        # 5 blocks with gsz=2 -> 3 groups, last group PARTIAL (1 block)
        n, d, b, k = 5 * 2048, 128, 64, 10
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        bias = distance.make_bias("dot", None, jnp.ones(n, bool))
        s, i = topk._fused_group_emit(
            jnp.asarray(q), jnp.asarray(corpus), bias, k=k, alpha=1.0,
            blk_n=2048, gsz=2,
        )
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        # per-(group, lane) buckets: recall must be near-perfect on random
        # data; every returned hit must be a real row with its true score
        hits = np.asarray(i)
        got = np.asarray(s)
        full = q @ corpus.T
        for bi in range(b):
            np.testing.assert_allclose(
                got[bi], full[bi, hits[bi]], rtol=1e-5, atol=1e-5
            )
        rec = np.mean([
            len(set(hits[bi]) & set(ref_i[bi])) / k for bi in range(b)
        ])
        assert rec >= 0.95, rec

    def test_mask_and_row_scale(self, rng):
        n, d, b, k = 4 * 2048, 128, 16, 4
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        valid = np.ones(n, bool)
        dead = rng.choice(n, 500, replace=False)
        valid[dead] = False
        scale = (0.5 + rng.random(n)).astype(np.float32)
        bias = distance.make_bias("dot", None, jnp.asarray(valid))
        s, i = topk._fused_group_emit(
            jnp.asarray(q), jnp.asarray(corpus), bias, k=k, alpha=1.0,
            blk_n=2048, gsz=2, row_scale=jnp.asarray(scale),
        )
        hits = np.asarray(i)
        assert valid[hits.ravel()].all()
        ref = (q @ corpus.T) * scale[None, :]
        ref[:, ~valid] = -np.inf
        ref_i = np.argsort(-ref, axis=1, kind="stable")[:, :k]
        rec = np.mean([
            len(set(hits[bi]) & set(ref_i[bi])) / k for bi in range(b)
        ])
        assert rec >= 0.9, rec

    def test_odd_batch_padding(self, rng):
        n, d, k = 2 * 2048, 128, 3
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((33, d)).astype(np.float32)  # pads to 40
        bias = distance.make_bias("dot", None, jnp.ones(n, bool))
        s, i = topk._fused_group_emit(
            jnp.asarray(q), jnp.asarray(corpus), bias, k=k, alpha=1.0,
            blk_n=2048,
        )
        assert s.shape == (33, k)
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        rec = np.mean([
            len(set(np.asarray(i)[bi]) & set(ref_i[bi])) / k
            for bi in range(33)
        ])
        assert rec >= 0.9


class TestHwprPath:
    """mode="fast" hardware-binned scan (flat_topk_hwpr). On the CPU test
    backend jax.lax.approx_max_k falls back to exact top-k, so these are
    exact-equality oracles for the chunking/merge/offset plumbing; the
    binned miss probability is measured on real TPU and recorded in the
    ceiling analysis (ops/topk.py)."""

    def test_matches_oracle_chunked_remainder(self, rng):
        import tostore_tpu.ops.topk as tm

        n, d, b, k = 33017, 64, 6, 10  # odd n: chunked + padded remainder
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        invalid = [0, 5, 33011]
        valid = np.ones(n, bool)
        valid[invalid] = False
        bias = distance.make_bias("dot", None, jnp.asarray(valid))
        s, i = tm.flat_topk_hwpr(
            jnp.asarray(q), jnp.asarray(corpus), bias, k=k, ch=8192
        )
        ref_s, ref_i = np_topk_dot(q, corpus, k, invalid=invalid)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5, atol=1e-5)

    def test_int8_row_scale_alpha(self, rng):
        import tostore_tpu.ops.topk as tm

        n, d, b, k = 8192, 128, 4, 5
        c8 = rng.integers(-127, 127, (n, d)).astype(np.int8)
        scale = rng.uniform(0.5, 2.0, n).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        s, i = tm.flat_topk_hwpr(
            jnp.asarray(q), jnp.asarray(c8), jnp.zeros(n), k=k, alpha=0.7,
            ch=2048, row_scale=jnp.asarray(scale),
        )
        es, ei = tm.flat_topk_xla(
            jnp.asarray(q), jnp.asarray(c8), jnp.zeros(n), 0.7, k,
            row_scale=jnp.asarray(scale),
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(s), np.asarray(es), rtol=1e-5)

    def test_flat_search_mode_fast_dispatch(self, rng, monkeypatch):
        import tostore_tpu.ops.topk as tm

        n, d, b, k = tm.MIN_FUSED_N, 128, 4, 3
        corpus = make_corpus(rng, n, d)
        q = rng.standard_normal((b, d)).astype(np.float32)
        called = []
        real = tm.flat_topk_hwpr
        monkeypatch.setattr(
            tm, "flat_topk_hwpr",
            lambda *a, **kw: called.append(1) or real(*a, **kw),
        )
        s, i = tm.flat_search(jnp.asarray(q), jnp.asarray(corpus),
                              jnp.zeros(n), k=k, mode="fast")
        assert called, "mode='fast' must dispatch flat_topk_hwpr at n >= MIN_FUSED_N"
        ref_s, ref_i = np_topk_dot(q, corpus, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        # tiny corpus: fast falls back to the exact path (no hwpr call)
        called.clear()
        tm.flat_search(jnp.asarray(q), jnp.asarray(corpus[:4096]),
                       jnp.zeros(4096), k=k, mode="fast")
        assert not called

    def test_hwpr_chunk_for_bounds(self):
        import tostore_tpu.ops.topk as tm

        # monolithic when the [B, N] f32 tile fits the budget
        assert tm._hwpr_chunk_for(8, 1_000_000) == 1_000_000
        # bounded tile + 128-aligned chunks otherwise
        ch = tm._hwpr_chunk_for(256, 1_003_520)
        assert ch % 128 == 0
        assert 4 * 256 * ch <= tm._HWPR_TILE_BYTES + 4 * 256 * 128
        assert 1_003_520 % ch == 0  # even split preferred when available
