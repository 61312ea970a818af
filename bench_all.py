"""Full benchmark sweep over the five BASELINE.json configs.

Writes BENCH_REPORT.json and prints one JSON line per config. `bench.py`
remains the single-line driver entry; this file is the evidence sweep.

Timing methodology (tunneled TPU — see .claude/skills/verify/SKILL.md):
device-generated data, many back-to-back dispatches before one forced host
readback, persistent compile cache, best-of-3.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30, trials=3):
    float(jnp.sum(fn(*args)[0]))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        float(jnp.sum(r[0]))
        best = min(best, (time.time() - t0) / reps)
    return best


def recall_at_k(got: np.ndarray, ref: np.ndarray) -> float:
    k = ref.shape[1]
    return float(
        np.mean([len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(got, ref)])
    )


def config1_flat_100k():
    """#1: flat exact kNN, cosine top-10, 100k x 128 f32."""
    from tostore_tpu.ops import topk, distance
    from tostore_tpu.ops.runtime import round_up

    n = round_up(100_000, 2048)
    d, k, b = 128, 10, 32
    corpus = distance.normalize(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32))
    bias = jnp.zeros(n, jnp.float32)
    q = distance.normalize(jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32))

    # measure the APPROXIMATE kernels explicitly vs the exact oracle
    # (flat_search auto would route this sub-MIN_FUSED_N corpus to the
    # exact path, making recall-vs-exact vacuous)
    fused = jax.jit(lambda q, c, bb: topk.fused_flat_topk(q, c, bb, k=k))
    lane = jax.jit(lambda q, c, bb: topk.flat_topk_lane(q, c, bb, k=k))
    exact = jax.jit(lambda q, c, bb: topk.flat_topk_xla(q, c, bb, 1.0, k))
    _, i_f = fused(q, corpus, bias)
    _, i_l = lane(q, corpus, bias)
    _, i_e = exact(q, corpus, bias)
    rec_f = recall_at_k(np.asarray(i_f), np.asarray(i_e))
    rec_l = recall_at_k(np.asarray(i_l), np.asarray(i_e))
    per = timeit(fused, q, corpus, bias)
    per_l = timeit(lane, q, corpus, bias)
    return {
        "config": "flat_exact_cosine_100kx128_f32_top10",
        "recall_at_10_pallas_vs_exact": rec_f,
        "recall_at_10_lane_vs_exact": rec_l,
        "qps_pallas": round(b / per, 1),
        "qps_lane": round(b / per_l, 1),
        "ms_per_batch_pallas": round(per * 1e3, 3),
    }


def config2_flat_1m():
    """#2: batched flat kNN, 1M x 768 bf16, L2 + dot."""
    from tostore_tpu.ops import topk, distance
    from tostore_tpu.ops.runtime import round_up

    n = round_up(1_000_000, 4096)
    d, k = 768, 10
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    norms = distance.l2_norms(corpus)
    out = {"config": "flat_batched_1Mx768_bf16_top10", "n": n}
    for metric, bias, alpha in (
        ("dot", jnp.zeros(n, jnp.float32), 1.0),
        ("l2", -norms, 2.0),
    ):
        for b in (1, 128, 256):
            q = jax.random.normal(jax.random.PRNGKey(b), (b, d), jnp.float32)
            f = jax.jit(
                lambda q, c, bb, a=alpha: topk.flat_search(q, c, bb, k=k, alpha=a)
            )
            per = timeit(f, q, corpus, bias)
            out[f"{metric}_b{b}_qps"] = round(b / per, 1)
            out[f"{metric}_b{b}_ms"] = round(per * 1e3, 3)
            out[f"{metric}_b{b}_scan_gbps"] = round((n * d * 2 / per) / 1e9, 1)
    # mode="fast": hardware-binned PartialReduce scan (opt-in; measured
    # top-10 miss ~1.4e-3 at default knobs — ops/topk.py ceiling analysis)
    for b in (128, 256):
        q = jax.random.normal(jax.random.PRNGKey(b), (b, d), jnp.float32)
        ff = jax.jit(lambda q, c, bb: topk.flat_search(q, c, bb, k=k, mode="fast"))
        per = timeit(ff, q, corpus, jnp.zeros(n, jnp.float32))
        out[f"fast_b{b}_qps"] = round(b / per, 1)
        out[f"fast_b{b}_ms"] = round(per * 1e3, 3)
        _, fi = ff(q, corpus, jnp.zeros(n, jnp.float32))
        _, ei = topk.flat_topk_xla(q, corpus, jnp.zeros(n, jnp.float32), 1.0, k)
        fi, ei = np.asarray(fi), np.asarray(ei)
        out[f"fast_b{b}_recall_at_10"] = round(float(np.mean([
            len(set(fi[i]) & set(ei[i])) / k for i in range(b)
        ])), 5)
    # ADVICE r4: the standalone kernel harness (ops/topk.py ceiling
    # analysis) measures fast_b256 at 2.82 ms = 90.8k QPS; this sweep runs
    # every config in a fresh subprocess against a cold backend, so its
    # fast rows land ~5-10% lower. Context difference, not a regression.
    out["fast_note"] = (
        "subprocess sweep; standalone kernel runs measure fast_b256 "
        "2.82 ms = 90.8k QPS (ops/topk.py)"
    )
    return out


def config3_ivf_build():
    """#3: IVF build (train + assign + buckets) at 1M x 768 + probe QPS."""
    from tostore_tpu.vector.ivf import IVFVectorIndex
    from tostore_tpu.ops.runtime import round_up

    n = round_up(1_000_000, 4096)
    d = 768
    idx = IVFVectorIndex(d, metric="l2", precision="bfloat16", num_clusters=1024, nprobe=16)
    c = idx.corpus
    # populate the corpus directly on device (host->device rides a slow
    # tunnel here; production ingest streams batches)
    c._ensure_capacity(n)
    vecs = jax.random.normal(jax.random.PRNGKey(0), (n, c.d_pad), jnp.bfloat16)
    c.vectors = vecs
    c.valid = jnp.ones(n, jnp.bool_)
    c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
    c._slot_pks[:n] = np.arange(n, dtype=object)
    c._pk_slot = {i: i for i in range(n)}
    c._high = n
    float(jnp.sum(c.sq_norms))  # sync

    t0 = time.time()
    idx.train(force=True)
    float(jnp.sum(idx.buckets_slots.astype(jnp.float32)))  # sync
    build_s = time.time() - t0
    # warm build (compile cache populated): the steady-state retrain cost
    t0 = time.time()
    idx.train(force=True)
    float(jnp.sum(idx.buckets_slots.astype(jnp.float32)))
    build_warm_s = time.time() - t0

    # device-side probe throughput (amortized over back-to-back dispatches;
    # the host API adds 2 tunnel roundtrips per call in this environment).
    # The engine picks the Pallas bucket-contiguous kernel (ops/ivfprobe.py)
    from tostore_tpu.vector.ivf import _ivf_probe_scan_contig

    b = 8
    q = jax.random.normal(jax.random.PRNGKey(1), (b, idx.corpus.d_pad), jnp.float32)
    alpha = 2.0  # l2

    def probe(qq):
        return _ivf_probe_scan_contig(
            qq, idx.centroids_exp, idx.slice_bias, idx.buckets_slots,
            idx.bucket_vectors, idx.bucket_scales, idx.bucket_bias,
            c.sq_norms, alpha,
            nprobe=16, k=10,
        )

    per = timeit(probe, q, reps=20)
    t0 = time.time()
    dists, slots, pks = idx.search_arrays(np.asarray(q), 10)
    e2e_ms = (time.time() - t0) * 1e3
    return {
        "config": "ivf_build_1Mx768_bf16_C1024",
        "build_seconds_cold": round(build_s, 2),
        "build_seconds_warm": round(build_warm_s, 2),
        "build_warm_gbps": round((n * d * 2 / build_warm_s) / 1e9, 2),
        "probe16_b8_device_ms": round(per * 1e3, 2),
        "probe16_b8_device_qps": round(b / per, 1),
        "probe16_b8_api_ms_tunnel": round(e2e_ms, 1),
        "top1_is_near": bool(dists[0][0] < dists[0][-1]),
    }


def config4_hybrid():
    """#4: hybrid filtered search — predicate bitmask fused into the kernel;
    parity vs post-filtered exact."""
    from tostore_tpu.ops import topk, distance
    from tostore_tpu.ops.runtime import round_up, NEG_INF

    n = round_up(500_000, 2048)
    d, k, b = 256, 10, 32
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    # 25% selectivity predicate mask
    sel = jax.random.uniform(jax.random.PRNGKey(2), (n,)) < 0.25
    bias = jnp.where(sel, 0.0, NEG_INF)
    q = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)

    fused = jax.jit(lambda q, c, bb: topk.flat_search(q, c, bb, k=k))
    _, i_f = fused(q, corpus, bias)
    # post-filter oracle: exact top-k over the selected subset
    _, i_e = topk.flat_topk_xla(q, corpus, bias, 1.0, k)
    rec = recall_at_k(np.asarray(i_f), np.asarray(i_e))
    per = timeit(fused, q, corpus, bias)
    sel_np = np.asarray(sel)
    ok = bool(np.all(sel_np[np.asarray(i_f).ravel()]))
    return {
        "config": "hybrid_filtered_500kx256_bf16_sel25pct",
        "parity_recall_vs_postfilter": rec,
        "all_hits_satisfy_predicate": ok,
        "qps": round(b / per, 1),
        "ms_per_batch": round(per * 1e3, 3),
    }


def config5_sharded():
    """#5: sharded corpus with per-shard top-k + merge. Only one physical
    chip is attached here, so this validates the sharded program end-to-end
    on a virtual mesh and reports single-shard-equivalent numbers."""
    import subprocess
    import sys

    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices',8);"
        "import __graft_entry__ as g; g.dryrun_multichip(8);"
        "print('OK')"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       cwd=".", timeout=600)
    return {
        "config": "sharded_multichip_dryrun_8dev_virtual",
        "dryrun_ok": r.stdout.strip().endswith("OK"),
        "note": "1 physical chip attached; sharded search/train validated on 8-device virtual mesh",
    }


def config6_ingest():
    """Reference's own benchmark shape: batchInsert 10k / 100k records
    (example/test/database_full_test.dart:23-67 printed elapsed ms)."""
    from tests.test_engine import users_schema
    from tostore_tpu import ToStoreTPU

    out = {"config": "batch_insert_records"}
    for n in (10_000, 100_000):
        db = ToStoreTPU.memory(schemas=[users_schema()])
        # warm-up: the first engine touch pays one-time jax/device init
        # through the tunnel (~8 s), which is not ingest cost
        db.batch_insert("users", [{"username": "warm", "age": 1}])
        recs = [
            {"username": f"user{i}", "email": f"u{i}@x.io", "age": i % 90,
             "balance": float(i), "tags": ["a"], "profile": {"i": i}}
            for i in range(1, n + 1)
        ]
        t0 = time.time()
        r = db.batch_insert("users", recs)
        dt = time.time() - t0
        assert r.is_success
        out[f"n{n}_seconds"] = round(dt, 2)
        out[f"n{n}_records_per_s"] = round(n / dt, 0)
        # columnar batch_update over the same rows (the 23x fast path,
        # reference batch_update_compute.dart)
        upd = [{"id": i, "age": (i + 1) % 90, "balance": float(i) + 1}
               for i in range(2, n + 2)]
        t0 = time.time()
        r = db.batch_update("users", upd)
        dt = time.time() - t0
        assert r.is_success
        out[f"n{n}_update_records_per_s"] = round(n / dt, 0)
        db.close()
    return out


def config7_int8():
    """int8 storage with PER-VECTOR scales: 4x smaller corpus, bf16 MXU
    scoring, per-row dequant factors riding the kernels as a second
    per-row block; top-10 agreement vs the f32 exact scan measures the
    quantization fidelity."""
    from tostore_tpu.ops import topk
    from tostore_tpu.ops.runtime import round_up

    n = round_up(1_000_000, 4096)
    d, k, b = 768, 10, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scales = jnp.where(amax > 0, amax / 127.0, 1.0 / 127.0)
    corpus = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
    bias = jnp.zeros(n, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)
    f = jax.jit(lambda q, c, bb, sc: topk.flat_search(q, c, bb, k=k, row_scale=sc))
    per = timeit(f, q, corpus, bias, scales)
    _, i8 = f(q, corpus, bias, scales)
    _, ix = topk.flat_search(q, x.astype(jnp.bfloat16), bias, k=k)
    rec = recall_at_k(np.asarray(i8), np.asarray(ix))
    return {
        "config": "flat_int8_1Mx768_top10",
        "b128_qps": round(b / per, 1),
        "b128_ms": round(per * 1e3, 3),
        "scan_gbps": round((n * d / per) / 1e9, 1),
        "top10_agreement_vs_bf16": rec,
    }


def config8_pq():
    """IVF-PQ: Pallas ADC kernel (one-hot matmul LUT) over bucket-contiguous
    codes + exact re-rank; 16x memory compression (96 B vs 1536 B/vector).
    Clustered data so recall is meaningful; raw-IVF recall for context."""
    from tostore_tpu.vector.ivf import IVFVectorIndex
    from tostore_tpu.ops.topk import flat_search
    from tostore_tpu.ops.runtime import round_up

    n = round_up(500_000, 4096)
    d, k, b = 768, 10, 8
    cents = jax.random.normal(jax.random.PRNGKey(0), (2000, d), jnp.float32) * 3
    assign = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 2000)
    vecs = (
        cents[assign] + jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
    ).astype(jnp.bfloat16)

    def mk(pq_m, pq_k=256):
        idx = IVFVectorIndex(
            d, metric="l2", precision="bfloat16", num_clusters=1024, nprobe=16,
            pq_subspaces=pq_m, pq_centroids=pq_k, rerank_factor=4,
            min_train_size=100,
        )
        c = idx.corpus
        c._ensure_capacity(n)
        c.vectors = vecs
        c.valid = jnp.ones(n, jnp.bool_)
        c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
        c._slot_pks[:n] = np.arange(n, dtype=object)
        c._pk_slot = {i: i for i in range(n)}
        c._high = n
        idx.train(force=True)
        return idx

    rng = np.random.default_rng(5)
    qi = rng.integers(0, n, b)
    q = np.asarray(vecs[jnp.asarray(qi)].astype(jnp.float32)) + rng.standard_normal(
        (b, d)
    ).astype(np.float32) * 0.1
    idx = mk(96)
    c = idx.corpus
    s_ex, i_ex = flat_search(jnp.asarray(q), c.vectors, -c.sq_norms, k=k, alpha=2.0)
    ex = np.asarray(i_ex)
    _, s_pq, _ = idx.search_arrays(q, k, nprobe=16)
    rec_pq = recall_at_k(s_pq, ex)
    # recall/latency curve vs rerank pool (r5: the auto pool floor of 512
    # was set from this curve — recall saturates there; beyond is probe
    # misses, not ADC ordering)
    rerank_curve = {}
    idx_raw = mk(0)
    _, s_raw, _ = idx_raw.search_arrays(q, k, nprobe=16)
    rec_raw = recall_at_k(s_raw, ex)

    from tostore_tpu.vector.ivf import _ivf_probe_scan_pq_contig

    qj = jnp.asarray(q)

    def probe(qq):
        return _ivf_probe_scan_pq_contig(
            qq, qq[:, :d], idx.centroids_exp, idx.centroids_exp[:, :d],
            idx.slice_bias, idx.buckets_slots, idx.bucket_codes,
            idx.pq.codebooks, c.vectors, c.scales, idx.bucket_bias,
            c.sq_norms, 2.0,
            nprobe=16, k=k, rerank=160, adc_metric="l2",
            residual=idx.pq_residual,
        )

    per = timeit(probe, qj, reps=20)

    def probe_pool(qq, pool):
        return _ivf_probe_scan_pq_contig(
            qq, qq[:, :d], idx.centroids_exp, idx.centroids_exp[:, :d],
            idx.slice_bias, idx.buckets_slots, idx.bucket_codes,
            idx.pq.codebooks, c.vectors, c.scales, idx.bucket_bias,
            c.sq_norms, 2.0,
            nprobe=16, k=k, rerank=pool, adc_metric="l2",
            residual=idx.pq_residual,
        )

    for pool in (160, 512, 2048, 8192):
        _, sl = probe_pool(qj, pool)
        rerank_curve[str(pool)] = {
            "recall_at_10": round(recall_at_k(np.asarray(sl), ex), 4),
            "probe_b8_ms": round(
                timeit(lambda qq: probe_pool(qq, pool), qj, reps=20) * 1e3, 2
            ),
        }

    # 4-bit IVFADC (K=16, M=192, nibble-packed): same 96 B/vector as the
    # 8-bit M=96 codes with 8x less one-hot work in the ADC kernel
    idx4 = mk(192, pq_k=16)
    _, s_pq4, _ = idx4.search_arrays(q, k, nprobe=16)
    rec_pq4 = recall_at_k(s_pq4, ex)
    c4 = idx4.corpus

    def probe4(qq):
        return _ivf_probe_scan_pq_contig(
            qq, qq[:, :d], idx4.centroids_exp, idx4.centroids_exp[:, :d],
            idx4.slice_bias, idx4.buckets_slots, idx4.bucket_codes,
            idx4.pq.codebooks, c4.vectors, c4.scales, idx4.bucket_bias,
            c4.sq_norms, 2.0,
            nprobe=16, k=k, rerank=160, adc_metric="l2",
            residual=idx4.pq_residual,
        )

    per4 = timeit(probe4, qj, reps=20)

    # batch scaling (VERDICT r2 item 4): where does ADC amortize vs the
    # raw-vector probe? Raw is DMA-bound (16x the code bytes); ADC is
    # one-hot-compute-bound. Measure all three at B=64 on the same corpus.
    from tostore_tpu.vector.ivf import _ivf_probe_scan_contig

    out_b = {}
    b64 = 64
    q64 = np.asarray(vecs[jnp.asarray(rng.integers(0, n, b64))].astype(jnp.float32)) \
        + rng.standard_normal((b64, d)).astype(np.float32) * 0.1
    qj64 = jnp.asarray(q64)
    craw = idx_raw.corpus

    def probe_raw(qq):
        return _ivf_probe_scan_contig(
            qq, idx_raw.centroids_exp, idx_raw.slice_bias,
            idx_raw.buckets_slots, idx_raw.bucket_vectors,
            idx_raw.bucket_scales, idx_raw.bucket_bias, craw.sq_norms, 2.0,
            nprobe=16, k=k,
        )

    # over-HBM-budget regime: without the 2x contiguous raw copy the raw
    # path degrades to XLA row gathers — the regime where PQ-ADC wins
    # (its contiguous CODES are 16x smaller and always fit)
    from tostore_tpu.vector.ivf import _ivf_probe_scan

    def probe_raw_gather(qq):
        return _ivf_probe_scan(
            qq, idx_raw.centroids_exp, idx_raw.slice_bias,
            idx_raw.buckets_slots, craw.vectors, craw.scales, craw.valid,
            craw.sq_norms, 2.0, nprobe=16, k=k,
        )

    for name, fn, qq in (
        ("raw_b8", probe_raw, qj), ("raw_b64", probe_raw, qj64),
        ("adc8_b64", probe, qj64), ("adc4_b64", probe4, qj64),
        ("raw_gather_b8", probe_raw_gather, qj),
        ("raw_gather_b64", probe_raw_gather, qj64),
    ):
        p_ = timeit(fn, qq, reps=10)
        out_b[f"{name}_ms"] = round(p_ * 1e3, 2)
        out_b[f"{name}_qps"] = round(qq.shape[0] / p_, 1)
    out_b["pq4bit_wins_over_budget"] = bool(
        out_b["adc4_b64_ms"] < out_b["raw_gather_b64_ms"]
    )

    # large-batch auto-fallback (r4, VERDICT r3 Weak #3): above the
    # measured crossover search_arrays dispatches to the exact flat scan
    # instead of the probe. Device-level A/B at B=64/128 (the tunneled
    # host API adds ~60 ms/call of RPC latency that hides the device
    # delta; production hosts are co-located) + assert the dispatch
    # actually picks flat there and probe at B=8.
    flat_f = jax.jit(
        lambda qq, cv, bb: flat_search(qq, cv, bb, k=k, alpha=2.0)
    )
    for bb in (64, 128):
        qb = jnp.asarray(np.asarray(
            vecs[jnp.asarray(rng.integers(0, n, bb))].astype(jnp.float32)
        ) + rng.standard_normal((bb, d)).astype(np.float32) * 0.1)
        p_probe = timeit(probe_raw, qb, reps=10)
        p_flat = timeit(flat_f, qb, craw.vectors, -craw.sq_norms, reps=10)
        out_b[f"dispatch_probe_b{bb}_device_ms"] = round(p_probe * 1e3, 2)
        out_b[f"dispatch_flat_b{bb}_device_ms"] = round(p_flat * 1e3, 2)
        out_b[f"dispatch_auto_b{bb}_qps"] = round(
            bb / min(p_probe, p_flat), 1
        )
    out_b["auto_picks_flat_b64"] = bool(idx_raw._flat_beats_probe(64, 16))
    out_b["auto_picks_flat_b128"] = bool(idx_raw._flat_beats_probe(128, 16))
    out_b["auto_picks_probe_b8"] = bool(not idx_raw._flat_beats_probe(8, 16))
    out_b["auto_beats_forced_probe_b64"] = bool(
        out_b["dispatch_flat_b64_device_ms"]
        <= out_b["dispatch_probe_b64_device_ms"]
    )
    out_b["auto_beats_forced_probe_b128"] = bool(
        out_b["dispatch_flat_b128_device_ms"]
        <= out_b["dispatch_probe_b128_device_ms"]
    )

    return {
        "config": "ivf_pq_500kx768_M96_C1024",
        "adc_probe16_b8_device_ms": round(per * 1e3, 2),
        "adc_probe16_b8_device_qps": round(b / per, 1),
        "recall_at_10_pq_vs_exact": rec_pq,
        "recall_at_10_rawivf_vs_exact": rec_raw,
        "rerank_pool_curve": rerank_curve,
        "code_bytes_per_vector": 96,
        "raw_bytes_per_vector": d * 2,
        "pq4bit_M192_probe_ms": round(per4 * 1e3, 2),
        "pq4bit_M192_qps": round(b / per4, 1),
        "pq4bit_M192_recall_at_10": rec_pq4,
        "pq4bit_code_bytes_per_vector": 96,
        **out_b,
    }


def config10_mesh_probe():
    """#10: mesh contig probe A/B — the Pallas bucket-contiguous kernels
    inside shard_map (1-device mesh, the only physical chip) vs the
    single-device kernel and vs the XLA row-gather mesh fallback
    (VERDICT r2 Missing #1 'recorded in BENCH_REPORT')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tostore_tpu.parallel import make_mesh
    from tostore_tpu.parallel.mesh import corpus_sharding, query_sharding
    from tostore_tpu.parallel.sharded_ivf import (
        ShardedIVFIndex, _sharded_ivf_probe, _sharded_ivf_probe_contig,
    )
    from tostore_tpu.vector.ivf import IVFVectorIndex, _ivf_probe_scan_contig
    from tostore_tpu.ops.runtime import round_up

    n = round_up(500_000, 4096)
    d, k, b, C, npb = 768, 10, 8, 1024, 16
    vecs = jax.random.normal(jax.random.PRNGKey(0), (n, 768), jnp.bfloat16)

    sidx = IVFVectorIndex(d, metric="l2", precision="bfloat16",
                          num_clusters=C, nprobe=npb)
    c = sidx.corpus
    c._ensure_capacity(n)
    c.vectors = vecs
    c.valid = jnp.ones(n, jnp.bool_)
    c.sq_norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
    c._slot_pks[:n] = np.arange(n, dtype=object)
    c._pk_slot = {i: i for i in range(n)}
    c._high = n
    sidx.train(force=True)

    mesh = make_mesh(1, dp=1)
    midx = ShardedIVFIndex(d, mesh, metric="l2", dtype="bfloat16",
                           num_clusters=C, nprobe=npb)
    midx._ensure_capacity(n)
    cap = midx.capacity
    mv = jnp.zeros((cap, midx.d_pad), jnp.bfloat16).at[:n].set(vecs)
    midx.vectors = jax.device_put(mv, corpus_sharding(mesh))
    midx.valid = jax.device_put(jnp.arange(cap) < n,
                                NamedSharding(mesh, P("shard")))
    midx.sq_norms = jax.device_put(
        jnp.pad(c.sq_norms[:n], (0, cap - n)), NamedSharding(mesh, P("shard")))
    midx._slot_pks = np.empty(cap, dtype=object)
    midx._slot_pks[:n] = np.arange(n, dtype=object)
    midx._pk_slot = {i: i for i in range(n)}
    midx._shard_fill[:] = 0
    midx._shard_fill[0] = n
    midx.train(force=True)
    assert midx.bucket_vectors is not None

    q = jax.random.normal(jax.random.PRNGKey(1), (b, c.d_pad), jnp.float32)
    qm = jax.device_put(q, query_sharding(mesh))

    def sd_probe(qq):
        return _ivf_probe_scan_contig(
            qq, sidx.centroids_exp, sidx.slice_bias, sidx.buckets_slots,
            sidx.bucket_vectors, sidx.bucket_scales, sidx.bucket_bias,
            c.sq_norms, 2.0, nprobe=npb, k=k)

    def mesh_probe(qq):
        return _sharded_ivf_probe_contig(
            qq, midx.centroids_exp, midx.slice_bias, midx.buckets,
            midx.bucket_vectors, None, midx.bucket_bias, 2.0,
            nprobe=npb, k=k, l2=True, has_scales=False,
            rps=midx._rows_per_shard(), mesh=mesh)

    def mesh_gather(qq):
        return _sharded_ivf_probe(
            qq, midx.centroids_exp, midx.slice_bias, midx.buckets,
            midx.vectors, midx.valid, midx.valid, midx.sq_norms, 2.0,
            nprobe=npb, k=k, has_scales=False, mesh=mesh)

    per_sd = timeit(sd_probe, q, reps=20)
    per_m = timeit(mesh_probe, qm, reps=20)
    per_g = timeit(mesh_gather, qm, reps=10)
    return {
        "config": "mesh_contig_probe_500kx768_C1024_1dev",
        "single_device_ms": round(per_sd * 1e3, 3),
        "mesh_contig_ms": round(per_m * 1e3, 3),
        "mesh_gather_fallback_ms": round(per_g * 1e3, 3),
        "mesh_vs_single_ratio": round(per_m / per_sd, 3),
        "contig_vs_gather_speedup": round(per_g / per_m, 2),
    }


def config9_txn():
    """#9: buffered-transaction contention — commit throughput + abort
    rate at 8 threads, disjoint vs hot rows vs predicate reads (reference
    transaction_manager.dart:30-36 first-committer-wins; VERDICT r2 Weak
    #6 asked for these numbers). CPU-only (engine path)."""
    import threading

    from tostore_tpu import (
        DataStoreConfig, DataType, Expr, FieldSchema, TableSchema, ToStoreTPU,
    )

    schema = TableSchema(
        name="c", fields=(FieldSchema("val", DataType.integer),)
    )
    n_threads, per_thread = 8, 150

    def run(mode: str):
        db = ToStoreTPU.memory(
            schemas=[schema],
            config=DataStoreConfig(isolation_level="serializable"),
        )
        try:
            n_rows = 4 if mode.startswith("hot") else n_threads * 100
            db.batch_insert("c", [
                {"id": i + 1, "val": 0} for i in range(n_rows)
            ])
            commits = [0] * n_threads
            aborts = [0] * n_threads

            def worker(tid):
                import random

                rng = random.Random(tid)
                for j in range(per_thread):
                    if mode.startswith("hot"):
                        pk = rng.randrange(n_rows) + 1
                    else:
                        pk = tid * 100 + (j % 100) + 1
                    for _ in range(200):
                        def action(tx, pk=pk):
                            if mode.startswith("hot_expr"):
                                # blind all-Expr update: deferred to commit
                                # replay, exempt from write-footprint
                                # validation (commutes) — hot increments
                                # never conflict
                                if mode.endswith("slow"):
                                    time.sleep(0.0002)
                                db.update_by_pk(
                                    "c", pk, {"val": Expr.field("val") + 1}
                                )
                                return
                            if mode.startswith("predicate"):
                                # table-granular predicate read: conflicts
                                # with ANY concurrent write to the table
                                db.query("c").where("id", "=", pk).fetch()
                                cur = db.get_by_pk("c", pk)["val"]
                            else:
                                cur = db.get_by_pk("c", pk)["val"]
                            if mode.endswith("slow"):
                                # widen the read->commit window: GIL-packed
                                # fast txns almost never overlap, hiding
                                # the true conflict behavior
                                time.sleep(0.0002)
                            db.update_by_pk("c", pk, {"val": cur + 1})

                        r = db.transaction(action)
                        if r.committed:
                            commits[tid] += 1
                            break
                        aborts[tid] += 1

            t0 = time.time()
            ths = [
                threading.Thread(target=worker, args=(t,))
                for t in range(n_threads)
            ]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            el = time.time() - t0
            total_c, total_a = sum(commits), sum(aborts)
            return {
                f"{mode}_commits_per_s": round(total_c / el, 1),
                f"{mode}_abort_rate": round(
                    total_a / max(total_c + total_a, 1), 3
                ),
                f"{mode}_committed": total_c,
            }
        finally:
            db.close()

    def run_engine_retry():
        """hot_slow via transaction(retries=..., backoff=...) — the
        engine-owned retry loop (VERDICT r3 #5) vs the hand-rolled tight
        loop above: jittered backoff de-synchronizes the contenders."""
        db = ToStoreTPU.memory(
            schemas=[schema],
            config=DataStoreConfig(isolation_level="serializable"),
        )
        try:
            n_rows = 4
            db.batch_insert("c", [
                {"id": i + 1, "val": 0} for i in range(n_rows)
            ])
            commits = [0] * n_threads
            retries = [0] * n_threads

            def worker(tid):
                import random

                rng = random.Random(tid)
                for _ in range(per_thread):
                    pk = rng.randrange(n_rows) + 1

                    def action(tx, pk=pk):
                        cur = db.get_by_pk("c", pk)["val"]
                        time.sleep(0.0002)
                        db.update_by_pk("c", pk, {"val": cur + 1})

                    r = db.transaction(action, retries=200, backoff=0.0003)
                    if r.committed:
                        commits[tid] += 1
                        retries[tid] += r.retries

            t0 = time.time()
            ths = [
                threading.Thread(target=worker, args=(t,))
                for t in range(n_threads)
            ]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            el = time.time() - t0
            total_c, total_r = sum(commits), sum(retries)
            return {
                "hot_slow_engine_retry_commits_per_s": round(total_c / el, 1),
                "hot_slow_engine_retry_abort_rate": round(
                    total_r / max(total_c + total_r, 1), 3
                ),
                "hot_slow_engine_retry_committed": total_c,
            }
        finally:
            db.close()

    out = {"config": "txn_contention_8thr_serializable"}
    for mode in ("disjoint", "hot", "predicate",
                 "disjoint_slow", "hot_slow", "predicate_slow",
                 "hot_expr_slow"):
        out.update(run(mode))
    out.update(run_engine_retry())
    return out


def config11_engine_concurrent():
    """#11: ENGINE-level concurrent vector search (VERDICT r3 #1 'done'
    criterion): QPS scaling 1 -> 8 client threads through the full
    public API (off-lock shared-mode dispatch), plus a mixed
    search+insert soak. Real TPU; the per-dispatch tunnel latency is
    what multi-threading pipelines away."""
    import threading

    from tostore_tpu import (
        DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
        VectorFieldConfig, VectorIndexConfig,
    )

    d = 768
    n = 100_000
    schema = TableSchema(
        name="docs",
        fields=(
            FieldSchema("grp", DataType.integer),
            FieldSchema("emb", DataType.vector,
                        vector_config=VectorFieldConfig(
                            dimensions=d, precision="bfloat16")),
        ),
        indexes=(
            IndexSchema(fields=("emb",), type="vector",
                        vector_config=VectorIndexConfig(
                            index_type="flat", metric="l2")),
        ),
    )
    db = ToStoreTPU.memory(schemas=[schema])
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, d)).astype(np.float32)
    step = 20_000
    for lo in range(0, n, step):
        db.batch_insert("docs", [
            {"id": i, "grp": i % 10, "emb": X[i]} for i in range(lo, lo + step)
        ])
    # warm the search executable
    for _ in range(3):
        db.vector_search("docs", "emb", X[0], top_k=10)

    def qps(nthreads, dur=6.0):
        stop = threading.Event()
        counts = [0] * nthreads
        errs = []

        def searcher(i):
            r = np.random.default_rng(i)
            try:
                while not stop.is_set():
                    db.vector_search(
                        "docs", "emb", X[r.integers(0, n)], top_k=10
                    )
                    counts[i] += 1
            except Exception as e:  # pragma: no cover
                errs.append(repr(e))

        ths = [threading.Thread(target=searcher, args=(i,)) for i in range(nthreads)]
        t0 = time.time()
        for t in ths:
            t.start()
        time.sleep(dur)
        stop.set()
        for t in ths:
            t.join(30)
        if errs:
            raise RuntimeError(errs[0])
        return sum(counts) / (time.time() - t0)

    q1 = qps(1)
    q8 = qps(8)

    # mixed: 8 searchers + 1 writer inserting continuously
    stop = threading.Event()
    searched = [0]
    inserted = [0]
    errs = []

    def msearch(i):
        r = np.random.default_rng(100 + i)
        try:
            while not stop.is_set():
                db.vector_search("docs", "emb", X[r.integers(0, n)], top_k=10)
                searched[0] += 1
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    def mwrite():
        j = n
        try:
            while not stop.is_set():
                db.insert("docs", {"id": j, "grp": j % 10,
                                   "emb": rng.standard_normal(d).astype(np.float32)})
                inserted[0] += 1
                j += 1
                time.sleep(0.05)
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    ths = [threading.Thread(target=msearch, args=(i,)) for i in range(8)]
    ths.append(threading.Thread(target=mwrite))
    t0 = time.time()
    for t in ths:
        t.start()
    time.sleep(6.0)
    stop.set()
    for t in ths:
        t.join(60)
    el = time.time() - t0
    if errs:
        raise RuntimeError(errs[0])
    # relational concurrent reads (engine SHARED mode): a composite
    # indexed query, 1 vs 8 client threads — host-side work, so scaling
    # proves the readers-writer engine lock, not device pipelining
    def rel_qps(nthreads, dur=4.0):
        stop2 = threading.Event()
        counts = [0] * nthreads
        errs2 = []

        def qreader(i):
            r = np.random.default_rng(500 + i)
            try:
                while not stop2.is_set():
                    rows = (
                        db.query("docs")
                        .where("grp", "=", int(r.integers(0, 10)))
                        .limit(20)
                        .no_cache()
                        .fetch()
                    )
                    assert rows
                    counts[i] += 1
            except Exception as e:  # pragma: no cover
                errs2.append(repr(e))

        ths2 = [threading.Thread(target=qreader, args=(i,)) for i in range(nthreads)]
        t0 = time.time()
        for t in ths2:
            t.start()
        time.sleep(dur)
        stop2.set()
        for t in ths2:
            t.join(30)
        if errs2:
            raise RuntimeError(errs2[0])
        return sum(counts) / (time.time() - t0)

    r1 = rel_qps(1)
    r8 = rel_qps(8)
    db.close()
    return {
        "config": "engine_concurrent_search_100kx768_bf16",
        "qps_1_thread": round(q1, 1),
        "qps_8_threads": round(q8, 1),
        "scaling_1_to_8": round(q8 / max(q1, 1e-9), 2),
        "mixed_qps_8_searchers_live_writer": round(searched[0] / el, 1),
        "mixed_inserts_per_s": round(inserted[0] / el, 1),
        "rel_query_qps_1_thread": round(r1, 1),
        "rel_query_qps_8_threads": round(r8, 1),
        "rel_scaling_1_to_8": round(r8 / max(r1, 1e-9), 2),
        "rel_note": "relational reads are pure host Python/numpy, so "
                    "8-thread scaling is GIL-bound (~1x) by design; the "
                    "shared engine mode's win is that reads never queue "
                    "behind multi-ms device dispatches or writer batches "
                    "(search scaling above), matching the reference's "
                    "single-isolate event-loop concurrency",
    }


def config11b_engine_concurrent_local():
    """#11b: CO-LOCATED engine concurrency (VERDICT r4 #7): the same
    shapes as #11 against the CPU backend in this process, so the
    ~30-90 ms TPU tunnel round trip is out of the loop and the numbers
    separate ENGINE overhead from transport. Reports raw-kernel vs
    through-the-engine per-search latency (the difference is the
    engine's per-search overhead budget: lock acquisition, plan, flush
    check, result mapping) and 1->8 thread scaling where the only
    pipelining available is host compute overlapping host compute."""
    import threading

    jax.config.update("jax_platforms", "cpu")

    from tostore_tpu import (
        DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
        VectorFieldConfig, VectorIndexConfig,
    )
    d = 256
    n = 50_000
    schema = TableSchema(
        name="docs",
        fields=(
            FieldSchema("grp", DataType.integer),
            FieldSchema("emb", DataType.vector,
                        vector_config=VectorFieldConfig(dimensions=d)),
        ),
        indexes=(
            IndexSchema(fields=("emb",), type="vector",
                        vector_config=VectorIndexConfig(
                            # exact = pure-XLA path: on the CPU backend the
                            # Pallas fused kernel runs in interpret mode
                            # (~370 ms/query of interpreter cost, not engine)
                            index_type="flat", metric="l2",
                            search_mode="exact")),
        ),
    )
    db = ToStoreTPU.memory(schemas=[schema])
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, d)).astype(np.float32)
    for lo in range(0, n, 10_000):
        db.batch_insert("docs", [
            {"id": i, "grp": i % 10, "emb": X[i]}
            for i in range(lo, lo + 10_000)
        ])
    for _ in range(3):
        db.vector_search("docs", "emb", X[0], top_k=10)

    # raw kernel on the same resident arrays (no engine around it)
    t = [v for k_, v in db.engine._tables.items() if k_[1] == "docs"][0]
    idx = next(iter(t.vector_indexes.values()))

    def raw_once(v):
        s = idx.search_arrays(jnp.asarray(v[None, :]), k=10)[0]
        return float(s[0, 0])

    raw_once(X[0])
    reps = 200
    t0 = time.time()
    for j in range(reps):
        raw_once(X[j % n])
    raw_ms = (time.time() - t0) / reps * 1e3

    t0 = time.time()
    for j in range(reps):
        db.vector_search("docs", "emb", X[j % n], top_k=10)
    eng_ms = (time.time() - t0) / reps * 1e3

    def qps(nthreads, dur=5.0):
        stop = threading.Event()
        counts = [0] * nthreads
        errs = []

        def searcher(i):
            r = np.random.default_rng(i)
            try:
                while not stop.is_set():
                    db.vector_search(
                        "docs", "emb", X[r.integers(0, n)], top_k=10
                    )
                    counts[i] += 1
            except Exception as e:  # pragma: no cover
                errs.append(repr(e))

        ths = [threading.Thread(target=searcher, args=(i,))
               for i in range(nthreads)]
        t0 = time.time()
        for th in ths:
            th.start()
        time.sleep(dur)
        stop.set()
        for th in ths:
            th.join(30)
        if errs:
            raise RuntimeError(errs[0])
        return sum(counts) / (time.time() - t0)

    q1 = qps(1)
    q8 = qps(8)
    db.close()
    return {
        "config": "engine_concurrent_local_cpu_50kx256_f32",
        "raw_kernel_ms": round(raw_ms, 3),
        "engine_search_ms": round(eng_ms, 3),
        "engine_overhead_us": round((eng_ms - raw_ms) * 1e3, 0),
        "qps_1_thread": round(q1, 1),
        "qps_8_threads": round(q8, 1),
        "scaling_1_to_8": round(q8 / max(q1, 1e-9), 2),
        "note": "CPU backend, no tunnel: engine adds (engine_search_ms - "
                "raw_kernel_ms) of host work per search — lock, plan, "
                "pending-flush check, score mapping, result build. "
                "Thread scaling here is bounded by XLA-CPU compute "
                "already using all cores for one query plus the GIL on "
                "the host slice; #11's TPU scaling is the deployment "
                "number (device dispatch pipelining).",
    }


def config12_scale_soak():
    """#12: reference-envelope scale soak (VERDICT r3 #4; reference
    README.md:1527-1531 '100 million records' claim): a 10M-row
    relational table + a ~0.6 GB vector corpus through the FULL engine —
    checkpoint time, reopen time, WAL-replay rate, recovery after a
    simulated kill, peak host RSS. Slow (~minutes); runs in its own
    child process like every config."""
    import resource
    import shutil
    import tempfile

    from tostore_tpu import (
        DataStoreConfig, DataType, FieldSchema, IndexSchema, TableSchema,
        ToStoreTPU, VectorFieldConfig, VectorIndexConfig,
    )

    n_rel = 10_000_000
    n_vec = 200_000
    d = 768
    tmp = tempfile.mkdtemp(prefix="tostore_scale_")
    out = {"config": "scale_soak_10M_rel_200kx768_vec"}
    try:
        rel = TableSchema(
            name="events",
            fields=(
                FieldSchema("a", DataType.integer),
                FieldSchema("b", DataType.integer),
            ),
        )
        vec = TableSchema(
            name="docs",
            fields=(
                FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(
                                dimensions=d, precision="bfloat16")),
            ),
            indexes=(
                IndexSchema(fields=("emb",), type="vector",
                            vector_config=VectorIndexConfig(
                                index_type="ivf", metric="l2")),
            ),
        )
        import sys

        def mark(msg):
            print(f"[scale_soak] {msg}", file=sys.stderr, flush=True)

        db = ToStoreTPU.open(tmp, schemas=[rel, vec])
        mark("open")
        # --- ingest 10M relational rows (columnar batches) ---
        step = 500_000
        t0 = time.time()
        for lo in range(0, n_rel, step):
            db.batch_insert("events", [
                {"id": i + 1, "a": i % 97, "b": i % 1009}
                for i in range(lo, lo + step)
            ])
        mark("rel ingest done")
        out["rel_ingest_s"] = round(time.time() - t0, 1)
        out["rel_ingest_rows_per_s"] = round(n_rel / (time.time() - t0), 0)
        # --- ingest the vector corpus ---
        rng = np.random.default_rng(0)
        t0 = time.time()
        vstep = 25_000
        for lo in range(0, n_vec, vstep):
            X = rng.standard_normal((vstep, d)).astype(np.float32)
            db.batch_insert("docs", [
                {"id": lo + j + 1, "emb": X[j]} for j in range(vstep)
            ])
        db.vector_search("docs", "emb", np.zeros(d, np.float32), top_k=1)
        mark("vec ingest done")
        out["vec_ingest_s"] = round(time.time() - t0, 1)
        # --- checkpoint ---
        t0 = time.time()
        db.engine.flush(force_all=True)
        out["checkpoint_s"] = round(time.time() - t0, 1)
        mark("checkpoint done")
        du = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(tmp) for f in fs
        )
        out["on_disk_gb"] = round(du / 2**30, 2)
        # --- WAL tail for recovery measurement ---
        tail_rows = 500_000
        t0 = time.time()
        db.batch_insert("events", [
            {"id": n_rel + i + 1, "a": 1, "b": 2} for i in range(tail_rows)
        ])
        out["tail_ingest_s"] = round(time.time() - t0, 1)
        mark("tail ingest done; simulating kill")
        db.engine._crontab and db.engine._crontab.stop()
        # simulated kill: NO close, NO final checkpoint
        del db
        # --- recovery: snapshots + WAL replay of the 500k tail ---
        t0 = time.time()
        db2 = ToStoreTPU.open(tmp, schemas=[rel, vec])
        reopen_s = time.time() - t0
        out["recover_open_s"] = round(reopen_s, 1)
        mark("recover open done")
        out["wal_replay_rows_per_s"] = round(tail_rows / reopen_s, 0)
        assert db2.get_by_pk("events", n_rel + tail_rows) is not None, \
            "tail row missing after WAL replay"
        mid = db2.get_by_pk("events", 5_000_000)
        assert mid is not None and mid["a"] == (5_000_000 - 1) % 97, \
            f"mid row wrong after recover: {mid}"
        t0 = time.time()
        hits = db2.vector_search(
            "docs", "emb", np.zeros(d, np.float32), top_k=10
        )
        out["first_search_after_recover_s"] = round(time.time() - t0, 2)
        assert len(hits) == 10, f"vector search returned {len(hits)}"
        # clean reopen (checkpointed, no WAL tail): lazy open reads the
        # manifest only; each table pays its load on first touch (recorded
        # separately, like the reference's optional prewarm)
        db2.engine.flush()
        db2.close()
        t0 = time.time()
        db3 = ToStoreTPU.open(tmp, schemas=[rel, vec])
        out["clean_open_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        n3 = db3.query("events").count()
        out["first_touch_events_s"] = round(time.time() - t0, 2)
        assert n3 == n_rel + tail_rows, f"clean-open count {n3} != {n_rel + tail_rows}"
        t0 = time.time()
        hits3 = db3.vector_search("docs", "emb", np.zeros(d, np.float32), top_k=10)
        out["first_touch_docs_s"] = round(time.time() - t0, 2)
        assert len(hits3) == 10
        lt = db3.engine.timings().get("table_load", {})
        out["lazy_table_loads"] = db3.engine._counters.get("lazy_table_loads", 0)
        out["table_load_total_ms"] = lt.get("total_ms", 0)
        db3.close()
        out["peak_rss_gb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def config13_index_build():
    """#13: sorted-index cold build + incremental-delta read latency
    (reference updates its index B+Trees in place per write; here a
    delta log gives the same no-rebuild-per-write property and the
    native fused encode+sort bounds the cold rebuild). CPU/host work."""
    import threading

    from tostore_tpu import (
        DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
    )

    s = TableSchema(
        name="t",
        fields=(FieldSchema("a", DataType.integer),
                FieldSchema("b", DataType.integer)),
        indexes=(IndexSchema(fields=("a",)), IndexSchema(fields=("a", "b"))),
    )
    db = ToStoreTPU.memory(schemas=[s])
    n = 2_000_000
    step = 200_000
    for lo in range(0, n, step):
        db.batch_insert("t", [
            {"id": i + 1, "a": i % 1000, "b": i % 37}
            for i in range(lo, lo + step)
        ])
    # cold: first indexed query builds BOTH indexes (planner probes each)
    t0 = time.time()
    rows = db.query("t").where("a", "=", 7).limit(5000).no_cache().fetch()
    cold_s = time.time() - t0
    assert len(rows) == n // 1000
    # delta path: single write then indexed query, repeated
    t0 = time.time()
    pairs = 200
    for k in range(pairs):
        db.insert("t", {"id": n + 10 + k, "a": k % 1000, "b": 0})
        got = db.query("t").where("a", "=", k % 1000).no_cache().fetch()
        assert got
    pair_ms = (time.time() - t0) / pairs * 1e3
    db.close()
    return {
        "config": "index_build_2M_rows_2_indexes",
        "cold_build_query_s": round(cold_s, 2),
        "cold_build_rows_per_s_per_index": round(n * 2 / cold_s, 0),
        "write_then_query_ms_per_pair": round(pair_ms, 2),
        "note": "delta log: no rebuild per write (was a full rebuild, "
                "11.6 s at this size, before r4)",
    }


def config14_relational_query():
    """#14: relational query hot paths at 1M rows (host/CPU work): point
    lookups, eq+order_by+limit via the order-serving composite arm,
    cursor-walk pages (vectorized strictly-after filter), and group_by
    aggregates (group codes + bincount reducers). The reference drives
    these same shapes through its query_executor/topk_heap."""
    from tostore_tpu import (
        DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
    )
    from tostore_tpu.models.aggregation import Agg

    s = TableSchema(
        name="t",
        fields=(FieldSchema("grp", DataType.integer),
                FieldSchema("ts", DataType.integer),
                FieldSchema("city", DataType.text),
                FieldSchema("x", DataType.double)),
        # ("ts",) serves the cursor walk's order: keyset pages bisect the
        # index to the (order values, pk) boundary (O(log n)) instead of
        # masking all 1M rows per page
        indexes=(IndexSchema(fields=("grp", "ts")),
                 IndexSchema(fields=("ts",))),
    )
    db = ToStoreTPU.memory(schemas=[s])
    rng = np.random.default_rng(0)
    n = 1_000_000
    step = 250_000
    gs = rng.integers(0, 1000, n)
    tss = rng.integers(0, 10**9, n)
    cs = rng.integers(0, 20, n)
    xs = rng.standard_normal(n)
    for lo in range(0, n, step):
        db.batch_insert("t", [
            {"id": i, "grp": int(gs[i]), "ts": int(tss[i]),
             "city": f"c{int(cs[i])}", "x": float(xs[i])}
            for i in range(lo, lo + step)
        ])

    q_point = lambda: db.get_by_pk("t", 424242)
    q_page = lambda: (
        db.query("t").where("grp", "=", 7).order_by("ts").limit(20)
        .no_cache().fetch()
    )
    q_agg = lambda: db.engine.query("t", __import__(
        "tostore_tpu.query.executor", fromlist=["QuerySpec"]
    ).QuerySpec(
        group_by=["city"],
        aggregates=[Agg.count(alias="n"), Agg.sum("x", alias="sx"),
                    Agg.avg("x", alias="ax")],
    ))

    def cursor_walk(pages=10, field="ts"):
        res = db.query("t").order_by(field).limit(50).no_cache().fetch()
        k = 1
        while res.next_cursor and k < pages:
            res = res.next()
            k += 1

    for f in (q_point, q_page, q_agg):
        f()
    cursor_walk(2)
    cursor_walk(2, field="x")
    t0 = time.time(); [q_point() for _ in range(2000)]
    point_us = (time.time() - t0) / 2000 * 1e6
    t0 = time.time(); [q_page() for _ in range(300)]
    page_ms = (time.time() - t0) / 300 * 1e3
    t0 = time.time(); cursor_walk()
    cursor_ms = (time.time() - t0) / 10 * 1e3
    # unindexed order: the O(n) vectorized strictly-after mask path
    t0 = time.time(); cursor_walk(field="x")
    cursor_scan_ms = (time.time() - t0) / 10 * 1e3
    t0 = time.time(); [q_agg() for _ in range(5)]
    agg_ms = (time.time() - t0) / 5 * 1e3
    t0 = time.time()
    for k in range(3000):
        db.insert("t", {"id": n + 10 + k, "grp": int(k % 1000),
                        "ts": int(k), "city": "cX", "x": 0.0})
    ins_per_s = 3000 / (time.time() - t0)
    t0 = time.time()
    for k in range(3000):
        db.update_by_pk("t", k, {"x": 1.0})
    upd_per_s = 3000 / (time.time() - t0)
    t0 = time.time()
    rr = db.update("t", {"city": "cU"}).where("grp", "<", 100).execute()
    cond_upd = len(rr.success_keys) / (time.time() - t0)
    t0 = time.time()
    rd = db.delete("t").where("grp", ">=", 900).execute()
    cond_del = len(rd.success_keys) / (time.time() - t0)
    db.close()
    return {
        "config": "relational_query_1M_rows",
        "point_get_us": round(point_us, 1),
        "eq_order_limit_page_ms": round(page_ms, 3),
        "eq_order_limit_qps": round(1e3 / page_ms, 0),
        "cursor_page_ms": round(cursor_ms, 2),
        "cursor_page_unindexed_ms": round(cursor_scan_ms, 2),
        "group_by_text_agg_ms": round(agg_ms, 1),
        "single_insert_per_s": round(ins_per_s, 0),
        "single_update_per_s": round(upd_per_s, 0),
        "cond_update_rows_per_s": round(cond_upd, 0),
        "cond_delete_rows_per_s": round(cond_del, 0),
        "note": "single host thread; order-serving arm skips the sort, "
                "cursor pages bisect the order index (keyset; the "
                "unindexed row pays the O(n) mask), aggregates reduce via "
                "group codes + bincount (no record materialization); "
                "writes are memory-mode singles (delta-log index notes, "
                "no WAL fsync)",
    }


def config15_joins():
    """#15: vectorized join execution at 100k users x 500k orders (host
    work; reference query_executor.dart hash joins): limit page ordered
    by a base field, by a JOINED-IN field, join+group_by aggregates, and
    DESC text ordering (np.unique rank codes) at 1M rows."""
    from tostore_tpu import DataType, FieldSchema, TableSchema, ToStoreTPU
    from tostore_tpu.models.aggregation import Agg

    users = TableSchema(
        name="users",
        fields=(FieldSchema("region", DataType.text),
                FieldSchema("name", DataType.text)),
    )
    orders = TableSchema(
        name="orders",
        fields=(FieldSchema("user_id", DataType.integer),
                FieldSchema("amount", DataType.double)),
    )
    db = ToStoreTPU.memory(schemas=[users, orders])
    rng = np.random.default_rng(0)
    nu, no = 100_000, 500_000
    regs = rng.integers(0, 4, nu)
    db.batch_insert("users", [
        {"region": f"r{int(regs[i])}", "name": f"user_{i % 50000:06d}"}
        for i in range(nu)
    ])
    uid = rng.integers(1, nu + 1, no)
    amt = rng.uniform(1, 100, no)
    step = 250_000
    for lo in range(0, no, step):
        db.batch_insert("orders", [
            {"user_id": int(uid[i]), "amount": float(amt[i])}
            for i in range(lo, lo + step)
        ])

    q_base = lambda: (
        db.query("users").join("orders", "id", "user_id")
        .order_by("id").limit(20).no_cache().fetch()
    )
    q_joined = lambda: (
        db.query("users").join("orders", "id", "user_id")
        .order_by("amount", desc=True).limit(20).no_cache().fetch()
    )
    q_agg = lambda: (
        db.query("users").join("orders", "id", "user_id")
        .group_by("region").aggregate(
            Agg.count(alias="n"), Agg.sum("amount", alias="sa"))
        .no_cache().fetch()
    )
    q_desc_text = lambda: (
        db.query("users").order_by("name", desc=True).limit(20)
        .no_cache().fetch()
    )
    cats = TableSchema(
        name="cats",
        fields=(FieldSchema("uid", DataType.integer),
                FieldSchema("tag", DataType.text)),
    )
    db.create_table(cats)
    db.batch_insert("cats", [
        {"uid": int(x), "tag": f"t{i % 5}"}
        for i, x in enumerate(rng.integers(1, nu + 1, 50_000))
    ])
    q_multi = lambda: (
        db.query("users").join("orders", "id", "user_id")
        .join("cats", "id", "uid")
        .order_by("amount", desc=True).limit(20).no_cache().fetch()
    )
    for f in (q_base, q_joined, q_agg, q_desc_text, q_multi):
        f()
    t0 = time.time(); [q_base() for _ in range(20)]
    base_ms = (time.time() - t0) / 20 * 1e3
    t0 = time.time(); [q_joined() for _ in range(10)]
    joined_ms = (time.time() - t0) / 10 * 1e3
    t0 = time.time(); [q_agg() for _ in range(10)]
    agg_ms = (time.time() - t0) / 10 * 1e3
    t0 = time.time(); [q_desc_text() for _ in range(10)]
    dt_ms = (time.time() - t0) / 10 * 1e3
    t0 = time.time(); [q_multi() for _ in range(10)]
    multi_ms = (time.time() - t0) / 10 * 1e3
    db.close()
    return {
        "config": "join_exec_100kx500k",
        "join_page_base_order_ms": round(base_ms, 1),
        "join_page_joined_order_ms": round(joined_ms, 1),
        "join_group_agg_ms": round(agg_ms, 1),
        "desc_text_order_100k_ms": round(dt_ms, 1),
        "multi_join_page_ms": round(multi_ms, 1),
        "note": "rowid pair expansion + pair-resolved lexsort keys + "
                "group-code reducers; record path measured 28x/67x/34x "
                "slower on these shapes, 63x on the 3-table chain "
                "(single host thread)",
    }


def config16_kv():
    """#16: KV namespace rates (host work; reference kv_store.dart
    setMany/typed getters/TTL): batched set_many, point get/set,
    prefix scans, TTL sweep."""
    from tostore_tpu import ToStoreTPU

    db = ToStoreTPU.memory()
    kv = db.kv
    n = 200_000
    t0 = time.time()
    kv.set_many({f"user:{i:07d}": {"n": i} for i in range(n)})
    set_many_rate = n / (time.time() - t0)
    t0 = time.time()
    kv.set_many({f"user:{i:07d}": {"n": -i} for i in range(n)})
    overwrite_rate = n / (time.time() - t0)
    t0 = time.time()
    for i in range(20_000):
        kv.get(f"user:{i:07d}")
    get_rate = 20_000 / (time.time() - t0)
    t0 = time.time()
    for i in range(5_000):
        kv.set(f"s{i}", i)
    set_rate = 5_000 / (time.time() - t0)
    t0 = time.time()
    c = kv.count("user:00")
    prefix_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    for i in range(3_000):
        kv.set_increment("ctr", 1)
    incr_rate = 3_000 / (time.time() - t0)
    kv.set_many({f"ttl{i}": i for i in range(50_000)}, ttl_seconds=0.001)
    time.sleep(0.05)
    t0 = time.time()
    db.engine.run_ttl_cleanup()
    ttl_ms = (time.time() - t0) * 1e3
    db.close()
    return {
        "config": "kv_store_200k",
        "set_many_keys_per_s": round(set_many_rate, 0),
        "set_many_overwrite_keys_per_s": round(overwrite_rate, 0),
        "get_keys_per_s": round(get_rate, 0),
        "single_set_keys_per_s": round(set_rate, 0),
        "set_increment_per_s": round(incr_rate, 0),
        "prefix_count_ms": round(prefix_ms, 1),
        "prefix_hits": c,
        "ttl_sweep_50k_ms": round(ttl_ms, 1),
        "note": "memory mode, single host thread; set_many rides the "
                "columnar bulk machinery (one WAL group)",
    }


CONFIGS = {
    "1": config1_flat_100k,
    "2": config2_flat_1m,
    "3": config3_ivf_build,
    "4": config4_hybrid,
    "5": config5_sharded,
    "6": config6_ingest,
    "7": config7_int8,
    "8": config8_pq,
    "9": config9_txn,
    "10": config10_mesh_probe,
    "11": config11_engine_concurrent,
    "11b": config11b_engine_concurrent_local,
    "12": config12_scale_soak,
    "13": config13_index_build,
    "14": config14_relational_query,
    "15": config15_joins,
    "16": config16_kv,
}


def run_one(name: str):
    try:
        res = CONFIGS[name]()
    except Exception as e:  # record failures instead of dying
        import traceback

        res = {"config": f"config{name}", "error": repr(e),
               "traceback": traceback.format_exc()[-2000:]}
    print(json.dumps(res), flush=True)
    return res


def main():
    import subprocess
    import sys

    if len(sys.argv) > 1:  # child mode: one config, own process = own HBM
        run_one(sys.argv[1])
        return

    report = {"device": str(jax.devices()[0]), "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    for name in CONFIGS:
        r = subprocess.run(
            [sys.executable, __file__, name], capture_output=True, text=True, timeout=1800
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        res = json.loads(line[-1]) if line else {"config": f"config{name}", "error": r.stderr[-500:]}
        print(json.dumps(res), flush=True)
        report[res.get("config", f"config{name}")] = res
    with open("BENCH_REPORT.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
