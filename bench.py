"""Headline benchmark: batched flat kNN QPS at 1M x 768 bf16, k=10.

BASELINE.json north-star config #2: "batched multi-query flat kNN with L2 +
dot-product metrics at 1M x 768 bf16 ... >= 10k QPS single-query on one v5p
chip". vs_baseline = achieved QPS / 10,000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (tunneled TPU — see .claude/skills/verify/SKILL.md):
corpus generated on-device (host->device transfers ride a slow tunnel);
timing uses many back-to-back dispatches before one forced host readback
(block_until_ready does not block on this platform); persistent compile
cache enabled.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    from tostore_tpu.ops import topk
    from tostore_tpu.ops.runtime import round_up

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n = round_up(1_000_000, 4096)
        d, k, b = 768, 10, 256
        reps = 30
    else:  # CI / CPU smoke: tiny shapes, same code path
        n, d, k, b = 4096, 128, 10, 8
        reps = 3

    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)

    fn = jax.jit(lambda q, c, bb: topk.flat_search(q, c, bb, k=k))
    # warm-up / compile
    float(jnp.sum(fn(q, corpus, bias)[0]))

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            s, _ = fn(q, corpus, bias)
        float(jnp.sum(s))  # force completion
        best = min(best, (time.time() - t0) / reps)

    qps = b / best
    out = {
        "metric": f"flat_knn_qps_b{b}_{n}x{d}_bf16_top{k}",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / 10_000.0, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # backend unavailable (tunnel down) etc. —
        # still emit ONE machine-readable JSON line; BENCH_REPORT.json /
        # BENCH_r03.json carry the last real measurements
        print(json.dumps({
            "metric": "flat_knn_qps_b256_1Mx768_bf16_top10",
            "value": 0,
            "unit": "QPS",
            "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(0)
