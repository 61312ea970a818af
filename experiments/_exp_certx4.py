"""Component breakdown for the certified-exact scan:
(a) hwpr at the small chunk sizes (is the PR scan itself still at floor?)
(b) winners-only stage (scan + global top_k(R), no rescan)
(c) rescan-only: gather [B, R*L] rows + batched matvec, several gather
    strategies (jnp.take, reshape-stride gather, f32-converted einsum,
    dot_general batched)
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from tostore_tpu.ops.topk import flat_topk_hwpr, flat_topk_lane, NEG_INF


def bench(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


@functools.partial(jax.jit, static_argnames=("kc", "rt", "ch", "r_bins"))
def winners_stage(q, corpus, bias, *, kc=32, rt=0.95, ch=32768, r_bins=16):
    b, d = q.shape
    n = corpus.shape[0]
    qc = q.astype(corpus.dtype)
    nch = n // ch
    cr = corpus.reshape(nch, ch, d)
    br = bias.reshape(nch, ch)

    def body(carry, inp):
        cblk, bblk = inp
        s = jnp.dot(qc, cblk.T, preferred_element_type=jnp.float32)
        s = s + bblk[None, :]
        wv, wi = jax.lax.approx_max_k(s, kc, recall_target=rt,
                                      aggregate_to_topk=False)
        return carry, (wv, wi.astype(jnp.int32))

    _, (ws, wi) = jax.lax.scan(body, 0, (cr, br))
    m = ws.shape[-1]
    ws = ws.transpose(1, 0, 2).reshape(b, nch * m)
    wi = wi.transpose(1, 0, 2).reshape(b, nch * m)
    gv, gp = jax.lax.top_k(ws, r_bins)
    return gv, gp, jnp.take_along_axis(wi, gp, axis=1), m


def make_rows(gp, wiw, m, ch, L, b, R):
    cid = gp // m
    bin0 = wiw % m
    rows = (cid * ch + bin0)[:, :, None] + \
        (m * jnp.arange(L, dtype=jnp.int32))[None, None, :]
    return rows.reshape(b, R * L)


@functools.partial(jax.jit, static_argnames=("variant",))
def rescan(q, corpus, bias, rows, variant="take_einsum"):
    b = q.shape[0]
    qc = q.astype(corpus.dtype)
    if variant == "take_einsum":
        g = jnp.take(corpus, rows, axis=0)
        sc = jnp.einsum("brd,bd->br", g, qc, preferred_element_type=jnp.float32)
    elif variant == "take_f32":
        g = jnp.take(corpus, rows, axis=0)
        sc = jnp.einsum("brd,bd->br", g.astype(jnp.float32),
                        qc.astype(jnp.float32))
    elif variant == "take_dotgen":
        g = jnp.take(corpus, rows, axis=0)
        sc = jax.lax.dot_general(
            g, qc[:, :, None], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[..., 0]
    elif variant == "onehot":
        # score = one_hot(rows) @ full_scores? needs full scores - skip
        raise ValueError
    sc = sc + jnp.take(bias, rows, axis=0)
    ts, tp = jax.lax.top_k(sc, 10)
    return ts, jnp.take_along_axis(rows, tp, axis=1)


def main():
    n, d = 1048576, 768
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    bias = jnp.zeros(n, jnp.float32)
    rng = np.random.default_rng(1)

    for b in (128, 256):
        q = jnp.asarray(rng.standard_normal((b, d)), np.float32)
        print(f"=== B={b}", flush=True)
        for ch in (32768, 65536, 262144):
            ms = bench(functools.partial(flat_topk_hwpr, k=10, ch=ch),
                       q, corpus, bias)
            print(f"  hwpr ch={ch:6d} (agg=True): {ms:6.2f} ms", flush=True)
        for ch in (32768, 65536):
            fn = functools.partial(winners_stage, ch=ch)
            ms = bench(fn, q, corpus, bias)
            gv, gp, wiw, m = fn(q, corpus, bias)
            m = int(m)
            print(f"  winners ch={ch:6d} (agg=False, m={m}): {ms:6.2f} ms",
                  flush=True)
            L = ch // m
            rows = make_rows(gp, wiw, m, ch, L, b, 16)
            for variant in ("take_einsum", "take_f32", "take_dotgen"):
                ms2 = bench(functools.partial(rescan, variant=variant),
                            q, corpus, bias, rows)
                print(f"    rescan {variant} (R*L={16*L}): {ms2:6.2f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
