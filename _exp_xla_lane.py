import jax, jax.numpy as jnp, time, functools, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
n, d, k = 16384*61, 768, 10
corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
bias = jnp.zeros(n, jnp.float32)

def timeit(fn, *args, reps=50):
    float(jnp.sum(fn(*args)[0]))
    best=1e9
    for _ in range(3):
        t0=time.time()
        for _ in range(reps): r=fn(*args)
        float(jnp.sum(r[0])); best=min(best,(time.time()-t0)/reps)
    return best

import os
CH = int(os.environ.get("CH", 16384))
@functools.partial(jax.jit, static_argnames=())
def xla_lane(q, c, bb):
    b = q.shape[0]
    nch = c.shape[0] // CH
    qc = q.astype(c.dtype)
    cr = c.reshape(nch, CH, d)
    br = bb.reshape(nch, CH)
    def body(carry, inp):
        cblk, bblk, off = inp
        s = jnp.dot(qc, cblk.T, preferred_element_type=jnp.float32) + bblk[None,:]
        s3 = s.reshape(b, CH // 128, 128)
        m1 = jnp.max(s3, axis=1)                      # [b,128]
        a1 = jnp.argmax(s3, axis=1).astype(jnp.int32) # [b,128]
        lane = jnp.arange(128, dtype=jnp.int32)[None,:]
        g1 = off + a1 * 128 + lane
        mask = jax.nn.one_hot(a1, CH // 128, axis=1, dtype=jnp.bool_)  # [b, R, 128]
        s3b = jnp.where(mask, -3e38, s3)
        m2 = jnp.max(s3b, axis=1)
        a2 = jnp.argmax(s3b, axis=1).astype(jnp.int32)
        g2 = off + a2 * 128 + lane
        return carry, (jnp.concatenate([m1, m2], 1), jnp.concatenate([g1, g2], 1))
    offs = (jnp.arange(nch, dtype=jnp.int32) * CH)
    _, (ss, ii) = jax.lax.scan(body, 0, (cr, br, offs))
    ss = ss.transpose(1,0,2).reshape(b, -1)
    ii = ii.transpose(1,0,2).reshape(b, -1)
    ts, pos = jax.lax.top_k(ss, k)
    return ts, jnp.take_along_axis(ii, pos, axis=1)

for b in (1, 128):
    q = jax.random.normal(jax.random.PRNGKey(b), (b, d), jnp.float32)
    per = timeit(xla_lane, q, corpus, bias)
    print(f"xla-lane CH={CH} B={b:4d}: {per*1e3:6.2f} ms -> BW {(n*d*2/per)/1e9:5.0f} GB/s, {b/per:8.0f} QPS")
# correctness
from tostore_tpu.ops import topk
q = jax.random.normal(jax.random.PRNGKey(7), (4, d), jnp.float32)
s1, i1 = xla_lane(q, corpus, bias)
s0, i0 = topk.flat_topk_xla(q, corpus, bias, 1.0, k)
print("idx match exact:", np.array_equal(np.asarray(i1), np.asarray(i0)))
