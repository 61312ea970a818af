import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

def bench(name, f, *args, reps=20):
    o = f(*args); jax.block_until_ready(o)
    o0 = o[0] if isinstance(o, (tuple, list)) else o
    float(jnp.asarray(o0[(0,) * o0.ndim], jnp.float32))
    t0 = time.time()
    outs = [f(*args) for _ in range(reps)]
    last = outs[-1][0] if isinstance(outs[-1], (tuple, list)) else outs[-1]
    float(jnp.asarray(last[(0,) * last.ndim], jnp.float32))
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

n, C = 1_048_576, 1024
keys = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, C, jnp.int32)
idx = jnp.arange(n, dtype=jnp.int32)
f32v = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

bench("argsort 1M i32", jax.jit(lambda k: jnp.argsort(k, stable=True)), keys)
bench("lax.sort (k,v) 1M", jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, is_stable=True)), keys, idx)
bench("lax.sort (k,v1,v2) 1M", jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1, is_stable=True)), keys, idx, idx)
bench("perm-scatter inverse 1M", jax.jit(lambda o: jnp.zeros(n, jnp.int32).at[o].set(jnp.arange(n, dtype=jnp.int32), unique_indices=True, mode="drop")), idx)
# key+id packed in one i32 sort: key*2^20 | id needs i64; try i64 single sort
packed = (keys.astype(jnp.int64) << 21) | idx.astype(jnp.int64)
bench("sort packed i64 1M", jax.jit(lambda p: jnp.sort(p)), packed)
# gather 1.6GB bucket copy for scale
vec = jax.random.normal(jax.random.PRNGKey(2), (n, 768), jnp.bfloat16)
g_idx = jax.random.randint(jax.random.PRNGKey(3), (2_097_152,), 0, n, jnp.int32)
bench("row gather 2M x 768 bf16", jax.jit(lambda v, g: v[g]), vec, g_idx, reps=5)
print("OK", flush=True)
