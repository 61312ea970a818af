import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

def bench(name, f, *args, reps=5):
    o = f(*args)
    float(jnp.asarray(o[(0,) * o.ndim], jnp.float32))
    del o
    t0 = time.time()
    last = None
    for _ in range(reps):
        del last
        last = f(*args)
    float(jnp.asarray(last[(0,) * last.ndim], jnp.float32))
    del last
    print(f"{name}: {(time.time()-t0)/reps*1000:.2f} ms", flush=True)

n, d = 1_048_576, 768
vec = jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.bfloat16)
g = jax.random.randint(jax.random.PRNGKey(3), (2 * n,), 0, n, jnp.int32)
bench("row gather 2M x 768 bf16 (random)", jax.jit(lambda v, gg: v[gg]), vec, g)
g_sorted = jnp.sort(g)
bench("row gather 2M x 768 bf16 (sorted idx)", jax.jit(lambda v, gg: v[gg]), vec, g_sorted)
perm = jax.random.permutation(jax.random.PRNGKey(4), n).astype(jnp.int32)
bench("1M permutation gather", jax.jit(lambda v, gg: v[gg]), vec, perm)
bench("contiguous 2x copy", jax.jit(lambda v: jnp.concatenate([v, v], 0)), vec)
print("OK", flush=True)
