"""Bisect the 257 s one-shot corpus drain: replicate the exact eager op
chain (zeros -> asarray -> dynamic_update_slice x3) step by step."""

import time

import numpy as np
import jax
import jax.lax as lax
import jax.numpy as jnp
import ml_dtypes

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


sync(jnp.zeros((8, 8), jnp.float32))

cap, d = 131072, 768
rng = np.random.default_rng(0)
host = rng.standard_normal((cap, d)).astype(np.float32).astype(ml_dtypes.bfloat16)
val_block = np.zeros(cap, np.bool_)
val_block[:75000] = True
nrm = rng.standard_normal(cap).astype(np.float32)

t0 = time.time()
vec = jnp.zeros((cap, d), jnp.bfloat16)
val = jnp.zeros((cap,), jnp.bool_)
nr = jnp.zeros((cap,), jnp.float32)
sync(nr)
print(f"zeros: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
up = jnp.asarray(host)
sync(up)
print(f"asarray 201MB: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
vec = lax.dynamic_update_slice(vec, up, (jnp.int32(0), jnp.int32(0)))
sync(vec[:8])
print(f"dus vectors (device update): {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
val2 = lax.dynamic_update_slice(val, jnp.asarray(val_block), (jnp.int32(0),))
nr2 = lax.dynamic_update_slice(nr, jnp.asarray(nrm), (jnp.int32(0),))
sync(val2.astype(jnp.float32))
print(f"dus val+nrm: {time.time()-t0:.1f}s", flush=True)

# now the EXACT corpus pattern: dus with the host array passed through
# jnp.asarray inline (fresh buffers)
vec2 = jnp.zeros((cap, d), jnp.bfloat16)
t0 = time.time()
vec2 = lax.dynamic_update_slice(vec2, jnp.asarray(host), (jnp.int32(0), jnp.int32(0)))
sync(vec2[:8])
print(f"inline asarray+dus: {time.time()-t0:.1f}s", flush=True)
