"""Profile clean open at 2M rows (CPU) — find where open time / RSS goes."""
import os, resource, shutil, sys, tempfile, time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import numpy as np

from tostore_tpu import (
    DataStoreConfig, DataType, FieldSchema, IndexSchema, TableSchema,
    ToStoreTPU, VectorFieldConfig, VectorIndexConfig,
)

n_rel = 2_000_000
n_vec = 50_000
d = 768
tmp = tempfile.mkdtemp(prefix="prof_open_")

def rss():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

try:
    rel = TableSchema(
        name="events",
        fields=(FieldSchema("a", DataType.integer),
                FieldSchema("b", DataType.integer)),
    )
    vec = TableSchema(
        name="docs",
        fields=(FieldSchema("emb", DataType.vector,
                            vector_config=VectorFieldConfig(dimensions=d, precision="bfloat16")),),
        indexes=(IndexSchema(fields=("emb",), type="vector",
                             vector_config=VectorIndexConfig(index_type="ivf", metric="l2")),),
    )
    db = ToStoreTPU.open(tmp, schemas=[rel, vec])
    t0 = time.time()
    step = 500_000
    for lo in range(0, n_rel, step):
        db.batch_insert("events", [
            {"id": i + 1, "a": i % 97, "b": i % 1009} for i in range(lo, lo + step)
        ])
    print(f"rel ingest {time.time()-t0:.1f}s rss={rss():.0f}MB", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for lo in range(0, n_vec, 25_000):
        X = rng.standard_normal((25_000, d)).astype(np.float32)
        db.batch_insert("docs", [{"id": lo + j + 1, "emb": X[j]} for j in range(25_000)])
    db.vector_search("docs", "emb", np.zeros(d, np.float32), top_k=1)
    print(f"vec ingest {time.time()-t0:.1f}s rss={rss():.0f}MB", flush=True)
    t0 = time.time()
    db.engine.flush(force_all=True)
    print(f"checkpoint {time.time()-t0:.1f}s", flush=True)
    db.close()
    du = sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(tmp) for f in fs)
    print(f"on disk {du/2**30:.2f} GB; rss after ingest/close {rss():.0f}MB", flush=True)

    # profile the reopen in-process
    import cProfile, pstats
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    db2 = ToStoreTPU.open(tmp, schemas=[rel, vec])
    pr.disable()
    print(f"clean open {time.time()-t0:.2f}s rss={rss():.0f}MB", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)
    t0 = time.time()
    n = db2.query("events").count()
    print(f"count={n} in {time.time()-t0:.2f}s", flush=True)
    db2.close()
finally:
    shutil.rmtree(tmp, ignore_errors=True)
