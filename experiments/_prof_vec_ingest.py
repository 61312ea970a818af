"""Bisect the 263 s first search: direct index search vs engine path,
with JAX compile logging."""

import logging
import shutil
import tempfile
import time

import jax

logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.WARNING)

import numpy as np

from tostore_tpu import (
    DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
    VectorFieldConfig, VectorIndexConfig,
)

d = 768
n_vec = 75_000
vstep = 25_000

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

tmp = tempfile.mkdtemp(prefix="tostore_prof_")
try:
    db = ToStoreTPU.open(tmp, schemas=[vec])
    rng = np.random.default_rng(0)
    for lo in range(0, n_vec, vstep):
        X = rng.standard_normal((vstep, d)).astype(np.float32)
        recs = [{"id": lo + j + 1, "emb": X[j]} for j in range(vstep)]
        t0 = time.time()
        db.batch_insert("docs", recs)
        print(f"wave {lo//vstep}: insert {time.time()-t0:.1f}s", flush=True)
    t = db.engine._table("docs")
    idx = t.vector_index_for("emb")
    print(f"index trained={idx.trained} defer={idx.defer_retrain} "
          f"len={len(idx)} cap={idx.corpus.vectors.shape}", flush=True)
    q = np.zeros(d, np.float32)
    t0 = time.time()
    r = idx.search_arrays(q, 1)
    print(f"direct search_arrays: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    r = idx.search_arrays(q, 1)
    print(f"direct 2nd: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    db.vector_search("docs", "emb", q, top_k=1)
    print(f"engine search: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    db.vector_search("docs", "emb", q, top_k=1)
    print(f"engine 2nd: {time.time()-t0:.2f}s", flush=True)
    db.close()
finally:
    shutil.rmtree(tmp, ignore_errors=True)
