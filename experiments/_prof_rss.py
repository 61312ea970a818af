"""Where does the soak's peak RSS happen? Scaled soak (2M rel rows +
50k x 768 vectors) on the CPU backend with a background RSS sampler that
records the max within each phase. Device arrays live in host RAM here
(CPU backend), so vector-phase numbers include ~2x the corpus bytes that
would sit in HBM on TPU — read phases relatively."""

import jax

jax.config.update("jax_platforms", "cpu")

import os
import shutil
import tempfile
import threading
import time

import numpy as np

from tostore_tpu import (
    DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
    VectorFieldConfig, VectorIndexConfig,
)


def rss_gb():
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 2**20
    return 0.0


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.phase = "start"
        self.peaks = {}
        self.stop = False

    def run(self):
        while not self.stop:
            r = rss_gb()
            p = self.phase
            if r > self.peaks.get(p, 0.0):
                self.peaks[p] = r
            time.sleep(0.05)


n_rel = 2_000_000
n_vec = 50_000
d = 768
rel = TableSchema(
    name="events",
    fields=(FieldSchema("a", DataType.integer), FieldSchema("b", DataType.integer)),
)
vec = TableSchema(
    name="docs",
    fields=(FieldSchema("emb", DataType.vector,
                        vector_config=VectorFieldConfig(dimensions=d, precision="bfloat16")),),
    indexes=(IndexSchema(fields=("emb",), type="vector",
                         vector_config=VectorIndexConfig(index_type="ivf", metric="l2")),),
)

s = Sampler()
s.start()
tmp = tempfile.mkdtemp(prefix="tostore_rss_")
try:
    db = ToStoreTPU.open(tmp, schemas=[rel, vec])
    s.phase = "rel_ingest"
    t0 = time.time()
    for lo in range(0, n_rel, 500_000):
        db.batch_insert("events", [
            {"id": i + 1, "a": i % 97, "b": i % 1009} for i in range(lo, lo + 500_000)
        ])
    print(f"rel_ingest {time.time()-t0:.1f}s rss {rss_gb():.2f}", flush=True)
    s.phase = "vec_ingest"
    rng = np.random.default_rng(0)
    t0 = time.time()
    for lo in range(0, n_vec, 25_000):
        X = rng.standard_normal((25_000, d)).astype(np.float32)
        db.batch_insert("docs", [{"id": lo + j + 1, "emb": X[j]} for j in range(25_000)])
    db.vector_search("docs", "emb", np.zeros(d, np.float32), top_k=1)
    print(f"vec_ingest {time.time()-t0:.1f}s rss {rss_gb():.2f}", flush=True)
    s.phase = "checkpoint"
    t0 = time.time()
    db.engine.flush(force_all=True)
    print(f"checkpoint {time.time()-t0:.1f}s rss {rss_gb():.2f}", flush=True)
    s.phase = "tail+kill"
    db.batch_insert("events", [
        {"id": n_rel + i + 1, "a": 1, "b": 2} for i in range(100_000)
    ])
    db.engine._crontab and db.engine._crontab.stop()
    del db
    s.phase = "recover_open"
    t0 = time.time()
    db2 = ToStoreTPU.open(tmp, schemas=[rel, vec])
    print(f"recover_open {time.time()-t0:.1f}s rss {rss_gb():.2f}", flush=True)
    s.phase = "first_touch"
    db2.get_by_pk("events", 5)
    db2.vector_search("docs", "emb", np.zeros(d, np.float32), top_k=1)
    print(f"first_touch rss {rss_gb():.2f}", flush=True)
    s.phase = "end"
    db2.close()
finally:
    s.stop = True
    shutil.rmtree(tmp, ignore_errors=True)

du = 0
print("phase peaks (GB):")
for p, r in s.peaks.items():
    print(f"  {p:14s} {r:.2f}")
