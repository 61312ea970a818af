"""Multi-host smoke: two OS processes joined via jax.distributed, a mesh
spanning both, sharded k-means + sharded flat top-k with cross-process
collectives, results checked against a single-process oracle (SURVEY §2.4
'the real distributed layer'; mesh.py init_distributed)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import numpy as np
from tostore_tpu.parallel.mesh import (
    init_distributed, make_mesh, corpus_sharding, query_sharding,
    host_local_to_global,
)

coord, pid = sys.argv[1], int(sys.argv[2])
init_distributed(coord, num_processes=2, process_id=pid, local_cpu_devices=2)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.device_count() == 4 and jax.local_device_count() == 2
mesh = make_mesh(4, dp=1)

n, d, k, c = 512, 32, 5, 8
rng = np.random.default_rng(0)
x = rng.standard_normal((n, d)).astype(np.float32)   # same on both procs
q = rng.standard_normal((3, d)).astype(np.float32)

# each process contributes its host-local stripe of the global corpus
local_rows = x.reshape(4, n // 4, d)[pid * 2 : pid * 2 + 2].reshape(-1, d)
corpus = host_local_to_global(local_rows, mesh, P("shard", None))
valid = host_local_to_global(
    np.ones(n // 2, bool), mesh, P("shard")
)
cents0 = jnp.asarray(x[:c])  # replicated (same value on both procs)

from tostore_tpu.parallel.sharded import sharded_flat_topk, sharded_kmeans_step

cents = sharded_kmeans_step(corpus, cents0, valid, mesh=mesh)
# outputs are replicated (kmeans) / dp-sharded with dp=1 (search), so every
# process's first addressable shard holds the full value
cents_host = np.asarray(cents.addressable_data(0))

qg = host_local_to_global(q, mesh, P(None, None))
bias = jnp.zeros(n, jnp.float32)
bias_g = host_local_to_global(np.zeros(n, np.float32), mesh, P())
scores, idx = sharded_flat_topk(qg, corpus, bias_g, k=k, alpha=1.0, mesh=mesh)
scores_h = np.asarray(scores.addressable_data(0))
idx_h = np.asarray(idx.addressable_data(0))

print("RESULT " + json.dumps({
    "cents_sum": float(cents_host.sum()),
    "scores": scores_h.tolist(),
    "idx": idx_h.tolist(),
}), flush=True)
"""


def test_two_process_sharded_search_and_train(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo", env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))
    # both processes computed identical global results
    assert results[0] == results[1]

    # oracle: single-process exact
    rng = np.random.default_rng(0)
    n, d, k, c = 512, 32, 5, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((3, d)).astype(np.float32)
    d2 = ((x[:c][:, None, :] - x[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(0)
    cents = np.stack([
        x[assign == j].mean(0) if (assign == j).any() else x[j] for j in range(c)
    ])
    assert abs(results[0]["cents_sum"] - cents.sum()) < 1e-2

    scores = q @ x.T
    top = np.argsort(-scores, axis=1)[:, :k]
    got_idx = np.asarray(results[0]["idx"])
    got_scores = np.asarray(results[0]["scores"])
    np.testing.assert_allclose(
        got_scores, np.take_along_axis(scores, top, 1), rtol=1e-4, atol=1e-4
    )
    assert (got_idx == top).mean() > 0.95  # ties may reorder


_ENGINE_WORKER = r"""
import json, sys
import numpy as np
from tostore_tpu.parallel.mesh import init_distributed

coord, pid, tmp = sys.argv[1], int(sys.argv[2]), sys.argv[3]
dp, shard = int(sys.argv[4]), int(sys.argv[5])
init_distributed(coord, num_processes=2, process_id=pid, local_cpu_devices=2)
import jax
assert jax.device_count() == 4 and jax.process_count() == 2

from tostore_tpu import (DataStoreConfig, DataType, FieldSchema, IndexSchema,
                         TableSchema, ToStoreTPU, VectorFieldConfig)
from tostore_tpu.models.schema import VectorIndexConfig, VectorIndexType

schema = TableSchema(
    name="docs",
    fields=(FieldSchema("emb", DataType.vector,
                        vector_config=VectorFieldConfig(dimensions=32)),),
    indexes=(IndexSchema(fields=("emb",), type="vector",
                         vector_config=VectorIndexConfig(
                             index_type=VectorIndexType.ivf, num_clusters=8,
                             nprobe=8, pq_subspaces=8)),),
)
cfg = DataStoreConfig(mesh_shape=(dp, shard))
db = ToStoreTPU.open(tmp + f"/db{pid}", config=cfg, schemas=[schema])
vi = db.engine._table("docs").vector_indexes["emb"]
vi.min_train_size = 100
rng = np.random.default_rng(0)  # identical data on both processes
nat, n = 12, 2000
centers = rng.standard_normal((nat, 32)).astype(np.float32) * 4
x = (centers[rng.integers(0, nat, n)]
     + rng.standard_normal((n, 32)) * 0.5).astype(np.float32)
db.batch_insert("docs", [{"id": i + 1, "emb": x[i].tolist()}
                         for i in range(n)])
q = x[rng.integers(0, n, 8)]
hits = [[r.primary_key for r in db.vector_search("docs", "emb", q[b], top_k=10)]
        for b in range(8)]
assert vi.index_type == "sharded_ivf" and vi.trained and vi.pq is not None
assert vi.bucket_codes is not None  # the Pallas ADC path, cross-process
db.close()
db2 = ToStoreTPU.open(tmp + f"/db{pid}", config=cfg, schemas=[schema])
hits2 = [[r.primary_key
          for r in db2.vector_search("docs", "emb", q[b], top_k=10)]
         for b in range(8)]
db2.close()
print("RESULT " + json.dumps({"hits": hits, "hits2": hits2}), flush=True)
"""


@pytest.mark.parametrize("dp,shard", [(1, 4), (2, 2)])
def test_two_process_engine_sharded_ivf_pq(tmp_path, dp, shard):
    """Engine opened with mesh_shape across 2 processes: sharded residual-
    PQ IVF batch insert, hybrid-path search, checkpoint persist + reopen —
    recall asserted vs a single-process exact oracle (SURVEY §2.4 DCN row;
    VERDICT r2 Missing #6). The (2, 2) case shards QUERIES over dp across
    processes as well as the corpus."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ENGINE_WORKER, coord, str(pid),
             str(tmp_path), str(dp), str(shard)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo", env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append(json.loads(line[len("RESULT "):]))
    assert results[0] == results[1]  # SPMD: identical global results

    # single-process exact oracle
    rng = np.random.default_rng(0)
    nat, n = 12, 2000
    centers = rng.standard_normal((nat, 32)).astype(np.float32) * 4
    x = (centers[rng.integers(0, nat, n)]
         + rng.standard_normal((n, 32)) * 0.5).astype(np.float32)
    q = x[rng.integers(0, n, 8)]
    d2 = np.sum((q[:, None, :] - x[None]) ** 2, axis=-1)
    ex = np.argsort(d2, axis=1)[:, :10] + 1  # pks are 1-based
    for key in ("hits", "hits2"):
        hits = results[0][key]
        rec = np.mean([
            len(set(hits[b]) & set(ex[b].tolist())) / 10 for b in range(8)
        ])
        assert rec >= 0.8, (key, rec)
