"""End-to-end verify drive on the REAL TPU for the chunked-transfer +
replay-deferral changes: ingest vectors (upload_rows on the tunnel),
search, checkpoint (download_rows in state_dict), hard-crash (no close),
reopen (streaming replay + contains_many filter + deferred checkpoint),
search again, and compare results exactly."""

import os
import shutil
import tempfile
import time

import numpy as np

from tostore_tpu import (
    DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
    VectorFieldConfig, VectorIndexConfig,
)

d = 256
schema = TableSchema(
    name="docs",
    fields=(
        FieldSchema("tag", DataType.integer),
        FieldSchema("emb", DataType.vector,
                    vector_config=VectorFieldConfig(
                        dimensions=d, precision="bfloat16")),
    ),
    indexes=(
        IndexSchema(fields=("emb",), type="vector",
                    vector_config=VectorIndexConfig(
                        index_type="flat", metric="l2")),
    ),
)

tmp = tempfile.mkdtemp(prefix="tostore_vdrive_")
rng = np.random.default_rng(7)
try:
    db = ToStoreTPU.open(tmp, schemas=[schema])
    X = rng.standard_normal((30_000, d)).astype(np.float32)
    t0 = time.time()
    db.batch_insert("docs", [
        {"id": i + 1, "tag": i % 5, "emb": X[i]} for i in range(len(X))
    ])
    print(f"ingest 30k x {d}: {time.time()-t0:.2f}s", flush=True)

    q = X[1234]
    t0 = time.time()
    r1 = db.vector_search("docs", "emb", q, top_k=5)
    print(f"search1 {time.time()-t0:.2f}s top={[(h.primary_key, round(h.score,4)) for h in r1[:3]]}",
          flush=True)
    assert r1[0].primary_key == 1235, r1[0]

    t0 = time.time()
    db.flush()  # checkpoint: state_dict -> download_rows through tunnel
    print(f"checkpoint: {time.time()-t0:.2f}s", flush=True)

    # tail writes after the checkpoint -> live only in the WAL
    Y = rng.standard_normal((2_000, d)).astype(np.float32)
    db.batch_insert("docs", [
        {"id": 40_000 + i, "tag": 9, "emb": Y[i]} for i in range(len(Y))
    ])
    qt = Y[77]
    rt = db.vector_search("docs", "emb", qt, top_k=3)
    assert rt[0].primary_key == 40_077, rt[0]
    # simulate a crash: sever the WAL + background jobs, no checkpoint
    db.engine._wal.close()
    db.engine._crontab.stop()
    del db

    t0 = time.time()
    db2 = ToStoreTPU.open(tmp, schemas=[schema])
    open_s = time.time() - t0
    t0 = time.time()
    r2 = db2.vector_search("docs", "emb", q, top_k=5)
    touch_s = time.time() - t0
    print(f"reopen {open_s:.2f}s, first touch {touch_s:.2f}s", flush=True)
    assert [h.primary_key for h in r2] == [h.primary_key for h in r1], (r1, r2)
    rt2 = db2.vector_search("docs", "emb", qt, top_k=3)
    assert rt2[0].primary_key == 40_077, rt2[0]
    assert db2.count("docs") == 32_000, db2.count("docs")
    # replayed tail must be re-insertable-idempotent: reopen once more
    # WITHOUT a checkpoint in between (deferred fold) and recount
    st = db2.engine.status()
    print("recovered_wal_entries:", st["counters"].get("recovered_wal_entries"),
          flush=True)
    db2.engine._wal.close()
    db2.engine._crontab.stop()
    del db2
    db3 = ToStoreTPU.open(tmp, schemas=[schema])
    assert db3.count("docs") == 32_000, db3.count("docs")
    r3 = db3.vector_search("docs", "emb", q, top_k=5)
    assert [h.primary_key for h in r3] == [h.primary_key for h in r1]
    db3.close()
    print("VERIFY DRIVE OK", flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
