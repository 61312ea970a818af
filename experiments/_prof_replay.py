"""Reopen-after-kill breakdown at soak shape (scaled): where does the
'wal_replay_rows_per_s' denominator go — snapshot load, replay, or the
post-replay checkpoint?"""

import jax

jax.config.update("jax_platforms", "cpu")

import os
import shutil
import tempfile
import time
import cProfile
import pstats

from tostore_tpu import DataType, FieldSchema, TableSchema, ToStoreTPU

n_rel = 4_000_000
tail_rows = 500_000

rel = TableSchema(
    name="events",
    fields=(
        FieldSchema("a", DataType.integer),
        FieldSchema("b", DataType.integer),
    ),
)

tmp = tempfile.mkdtemp(prefix="tostore_replay_")
try:
    db = ToStoreTPU.open(tmp, schemas=[rel])
    step = 500_000
    t0 = time.time()
    for lo in range(0, n_rel, step):
        db.batch_insert("events", [
            {"id": i + 1, "a": i % 97, "b": i % 1009}
            for i in range(lo, lo + step)
        ])
    print(f"ingest: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    db.engine.flush(force_all=True)
    print(f"checkpoint: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    db.batch_insert("events", [
        {"id": n_rel + i + 1, "a": 1, "b": 2} for i in range(tail_rows)
    ])
    print(f"tail ingest: {time.time()-t0:.1f}s", flush=True)
    db.engine._crontab and db.engine._crontab.stop()
    del db

    # instrument the reopen phases
    import tostore_tpu.engine.database as dbmod

    orig_replay = dbmod.Database._replay_stream
    orig_flush = dbmod.Database.flush

    def timed_replay(self, entries):
        t = time.time()
        n = orig_replay(self, entries)
        print(f"  _replay_stream: {time.time()-t:.2f}s ({n} entries)",
              flush=True)
        return n

    def timed_flush(self, *a, **k):
        t = time.time()
        r = orig_flush(self, *a, **k)
        print(f"  flush: {time.time()-t:.2f}s", flush=True)
        return r

    dbmod.Database._replay_stream = timed_replay
    dbmod.Database.flush = timed_flush

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    db2 = ToStoreTPU.open(tmp, schemas=[rel])
    prof.disable()
    reopen_s = time.time() - t0
    print(f"reopen: {reopen_s:.2f}s -> {tail_rows/reopen_s:,.0f} rows/s",
          flush=True)
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(25)
    db2.close()
finally:
    shutil.rmtree(tmp, ignore_errors=True)
