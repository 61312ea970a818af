"""REAL process-kill recovery: a writer subprocess hammers inserts /
updates / kv sets and is SIGKILLed mid-flight; the parent reopens the
same database and checks invariants, repeatedly on the SAME path so
recovery compounds across cycles (reference README.md:1533-1537 —
repeated process kill during high-frequency writes, "able to recover
quickly"; wal_manager.dart:608 recovery). The in-process fault
injection (test_crash_injection.py) covers torn-byte cases; this covers
the real OS kill path end to end."""

import os
import signal
import subprocess
import sys
import time

import pytest

WRITER = r"""
import sys, time
sys.path.insert(0, sys.argv[2])  # repo root: script lives in tmp
import jax
jax.config.update("jax_platforms", "cpu")
from tostore_tpu import ToStoreTPU, TableSchema, FieldSchema, DataType

path = sys.argv[1]
s = TableSchema(name="t", fields=(
    FieldSchema("a", DataType.integer),
    FieldSchema("s", DataType.text)))
db = ToStoreTPU.open(path, schemas=[s])
base = db.count("t")
print("READY", base, flush=True)
i = 0
while True:
    r = db.insert("t", {"a": 0, "s": f"row{i}"})
    pk = r.success_keys[0]
    db.update_by_pk("t", pk, {"a": pk * 2})  # invariant: a == 2*pk
    if i % 7 == 0:
        db.kv.set(f"k{i % 50}", i)
    if i % 401 == 400:
        db.engine.flush()  # checkpoints interleave with the kills
    i += 1
"""


@pytest.mark.parametrize("cycles", [8])
def test_kill9_during_writes_recovers(tmp_path, cycles):
    path = str(tmp_path / "db")
    wfile = str(tmp_path / "writer.py")
    with open(wfile, "w") as f:
        f.write(WRITER)
    last_count = 0
    recover_times = []
    for cyc in range(cycles):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        p = subprocess.Popen(
            [sys.executable, wfile, path, repo],
            stdout=subprocess.PIPE, text=True, cwd=repo,
        )
        line = p.stdout.readline()
        assert line.startswith("READY"), line
        assert int(line.split()[1]) == last_count  # prior cycle recovered
        time.sleep(0.3 + 0.15 * (cyc % 4))  # kill at varying phases
        os.kill(p.pid, signal.SIGKILL)
        p.wait()

        t0 = time.time()
        import jax
        from tostore_tpu import ToStoreTPU

        db = ToStoreTPU.open(path)
        recover_times.append(time.time() - t0)
        try:
            res = db.query("t").limit(10**9).no_cache().fetch()
            n = len(res.records)
            assert n >= last_count, (n, last_count)
            pks = [r["id"] for r in res.records]
            assert len(set(pks)) == n  # no duplicate pks after replay
            for r in res.records:
                # the update may not have committed for the LAST row;
                # every other row must satisfy the invariant
                assert r["a"] in (0, r["id"] * 2), r
            # each kill can strand at most ONE insert whose paired
            # update never committed; stragglers accumulate across
            # cycles (the writer never revisits old rows)
            stragglers = [r for r in res.records if r["a"] == 0]
            assert len(stragglers) <= cyc + 1, stragglers[:3]
            chk = db.check_integrity()
            assert not chk.get("errors"), chk
            last_count = n
        finally:
            db.close()
    # recovery stays fast as the db grows across kill cycles
    assert max(recover_times) < 30.0, recover_times
