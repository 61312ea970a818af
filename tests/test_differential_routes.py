"""Differential fuzz over the vectorized fast ROUTES vs the record paths.

Two route families gained columnar/vectorized fast paths in round 4:
  - the single-equality-join row-id path (query/executor.py:_join_rows),
  - conditional bulk update/delete (engine/database.py BULK_UPDATE_MIN_ROWS
    gating into the batch_update/batch_delete machinery).
The record paths are the semantic reference (reference parity:
query_executor.dart joins, data_store_impl.dart updateInternal/
deleteInternal); the fast paths must be RESULT-IDENTICAL including
multi-match tie order, pagination boundaries, and watch events. These
fuzzes force both routes over random data/queries and diff everything.
"""

import numpy as np
import pytest

from tostore_tpu import (
    DataType,
    FieldSchema,
    IndexSchema,
    QueryCondition,
    TableSchema,
    ToStoreTPU,
)


# --------------------------------------------------------------------------
# Join fast path vs record path
# --------------------------------------------------------------------------


def _join_db(rng):
    left = TableSchema(
        name="l",
        fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("ks", DataType.text),
            FieldSchema("kf", DataType.double),
            FieldSchema("v", DataType.integer),
            FieldSchema("flag", DataType.boolean),
        ),
        indexes=(IndexSchema(fields=("v",)),),
    )
    right = TableSchema(
        name="r",
        fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("ks", DataType.text),
            FieldSchema("w", DataType.integer),
            FieldSchema("tag", DataType.text),
        ),
    )
    db = ToStoreTPU.memory(schemas=[left, right])
    nl = int(rng.integers(20, 150))
    nr = int(rng.integers(5, 60))
    # narrow key ranges force heavy duplication (multi-match tie order)
    db.batch_insert("l", [
        {
            "k": None if rng.random() < 0.12 else int(rng.integers(0, 9)),
            "ks": None if rng.random() < 0.12 else f"s{int(rng.integers(0, 6))}",
            "kf": None if rng.random() < 0.12 else float(rng.integers(0, 5)),
            "v": int(rng.integers(0, 50)),
            "flag": bool(rng.random() < 0.5),
        }
        for _ in range(nl)
    ])
    db.batch_insert("r", [
        {
            "k": None if rng.random() < 0.15 else int(rng.integers(0, 9)),
            "ks": None if rng.random() < 0.15 else f"s{int(rng.integers(0, 6))}",
            "w": int(rng.integers(0, 30)),
            "tag": f"t{i}",
        }
        for i in range(nr)
    ])
    # deletes free rowids; later writes reuse them (tie-order stress)
    db.delete("l").condition(QueryCondition().where("v", ">", 45)).execute()
    db.batch_insert("l", [
        {"k": int(rng.integers(0, 9)), "ks": f"s{int(rng.integers(0, 6))}",
         "kf": float(rng.integers(0, 5)), "v": int(rng.integers(0, 50)),
         "flag": True}
        for _ in range(int(rng.integers(0, 10)))
    ])
    return db


def _random_join_query(db, rng):
    q = db.query("l").no_cache()
    key = rng.choice(["k", "ks", "id", "mixed"]).item()
    lf, rf = {
        "k": ("k", "k"),
        "ks": ("ks", "ks"),
        "id": ("id", "id"),
        "mixed": ("k", "w"),
    }[key]
    kind = rng.choice(["inner", "left", "right"], p=[0.4, 0.35, 0.25]).item()
    q = q.join("r", lf, rf, kind=kind)
    if rng.random() < 0.6:
        c = QueryCondition()
        f = rng.choice(["v", "k", "flag"]).item()
        op = rng.choice(["<", ">", "=", "!="]).item()
        c.where(f, op, int(rng.integers(0, 40)) if f != "flag" else True)
        q = q.condition(c)
    n_order = int(rng.integers(0, 3))
    fields = list(rng.choice(["v", "k", "ks", "kf", "flag"], n_order, replace=False))
    for f in fields:
        q = q.order_by(f, desc=bool(rng.random() < 0.4))
    if rng.random() < 0.5:
        q = q.offset(int(rng.integers(0, 20)))
    if rng.random() < 0.8:
        q = q.limit(int(rng.integers(1, 40)))
    if rng.random() < 0.3:
        sel = ["id", "v", "r.tag"] if rng.random() < 0.5 else ["id", "k", "r.w"]
        q = q.select(*sel)
    return q


@pytest.mark.parametrize("seed", list(range(1, 21)))
def test_differential_join_routes(seed):
    rng = np.random.default_rng(seed)
    db = _join_db(rng)
    try:
        exe = db.engine.executor
        real = type(exe)._join_rows
        for _ in range(12):
            build_rng_state = rng.bit_generator.state
            q_fast = _random_join_query(db, rng)
            fast = q_fast.fetch()
            rng.bit_generator.state = build_rng_state
            type(exe)._join_rows = lambda self, *a, **kw: None
            try:
                slow = _random_join_query(db, rng).fetch()
            finally:
                type(exe)._join_rows = real
            assert fast.records == slow.records, f"seed={seed}"
            assert fast.total == slow.total
            assert fast.has_more == slow.has_more
            # mutate between queries so lazy index/delta state varies
            if rng.random() < 0.5:
                db.insert("l", {
                    "k": int(rng.integers(0, 9)), "ks": "s1",
                    "kf": 1.0, "v": int(rng.integers(0, 50)), "flag": False,
                })
            if rng.random() < 0.25:
                db.delete("l").condition(QueryCondition().where(
                    "v", "=", int(rng.integers(0, 50)))).execute()
    finally:
        db.close()


# --------------------------------------------------------------------------
# Conditional bulk update/delete routes vs per-row routes
# --------------------------------------------------------------------------


def _write_schema():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("a", DataType.integer),
            FieldSchema("b", DataType.double),
            FieldSchema("s", DataType.text),
            FieldSchema("flag", DataType.boolean),
            FieldSchema("u", DataType.integer, unique=True, nullable=True),
        ),
        indexes=(IndexSchema(fields=("a",)),),
    )


def _snapshot(db):
    res = db.query("t").no_cache().fetch()
    return sorted(res.records, key=lambda r: r["id"])


def _rand_cond(rng):
    c = QueryCondition()
    f = rng.choice(["a", "b", "s", "flag"]).item()
    if f == "flag":
        c.where("flag", "=", bool(rng.random() < 0.5))
    elif f == "s":
        c.where("s", rng.choice(["=", "!=", "like"]).item(),
                "x%" if rng.random() < 0.3 else f"x{int(rng.integers(0, 5))}")
    else:
        c.where(f, rng.choice(["<", ">", ">=", "<="]).item(),
                int(rng.integers(-5, 25)))
    return c


@pytest.mark.parametrize("seed", list(range(1, 13)))
def test_differential_bulk_write_routes(seed):
    rng = np.random.default_rng(100 + seed)

    def fresh(bulk_min):
        db = ToStoreTPU.memory(schemas=[_write_schema()])
        db.engine.BULK_UPDATE_MIN_ROWS = bulk_min
        recs = [
            {
                "a": int(rng.integers(-5, 25)),
                "b": float(np.round(rng.normal() * 5, 3)),
                "s": f"x{int(rng.integers(0, 5))}",
                "flag": bool(rng.random() < 0.5),
                "u": None if rng.random() < 0.5 else int(i),
            }
            for i in range(int(rng.integers(40, 200)))
        ]
        return db, recs

    state = rng.bit_generator.state
    db_bulk, recs = fresh(1)          # every conditional write goes columnar
    rng.bit_generator.state = state
    db_row, recs2 = fresh(10**9)      # every conditional write stays per-row
    assert recs == recs2
    db_bulk.batch_insert("t", [dict(r) for r in recs])
    db_row.batch_insert("t", [dict(r) for r in recs])

    ev_bulk, ev_row = [], []
    db_bulk.watch("t", lambda e: ev_bulk.append((e.type, e.pk)))
    db_row.watch("t", lambda e: ev_row.append((e.type, e.pk)))

    try:
        for _ in range(15):
            op = rng.choice(["update", "delete", "update_all"]).item()
            cond = _rand_cond(rng)
            if op == "delete":
                r1 = db_bulk.delete("t").condition(cond).execute()
                r2 = db_row.delete("t").condition(cond).execute()
            else:
                updates = {}
                for f in rng.choice(["a", "b", "s", "flag"],
                                    int(rng.integers(1, 4)), replace=False):
                    updates[f] = (
                        int(rng.integers(-5, 25)) if f == "a"
                        else float(np.round(rng.normal(), 3)) if f == "b"
                        else f"x{int(rng.integers(0, 5))}" if f == "s"
                        else bool(rng.random() < 0.5)
                    )
                if rng.random() < 0.2:  # unique-collision probe: both
                    updates["u"] = 1    # routes must fail identically
                if op == "update_all":
                    r1 = db_bulk.update("t", updates).allow_update_all().execute()
                    r2 = db_row.update("t", updates).allow_update_all().execute()
                else:
                    r1 = db_bulk.update("t", updates).condition(cond).execute()
                    r2 = db_row.update("t", updates).condition(cond).execute()
            assert sorted(r1.success_keys) == sorted(r2.success_keys)
            assert r1.is_success == r2.is_success
            assert _snapshot(db_bulk) == _snapshot(db_row)
            if rng.random() < 0.4:  # interleave inserts (rowid churn)
                db_bulk.insert("t", {"a": 1, "b": 1.0, "s": "x1", "flag": True})
                db_row.insert("t", {"a": 1, "b": 1.0, "s": "x1", "flag": True})
        assert sorted(ev_bulk) == sorted(ev_row)
    finally:
        db_bulk.close()
        db_row.close()


# --------------------------------------------------------------------------
# Join + aggregate route and joined-field ordering vs record path
# --------------------------------------------------------------------------


def _random_join_agg_query(db, rng):
    from tostore_tpu.models.aggregation import Agg

    q = db.query("l").no_cache()
    key = rng.choice(["k", "ks", "mixed"]).item()
    lf, rf = {"k": ("k", "k"), "ks": ("ks", "ks"), "mixed": ("k", "w")}[key]
    kind = rng.choice(["inner", "left", "right"]).item()
    q = q.join("r", lf, rf, kind=kind)
    if rng.random() < 0.7:
        c = QueryCondition()
        if rng.random() < 0.5:
            c.where("v", rng.choice(["<", ">"]).item(),
                    int(rng.integers(0, 40)))
        else:
            c.where("r.w", rng.choice(["<", ">"]).item(),
                    int(rng.integers(0, 30)))
        q = q.condition(c)
    n_group = int(rng.integers(0, 3))
    pool = ["ks", "flag", "tag", "r.tag", "w", "kf"]
    groups = list(rng.choice(pool, n_group, replace=False))
    if groups:
        q = q.group_by(*groups)
    # exact-parity aggregates only: int sum/avg (python float division of
    # an exact int sum), min/max, count — float SUMS differ in last-ulp
    # reduction order between np.add.at and the sequential record path
    aggs = [Agg.count(alias="n")]
    if rng.random() < 0.7:
        aggs.append(Agg.sum("v", alias="sv"))
    if rng.random() < 0.5:
        aggs.append(Agg.avg("w", alias="aw"))
    if rng.random() < 0.5:
        aggs.append(Agg.min("kf", alias="mk"))
    if rng.random() < 0.5:
        aggs.append(Agg.max("w", alias="xw"))
    if rng.random() < 0.3:
        aggs.append(Agg.count("tag", alias="ct"))
    q = q.aggregate(*aggs)
    if rng.random() < 0.4:
        q = q.having("n", ">", int(rng.integers(0, 4)))
    if rng.random() < 0.4:
        q = q.order_by("n", desc=bool(rng.random() < 0.5))
    if rng.random() < 0.4:
        q = q.limit(int(rng.integers(1, 8)))
    return q


def _random_joined_order_query(db, rng):
    q = db.query("l").no_cache()
    key = rng.choice(["k", "ks"]).item()
    q = q.join("r", key, key,
               kind=rng.choice(["inner", "left", "right"]).item())
    if rng.random() < 0.7:
        c = QueryCondition()
        pool = [("v", int(rng.integers(0, 40))),
                ("w", int(rng.integers(0, 30))),
                ("r.w", int(rng.integers(0, 30))),
                ("r.tag", f"t{int(rng.integers(0, 20))}")]
        f, val = pool[int(rng.integers(0, len(pool)))]
        op = "=" if isinstance(val, str) else rng.choice(["<", ">"]).item()
        c.where(f, op, val)
        if rng.random() < 0.3:  # OR across tables: superset pre-scan
            c.or_(QueryCondition().where(
                "r.w", ">", int(rng.integers(10, 30))))
        q = q.condition(c)
    # at least one RIGHT-side order field, mixed with base fields
    pool_r = ["w", "tag", "r.w", "r.tag"]
    pool_l = ["v", "ks", "kf", "flag"]
    fields = [rng.choice(pool_r).item()]
    for _ in range(int(rng.integers(0, 2))):
        fields.append(rng.choice(pool_l).item())
    rng.shuffle(fields)
    for f in fields:
        q = q.order_by(f, desc=bool(rng.random() < 0.4))
    if rng.random() < 0.5:
        q = q.offset(int(rng.integers(0, 15)))
    q = q.limit(int(rng.integers(1, 30)))
    return q


@pytest.mark.parametrize("seed", list(range(1, 13)))
def test_differential_join_agg_and_joined_order(seed):
    rng = np.random.default_rng(seed + 100)
    db = _join_db(rng)
    try:
        exe = db.engine.executor
        real_join = type(exe)._join_rows
        real_agg = type(exe)._aggregate_pairs
        for _ in range(10):
            for gen in (_random_join_agg_query, _random_joined_order_query):
                state = rng.bit_generator.state
                fast = gen(db, rng).fetch()
                rng.bit_generator.state = state
                type(exe)._join_rows = lambda self, *a, **kw: None
                type(exe)._aggregate_pairs = lambda self, *a, **kw: None
                try:
                    slow = gen(db, rng).fetch()
                finally:
                    type(exe)._join_rows = real_join
                    type(exe)._aggregate_pairs = real_agg
                assert fast.records == slow.records, f"seed={seed}"
                assert fast.total == slow.total
                assert fast.has_more == slow.has_more
            if rng.random() < 0.5:
                db.insert("l", {
                    "k": int(rng.integers(0, 9)), "ks": "s2",
                    "kf": 2.0, "v": int(rng.integers(0, 50)), "flag": True,
                })
            if rng.random() < 0.3:
                db.insert("r", {
                    "k": int(rng.integers(0, 9)), "ks": "s3",
                    "w": int(rng.integers(0, 30)), "tag": "tX",
                })
    finally:
        db.close()


# --------------------------------------------------------------------------
# Multi-join (2 joins) vs sequential record-path joins
# --------------------------------------------------------------------------


def _multi_db(rng):
    base = TableSchema(
        name="l",
        fields=(
            FieldSchema("k", DataType.integer),
            FieldSchema("c", DataType.integer),
            FieldSchema("v", DataType.integer),
        ),
    )
    r1 = TableSchema(
        name="r1",
        fields=(
            FieldSchema("k1", DataType.integer),
            FieldSchema("w1", DataType.integer),
            FieldSchema("t1", DataType.text),
        ),
    )
    r2 = TableSchema(
        name="r2",
        fields=(
            FieldSchema("k2", DataType.integer),
            FieldSchema("w2", DataType.double),
        ),
    )
    db = ToStoreTPU.memory(schemas=[base, r1, r2])
    db.batch_insert("l", [
        {"k": None if rng.random() < 0.1 else int(rng.integers(0, 8)),
         "c": int(rng.integers(0, 6)),
         "v": int(rng.integers(0, 40))}
        for _ in range(int(rng.integers(20, 90)))
    ])
    db.batch_insert("r1", [
        {"k1": None if rng.random() < 0.15 else int(rng.integers(0, 8)),
         "w1": int(rng.integers(0, 20)),
         "t1": f"s{int(rng.integers(0, 4))}"}
        for _ in range(int(rng.integers(5, 40)))
    ])
    db.batch_insert("r2", [
        {"k2": int(rng.integers(0, 6)),
         "w2": None if rng.random() < 0.1 else float(rng.integers(0, 9))}
        for _ in range(int(rng.integers(3, 25)))
    ])
    return db


def _random_multi_query(db, rng):
    from tostore_tpu.models.aggregation import Agg

    q = db.query("l").no_cache()
    k1 = rng.choice(["inner", "left"]).item()
    k2 = rng.choice(["inner", "left"]).item()
    if rng.random() < 0.5:
        q = q.join("r1", "k", "k1", kind=k1).join("r2", "c", "k2", kind=k2)
    else:
        q = q.join("r2", "c", "k2", kind=k2).join("r1", "k", "k1", kind=k1)
    if rng.random() < 0.5:
        c = QueryCondition()
        c.where("v", rng.choice(["<", ">"]).item(), int(rng.integers(0, 30)))
        q = q.condition(c)
    if rng.random() < 0.45:
        groups = list(rng.choice(
            ["t1", "w1", "k2", "r2.w2", "c"],
            int(rng.integers(1, 3)), replace=False))
        q = q.group_by(*groups).aggregate(
            Agg.count(alias="n"), Agg.sum("v", alias="sv"),
            Agg.max("w1", alias="xw"), Agg.count("t1", alias="ct"))
        if rng.random() < 0.4:
            q = q.order_by("n", desc=True)
        return q
    n_order = int(rng.integers(0, 3))
    for f in rng.choice(["v", "w1", "t1", "w2", "r1.t1", "id"],
                        n_order, replace=False):
        q = q.order_by(f.item() if hasattr(f, "item") else f,
                       desc=bool(rng.random() < 0.4))
    if rng.random() < 0.5:
        q = q.offset(int(rng.integers(0, 12)))
    q = q.limit(int(rng.integers(1, 30)))
    return q


@pytest.mark.parametrize("seed", list(range(1, 13)))
def test_differential_multi_join(seed):
    rng = np.random.default_rng(seed + 300)
    db = _multi_db(rng)
    try:
        exe = db.engine.executor
        rj = type(exe)._join_rows
        ra = type(exe)._aggregate_pairs
        for _ in range(10):
            state = rng.bit_generator.state
            fast = _random_multi_query(db, rng).fetch()
            rng.bit_generator.state = state
            type(exe)._join_rows = lambda self, *a, **kw: None
            type(exe)._aggregate_pairs = lambda self, *a, **kw: None
            try:
                slow = _random_multi_query(db, rng).fetch()
            finally:
                type(exe)._join_rows = rj
                type(exe)._aggregate_pairs = ra
            assert fast.records == slow.records, f"seed={seed}"
            assert fast.total == slow.total
            assert fast.has_more == slow.has_more
            if rng.random() < 0.4:
                db.insert("l", {"k": int(rng.integers(0, 8)),
                                "c": int(rng.integers(0, 6)),
                                "v": int(rng.integers(0, 40))})
            if rng.random() < 0.25:
                db.insert("r1", {"k1": int(rng.integers(0, 8)),
                                 "w1": int(rng.integers(0, 20)),
                                 "t1": "sX"})
    finally:
        db.close()


@pytest.mark.parametrize("seed", list(range(1, 9)))
def test_differential_join_cursor_walks(seed):
    """Full forward cursor walks + one prev() inversion over join
    queries, fast path vs record path (cursor pages over joins
    vectorized in r4)."""
    rng = np.random.default_rng(seed + 500)
    db = _join_db(rng)
    try:
        exe = db.engine.executor
        rj = type(exe)._join_rows

        def walk(q0, use_fast):
            if not use_fast:
                type(exe)._join_rows = lambda self, *a, **kw: None
            try:
                r = q0().fetch()
                out = [tuple(sorted(x.items(), key=lambda kv: kv[0]))
                       for x in r.records]
                pages = 0
                while r.has_more and pages < 100:
                    r = r.next()
                    out += [tuple(sorted(x.items(), key=lambda kv: kv[0]))
                            for x in r.records]
                    pages += 1
                return out
            finally:
                type(exe)._join_rows = rj

        for _ in range(6):
            state = rng.bit_generator.state

            def mk():
                return _random_joined_order_query(db, rng)

            fast = walk(mk, True)
            rng.bit_generator.state = state
            slow = walk(mk, False)
            assert fast == slow, f"seed={seed}"
            # prev() inverts next() on both paths
            rng.bit_generator.state = state
            q = mk()
            r1 = q.fetch()
            if r1.has_more:
                r2 = r1.next()
                r3 = r2.prev()
                assert r3.records == r1.records
    finally:
        db.close()


@pytest.mark.parametrize("seed", list(range(1, 7)))
def test_differential_join_distinct(seed):
    """DISTINCT over joins: fast path (fully-matched pair sets) vs the
    record path's json/str identity."""
    rng = np.random.default_rng(seed + 700)
    db = _join_db(rng)
    try:
        exe = db.engine.executor
        rd = type(exe)._distinct_pairs
        for _ in range(8):
            kind = rng.choice(["inner", "left", "right"]).item()
            sel = list(rng.choice(["ks", "tag", "w", "flag", "v"],
                                  int(rng.integers(1, 3)), replace=False))
            q0 = (db.query("l").join("r", "k", "k", kind=kind)
                  .select(*sel).distinct().limit(int(rng.integers(2, 40)))
                  .no_cache())
            if rng.random() < 0.5:
                q0 = q0.order_by(sel[0], desc=bool(rng.random() < 0.4))
            if rng.random() < 0.4:
                q0 = q0.where("r.w" if rng.random() < 0.5 else "v",
                              ">", int(rng.integers(0, 25)))
            fast = q0.fetch()
            type(exe)._distinct_pairs = lambda self, *a, **kw: None
            try:
                slow = q0.no_cache().fetch()
            finally:
                type(exe)._distinct_pairs = rd
            assert fast.records == slow.records, f"seed={seed}"
            assert fast.total == slow.total
            if rng.random() < 0.4:
                db.insert("l", {"k": int(rng.integers(0, 9)), "ks": "s1",
                                "kf": 1.0, "v": int(rng.integers(0, 50)),
                                "flag": True})
    finally:
        db.close()
