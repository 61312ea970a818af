"""Differential fuzz test: random operation sequences applied both to the
engine and to a naive in-Python model; query results must agree.

This is the property tier the reference lacks entirely (SURVEY.md §4) —
its integration scenarios only check hand-picked cases.
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


def schema():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("a", DataType.integer),
            FieldSchema("b", DataType.double),
            FieldSchema("s", DataType.text),
            FieldSchema("flag", DataType.boolean),
        ),
        indexes=(IndexSchema(fields=("a",)), IndexSchema(fields=("s",))),
    )


class NaiveModel:
    def __init__(self):
        self.rows: dict[int, dict] = {}
        self.next_pk = 1

    def insert(self, rec):
        pk = self.next_pk
        self.next_pk += 1
        self.rows[pk] = {"id": pk, **rec}
        return pk

    def update(self, cond, updates):
        for pk, r in self.rows.items():
            if cond.matches(r):
                r.update(updates)

    def delete(self, cond):
        for pk in [pk for pk, r in self.rows.items() if cond.matches(r)]:
            del self.rows[pk]

    def query(self, cond):
        return sorted(
            (r for r in self.rows.values() if cond is None or cond.matches(r)),
            key=lambda r: r["id"],
        )


def random_value(rng, field):
    if rng.random() < 0.1:
        return None
    if field == "a":
        return int(rng.integers(-20, 20))
    if field == "b":
        return float(np.round(rng.normal() * 10, 3))
    if field == "s":
        return rng.choice(["alpha", "beta", "gamma", "", "a%b", "zeta"]).item()
    return bool(rng.random() < 0.5)


def random_condition(rng) -> QueryCondition:
    c = QueryCondition()
    n_leaves = int(rng.integers(1, 4))
    for _ in range(n_leaves):
        f = rng.choice(["a", "b", "s", "flag"]).item()
        op = rng.choice(["=", "!=", ">", "<", ">=", "<=", "in", "between", "like", "is", "isNot"]).item()
        if op in ("is", "isNot"):
            c.where(f, op, None)
        elif op == "in":
            c.where(f, "in", [random_value(rng, f) for _ in range(3)])
        elif op == "between":
            lo, hi = sorted(
                [random_value(rng, f) or 0, random_value(rng, f) or 1],
                key=lambda x: (x is None, x if not isinstance(x, str) else 0)
                if not isinstance(x, bool) else (False, int(x)),
            ) if f in ("a", "b") else (0, 1)
            c.where(f, "between", (lo, hi))
        elif op == "like":
            c.where("s", "like", rng.choice(["a%", "%a%", "be_a", "%"]).item())
        else:
            v = random_value(rng, f)
            if v is None:
                v = 0 if f in ("a", "b") else "alpha"
            c.where(f, op, v)
    if rng.random() < 0.3:
        sub = QueryCondition().where(
            rng.choice(["a", "b"]).item(), ">", int(rng.integers(-10, 10))
        )
        (c.or_ if rng.random() < 0.5 else c.and_)(sub)
    return c


@pytest.mark.parametrize("seed", list(range(1, 13)))
def test_differential_random_ops(seed):
    rng = np.random.default_rng(seed)
    db = ToStoreTPU.memory(schemas=[schema()])
    model = NaiveModel()
    fields = ["a", "b", "s", "flag"]
    for step in range(120):
        roll = rng.random()
        if roll < 0.45 or not model.rows:
            rec = {f: random_value(rng, f) for f in fields}
            r = db.insert("t", rec)
            assert r.is_success, r.message
            mpk = model.insert(rec)
            assert r.success_keys[0] == mpk
        elif roll < 0.65:
            cond = random_condition(rng)
            updates = {rng.choice(fields).item(): random_value(rng, rng.choice(fields).item())}
            f = list(updates)[0]
            updates = {f: random_value(rng, f)}
            db.update("t", updates).condition(cond).execute()
            model.update(cond, updates)
        elif roll < 0.72:
            cond = random_condition(rng)
            db.delete("t").condition(cond).execute()
            model.delete(cond)
        elif roll < 0.78 and model.rows:
            # batch_update by pk: exercises the columnar fast path (and
            # its general fallback when field sets are non-uniform)
            pks = list(model.rows)
            chosen = [
                pks[i] for i in rng.choice(
                    len(pks), min(len(pks), int(rng.integers(1, 6))),
                    replace=False,
                )
            ]
            f = rng.choice(["a", "b", "flag"]).item()
            recs = []
            for pk in chosen:
                v = random_value(rng, f)
                recs.append({"id": pk, f: v})
                model.rows[pk][f] = v
            r = db.batch_update("t", recs)
            assert r.is_success, r.message
        elif roll < 0.82:
            # batch_upsert: mixes existing-pk updates with new inserts
            # through the split fast path
            n_new = int(rng.integers(1, 4))
            recs = []
            for _ in range(n_new):
                rec = {f: random_value(rng, f) for f in fields}
                pk = model.next_pk  # upsert consumes sequential ids
                recs.append({"id": pk, **rec})
                model.insert(rec)
            if model.rows and rng.random() < 0.5:
                pks = list(model.rows)
                pk = pks[int(rng.integers(0, len(pks)))]
                v = random_value(rng, "a")
                recs.append({"id": pk, "a": v})
                model.rows[pk]["a"] = v
            r = db.batch_upsert("t", recs)
            assert r.is_success, r.message
        else:
            cond = random_condition(rng)
            got = db.query("t").condition(cond).limit(10_000).fetch().records
            want = model.query(cond)
            assert len(got) == len(want), f"step {step}: {len(got)} vs {len(want)} for {cond}"
            for g, w in zip(got, want):
                assert g["id"] == w["id"], f"step {step}: ids diverge {g['id']} vs {w['id']}"
                for f in fields:
                    gv, wv = g.get(f), w.get(f)
                    if isinstance(wv, float) and wv is not None and gv is not None:
                        assert abs(gv - wv) < 1e-9
                    else:
                        assert gv == wv, f"step {step} pk {g['id']} field {f}: {gv!r} vs {wv!r}"
    # final full-table parity
    got = db.query("t").limit(10_000).fetch().records
    want = model.query(None)
    assert [g["id"] for g in got] == [w["id"] for w in want]
    assert db.check_integrity()["ok"]
    db.close()


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_differential_ordering_pagination_aggregates(seed):
    rng = np.random.default_rng(seed)
    db = ToStoreTPU.memory(schemas=[schema()])
    model = NaiveModel()
    fields = ["a", "b", "s", "flag"]
    for _ in range(150):
        rec = {f: random_value(rng, f) for f in fields}
        db.insert("t", rec)
        model.insert(rec)

    def sort_key(r, f, desc):
        v = r.get(f)
        if v is None:
            k = (0, 0)
        elif isinstance(v, bool):
            k = (1, int(v))
        elif isinstance(v, (int, float)):
            k = (2, v)
        else:
            k = (3, str(v))
        return k

    for _ in range(25):
        f = rng.choice(["a", "b", "s"]).item()
        desc = bool(rng.random() < 0.5)
        limit = int(rng.integers(1, 40))
        offset = int(rng.integers(0, 30))
        got = (
            db.query("t").order_by(f, desc=desc).offset(offset).limit(limit).fetch().records
        )
        want = sorted(
            model.query(None),
            key=lambda r: (
                tuple(
                    (lambda k: _Neg(k) if desc else k)(sort_key(r, ff, desc))
                    for ff in [f]
                ),
                r["id"],
            ),
        )[offset : offset + limit]
        assert [g["id"] for g in got] == [w["id"] for w in want], (f, desc, offset, limit)

    # cursor pagination walks the same total set exactly once
    page = db.query("t").order_by("a").limit(17).fetch()
    seen = [r["id"] for r in page]
    while page.next_cursor:
        page = page.next()
        seen.extend(r["id"] for r in page)
    assert sorted(seen) == sorted(r["id"] for r in model.query(None))
    assert len(seen) == len(set(seen))

    # aggregates
    from tostore_tpu.models.aggregation import Agg

    res = db.query("t").aggregate(
        Agg.count(alias="n"), Agg.sum("a", "sa"), Agg.min("b", "mb"), Agg.max("b", "xb")
    ).fetch()[0]
    rows = model.query(None)
    a_vals = [r["a"] for r in rows if r["a"] is not None]
    b_vals = [r["b"] for r in rows if r["b"] is not None]
    assert res["n"] == len(rows)
    assert res["sa"] == sum(a_vals)
    assert res["mb"] == pytest.approx(min(b_vals))
    assert res["xb"] == pytest.approx(max(b_vals))
    db.close()


class _Neg:
    __slots__ = ("k",)

    def __init__(self, k):
        self.k = k

    def __lt__(self, o):
        return o.k < self.k

    def __eq__(self, o):
        return o.k == self.k


@pytest.mark.parametrize("seed", [31, 32, 33, 34])
def test_differential_crash_recovery(tmp_path, seed):
    """Random ops (incl. the columnar batch paths and transactions), then
    a crash WITHOUT checkpoint; WAL replay at reopen must reconstruct
    exactly the model's state."""
    rng = np.random.default_rng(seed)
    db = ToStoreTPU.open(str(tmp_path / f"d{seed}"), schemas=[schema()])
    model = NaiveModel()
    fields = ["a", "b", "s", "flag"]
    for step in range(120):
        roll = rng.random()
        if roll < 0.4 or not model.rows:
            rec = {f: random_value(rng, f) for f in fields}
            r = db.insert("t", rec)
            assert r.is_success
            model.insert(rec)
        elif roll < 0.55:
            cond = random_condition(rng)
            f = rng.choice(fields).item()
            updates = {f: random_value(rng, f)}
            db.update("t", updates).condition(cond).execute()
            model.update(cond, updates)
        elif roll < 0.65:
            cond = random_condition(rng)
            db.delete("t").condition(cond).execute()
            model.delete(cond)
        elif roll < 0.75 and model.rows:
            pks = list(model.rows)
            chosen = [
                pks[i] for i in rng.choice(
                    len(pks), min(len(pks), int(rng.integers(1, 6))),
                    replace=False)
            ]
            f = rng.choice(["a", "b", "flag"]).item()
            recs = []
            for pk in chosen:
                v = random_value(rng, f)
                recs.append({"id": pk, f: v})
                model.rows[pk][f] = v
            assert db.batch_update("t", recs).is_success
        elif roll < 0.85:
            # committed transaction: two updates on random existing rows
            pks = list(model.rows)
            pk = pks[int(rng.integers(0, len(pks)))]
            v = random_value(rng, "a")

            def action(tx, pk=pk, v=v):
                db.update_by_pk("t", pk, {"a": v})

            r = db.transaction(action)
            if r.committed:
                model.rows[pk]["a"] = v
        else:
            rec = {f: random_value(rng, f) for f in fields}
            pk = model.next_pk
            assert db.batch_upsert("t", [{"id": pk, **rec}]).is_success
            model.insert(rec)
    db.engine._wal.close()  # crash: no final checkpoint
    db2 = ToStoreTPU.open(str(tmp_path / f"d{seed}"), schemas=[schema()])
    try:
        got = db2.query("t").limit(10_000).fetch().records
        want = model.query(None)
        assert [g["id"] for g in got] == [w["id"] for w in want]
        for g, w in zip(got, want):
            for f in fields:
                gv, wv = g.get(f), w.get(f)
                if isinstance(wv, float) and gv is not None:
                    assert abs(gv - wv) < 1e-9
                else:
                    assert gv == wv, (g["id"], f, gv, wv)
        assert db2.check_integrity()["ok"]
    finally:
        db2.close()


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_differential_hybrid_vector_search(seed):
    """Random hybrid predicates through the device-mask path vs a
    post-filtered exact oracle (flat index -> results must match the
    oracle exactly, north-star path SURVEY §2.1)."""
    from tostore_tpu.models.schema import (
        FieldSchema as FS, IndexSchema as IS, TableSchema as TS,
        VectorFieldConfig,
    )

    rng = np.random.default_rng(seed)
    d, n, k = 16, 400, 5
    schema_v = TS(
        name="docs",
        fields=(
            FS("views", DataType.integer),
            FS("score", DataType.double),
            FS("live", DataType.boolean),
            FS("emb", DataType.vector,
               vector_config=VectorFieldConfig(dimensions=d)),
        ),
        indexes=(IS(fields=("emb",), type="vector"),),
    )
    db = ToStoreTPU.memory(schemas=[schema_v])
    try:
        x = rng.standard_normal((n, d)).astype(np.float32)
        rows = [
            {"id": i + 1, "views": int(rng.integers(0, 50)),
             "score": float(np.round(rng.normal(), 3)),
             "live": bool(rng.random() < 0.5), "emb": x[i].tolist()}
            for i in range(n)
        ]
        db.batch_insert("docs", rows)
        for _ in range(15):
            # random device-compilable predicate
            cond = QueryCondition()
            for _ in range(int(rng.integers(1, 3))):
                f = rng.choice(["views", "score", "live"]).item()
                if f == "views":
                    cond.where(f, rng.choice(["<", ">=", "="]).item(),
                               int(rng.integers(0, 50)))
                elif f == "score":
                    cond.where(f, rng.choice(["<", ">"]).item(),
                               float(rng.normal()))
                else:
                    cond.where(f, "=", bool(rng.random() < 0.5))
            q = rng.standard_normal(d).astype(np.float32)
            hits = db.vector_search("docs", "emb", q, top_k=k,
                                    condition=cond)
            # oracle: post-filtered exact cosine
            match = [r for r in rows if cond.matches(r)]
            if not match:
                assert hits == []
                continue
            xs = np.stack([x[r["id"] - 1] for r in match])
            xs = xs / np.linalg.norm(xs, axis=1, keepdims=True)
            qn = q / max(np.linalg.norm(q), 1e-12)
            order = np.argsort(-(xs @ qn))[:k]
            want = [match[i]["id"] for i in order]
            got = [h.primary_key for h in hits]
            assert got == want, (got, want, cond)
    finally:
        db.close()


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_differential_multi_space(seed):
    """Random ops interleaved across two spaces plus a GLOBAL table:
    space-local state must stay isolated, global state shared."""
    from tostore_tpu.models.schema import FieldSchema as FS, TableSchema as TS

    rng = np.random.default_rng(seed)
    local_schema = TS(name="t", fields=(FS("v", DataType.integer),))
    global_schema = TS(name="g", fields=(FS("v", DataType.integer),),
                       is_global=True)
    db = ToStoreTPU.memory(schemas=[local_schema, global_schema])
    models = {"default": {}, "alpha": {}}
    gmodel = {}
    next_pk = {"default": 1, "alpha": 1}
    gnext = [1]
    try:
        for _ in range(300):
            space = rng.choice(["default", "alpha"]).item()
            db.switch_space(space)
            roll = rng.random()
            if roll < 0.5:
                v = int(rng.integers(0, 100))
                r = db.insert("t", {"v": v})
                assert r.is_success
                models[space][next_pk[space]] = v
                assert r.success_keys[0] == next_pk[space]
                next_pk[space] += 1
            elif roll < 0.65:
                v = int(rng.integers(0, 100))
                r = db.insert("g", {"v": v})
                assert r.is_success
                gmodel[gnext[0]] = v
                assert r.success_keys[0] == gnext[0]
                gnext[0] += 1
            elif roll < 0.8 and models[space]:
                pk = list(models[space])[int(rng.integers(0, len(models[space])))]
                db.delete_by_pk("t", pk)
                del models[space][pk]
            else:
                got = {r["id"]: r["v"] for r in db.query("t").limit(10_000).fetch()}
                assert got == models[space], (space, len(got), len(models[space]))
                gg = {r["id"]: r["v"] for r in db.query("g").limit(10_000).fetch()}
                assert gg == gmodel
        for space in ("default", "alpha"):
            db.switch_space(space)
            got = {r["id"]: r["v"] for r in db.query("t").limit(10_000).fetch()}
            assert got == models[space]
    finally:
        db.close()


@pytest.mark.parametrize("seed", [61, 62])
def test_differential_kv(seed):
    """Random KV ops (set/remove/increment/set_many/prefix ops, space vs
    global namespaces) vs a dict model."""
    rng = np.random.default_rng(seed)
    db = ToStoreTPU.memory()
    model = {"local": {}, "global": {}}
    try:
        for _ in range(400):
            ns = rng.choice(["local", "global"]).item()
            kv = db.kv_global if ns == "global" else db.kv
            m = model[ns]
            roll = rng.random()
            key = f"k{rng.integers(0, 40)}"
            if roll < 0.4:
                choices = [
                    int(rng.integers(-100, 100)), "s" + str(rng.integers(0, 9)),
                    bool(rng.random() < 0.5), float(np.round(rng.normal(), 3)),
                    [1, 2], {"a": 1},
                ]
                v = choices[int(rng.choice(6, p=[0.3, 0.3, 0.1, 0.1, 0.1, 0.1]))]
                kv.set(key, v)
                m[key] = v
            elif roll < 0.5:
                kv.remove(key)
                m.pop(key, None)
            elif roll < 0.6:
                base = m.get(key)
                if isinstance(base, int) and not isinstance(base, bool):
                    kv.set_increment(key, 5)
                    m[key] = base + 5
                elif base is None:
                    kv.set_increment(key, 5)
                    m[key] = 5
            elif roll < 0.7:
                pairs = {f"m{rng.integers(0, 10)}": int(rng.integers(0, 50))
                         for _ in range(3)}
                kv.set_many(pairs)
                m.update(pairs)
            else:
                assert kv.get(key, None) == m.get(key), (ns, key)
                assert kv.exists(key) == (key in m)
                pre = f"k{rng.integers(0, 4)}"
                got = kv.count_prefix(pre) if hasattr(kv, "count_prefix") else None
                if got is not None:
                    want = sum(1 for k in m if k.startswith(pre))
                    assert got == want, (pre, got, want)
        for ns, m in model.items():
            kv = db.kv_global if ns == "global" else db.kv
            for k, v in m.items():
                assert kv.get(k) == v, (ns, k)
    finally:
        db.close()


@pytest.mark.parametrize("seed", [71, 72])
def test_differential_schema_migration(seed):
    """Random add/remove/rename field cycles through update_schema, data
    integrity tracked against a field model."""
    from tostore_tpu.models.schema import FieldSchema as FS

    rng = np.random.default_rng(seed)
    db = ToStoreTPU.memory(schemas=[TableSchema(
        name="t", fields=(FS("f0", DataType.integer),),
    )])
    try:
        db.batch_insert("t", [{"f0": i} for i in range(50)])
        # model: field -> expected value for row id 1..50 (None = added later)
        fields = {"f0": lambda i: i - 1}
        counter = [0]
        for step in range(25):
            roll = rng.random()
            names = list(fields)
            if roll < 0.4 or len(names) <= 1:
                counter[0] += 1
                nm = f"g{counter[0]}"
                r = db.update_schema("t").add_field(
                    FS(nm, DataType.integer, default_value=7)
                ).execute()
                assert r.is_success, r.message
                fields[nm] = lambda i: 7  # default backfills
            elif roll < 0.6:
                victim = names[int(rng.integers(1, len(names)))]  # keep f0
                r = db.update_schema("t").remove_field(victim).execute()
                assert r.is_success, r.message
                del fields[victim]
            else:
                old = names[int(rng.integers(0, len(names)))]
                counter[0] += 1
                nm = f"r{counter[0]}"
                r = db.update_schema("t").rename_field(old, nm).execute()
                assert r.is_success, r.message
                fields[nm] = fields.pop(old)
            # spot-check a random row after every DDL
            rid = int(rng.integers(1, 51))
            rec = db.get_by_pk("t", rid)
            want = {f: fn(rid) for f, fn in fields.items()}
            got = {f: rec.get(f) for f in fields}
            assert got == want, (step, rid, got, want)
        assert db.count("t") == 50
        assert db.check_integrity()["ok"]
    finally:
        db.close()


@pytest.mark.parametrize("seed", [81, 82])
def test_differential_mesh_vs_single_device_engine(seed):
    """The SAME random vector workload (inserts, overwrites, deletes,
    hybrid searches) applied to a mesh-sharded engine and a single-device
    engine: flat indexes are exact on both, so results must agree."""
    from tostore_tpu.models.schema import (
        FieldSchema as FS, IndexSchema as IS, TableSchema as TS,
        VectorFieldConfig,
    )

    rng = np.random.default_rng(seed)
    d = 16

    def mk(mesh):
        schema = TS(
            name="docs",
            fields=(FS("views", DataType.integer),
                    FS("emb", DataType.vector,
                       vector_config=VectorFieldConfig(dimensions=d))),
            indexes=(IS(fields=("emb",), type="vector"),),
        )
        cfg = DataStoreConfig(mesh_shape=(2, 4)) if mesh else DataStoreConfig()
        return ToStoreTPU.memory(schemas=[schema], config=cfg)

    from tostore_tpu import DataStoreConfig

    dbs = [mk(False), mk(True)]
    try:
        next_pk = 1
        live = set()
        x = rng.standard_normal((3000, d)).astype(np.float32)
        for step in range(60):
            roll = rng.random()
            if roll < 0.5 or not live:
                n = int(rng.integers(1, 40))
                recs = [
                    {"id": next_pk + j, "views": int(rng.integers(0, 50)),
                     "emb": x[(next_pk + j) % 3000].tolist()}
                    for j in range(n)
                ]
                for db in dbs:
                    assert db.batch_insert("docs", recs).is_success
                live.update(r["id"] for r in recs)
                next_pk += n
            elif roll < 0.65:
                pk = list(live)[int(rng.integers(0, len(live)))]
                for db in dbs:
                    db.delete_by_pk("docs", pk)
                live.discard(pk)
            elif roll < 0.75:
                # overwrite an existing row's vector
                pk = list(live)[int(rng.integers(0, len(live)))]
                newv = x[int(rng.integers(0, 3000))].tolist()
                for db in dbs:
                    db.update_by_pk("docs", pk, {"emb": newv})
            else:
                q = x[int(rng.integers(0, 3000))]
                cond = None
                if rng.random() < 0.5:
                    cond = QueryCondition().where(
                        "views", ">=", int(rng.integers(0, 40)))
                res = [
                    [(h.primary_key, round(h.distance, 3))
                     for h in db.vector_search("docs", "emb", q, top_k=5,
                                               condition=cond)]
                    for db in dbs
                ]
                pks0 = [p for p, _ in res[0]]
                pks1 = [p for p, _ in res[1]]
                assert pks0 == pks1, (step, res)
        for db in dbs:
            assert db.count("docs") == len(live)
    finally:
        for db in dbs:
            db.close()


@pytest.mark.parametrize("seed", [91, 92])
def test_differential_fk_cascade_chain(seed):
    """users <- posts (cascade) <- comments (cascade), plus a setNull FK:
    random inserts/deletes vs a model that applies the cascade rules."""
    from tostore_tpu.models.schema import (
        FieldSchema as FS, ForeignKeyAction, ForeignKeySchema, TableSchema as TS,
    )

    rng = np.random.default_rng(seed)
    users = TS(name="u", fields=(FS("n", DataType.integer),))
    posts = TS(name="p", fields=(FS("uid", DataType.integer),),
               foreign_keys=(ForeignKeySchema("uid", "u",
                                              on_delete=ForeignKeyAction.cascade),))
    comments = TS(name="c", fields=(FS("pid", DataType.integer),
                                    FS("uid", DataType.integer, nullable=True)),
                  foreign_keys=(
                      ForeignKeySchema("pid", "p",
                                       on_delete=ForeignKeyAction.cascade),
                      ForeignKeySchema("uid", "u",
                                       on_delete=ForeignKeyAction.setNull),
                  ))
    db = ToStoreTPU.memory(schemas=[users, posts, comments])
    mu, mp, mc = {}, {}, {}  # pk -> record
    nid = {"u": 1, "p": 1, "c": 1}
    try:
        for _ in range(250):
            roll = rng.random()
            if roll < 0.3 or not mu:
                r = db.insert("u", {"n": int(rng.integers(0, 9))})
                assert r.is_success
                mu[nid["u"]] = True
                nid["u"] += 1
            elif roll < 0.5:
                uid = list(mu)[int(rng.integers(0, len(mu)))]
                r = db.insert("p", {"uid": uid})
                assert r.is_success
                mp[nid["p"]] = uid
                nid["p"] += 1
            elif roll < 0.7 and mp:
                pid = list(mp)[int(rng.integers(0, len(mp)))]
                uid = list(mu)[int(rng.integers(0, len(mu)))]
                r = db.insert("c", {"pid": pid, "uid": uid})
                assert r.is_success
                mc[nid["c"]] = {"pid": pid, "uid": uid}
                nid["c"] += 1
            elif roll < 0.85 and mu:
                uid = list(mu)[int(rng.integers(0, len(mu)))]
                db.delete_by_pk("u", uid)
                del mu[uid]
                dead_posts = [p for p, u2 in mp.items() if u2 == uid]
                for p in dead_posts:
                    del mp[p]
                    for cpk in [c for c, r2 in mc.items() if r2["pid"] == p]:
                        del mc[cpk]
                for r2 in mc.values():
                    if r2["uid"] == uid:
                        r2["uid"] = None
            elif mp:
                pid = list(mp)[int(rng.integers(0, len(mp)))]
                db.delete_by_pk("p", pid)
                del mp[pid]
                for cpk in [c for c, r2 in mc.items() if r2["pid"] == pid]:
                    del mc[cpk]
            # periodic full-state compare
            if rng.random() < 0.2:
                assert {r["id"] for r in db.query("u").limit(9999).fetch()} == set(mu)
                got_p = {r["id"]: r["uid"] for r in db.query("p").limit(9999).fetch()}
                assert got_p == mp
                got_c = {r["id"]: (r["pid"], r["uid"])
                         for r in db.query("c").limit(9999).fetch()}
                want_c = {c: (r2["pid"], r2["uid"]) for c, r2 in mc.items()}
                assert got_c == want_c
        assert db.check_integrity()["ok"]
    finally:
        db.close()


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_differential_navigation_and_reduction_under_writes(seed):
    """Cursor walks (forward AND backward), DISTINCT projections, and
    group_by aggregates checked against the naive model while random
    writes land between checks — guards the vectorized fast paths
    end-to-end in a mutating database."""
    rng = np.random.default_rng(seed)
    db = ToStoreTPU.memory(schemas=[schema()])
    model = NaiveModel()
    fields = ["a", "b", "s", "flag"]
    for _ in range(60):
        rec = {f: random_value(rng, f) for f in fields}
        db.insert("t", rec)
        model.insert(rec)
    for rnd in range(10):
        # a few writes
        for _ in range(4):
            roll = rng.random()
            if roll < 0.5 or not model.rows:
                rec = {f: random_value(rng, f) for f in fields}
                db.insert("t", rec)
                model.insert(rec)
            elif roll < 0.75:
                cond = random_condition(rng)
                ups = {"a": int(rng.integers(-20, 20))}
                db.update("t", ups).condition(cond).execute()
                model.update(cond, ups)
            else:
                cond = random_condition(rng)
                db.delete("t").condition(cond).execute()
                model.delete(cond)

        # forward cursor walk + immediate backward re-walk on a typed field
        page_sz = int(rng.integers(2, 6))
        res = db.query("t").order_by("a").limit(page_sz).no_cache().fetch()
        pages = [[r["id"] for r in res]]
        while res.next_cursor:
            res = res.next()
            if res.records:
                pages.append([r["id"] for r in res])
        walked = [pk for p in pages for pk in p]
        want = model.query(None)
        assert sorted(walked) == sorted(r["id"] for r in want), rnd
        a_of = {r["id"]: r.get("a") for r in want}
        keys = [(a_of[pk] is not None, a_of[pk] if a_of[pk] is not None else 0)
                for pk in walked]
        assert keys == sorted(keys), rnd  # nulls first, then ascending a
        back = []
        while res.prev_cursor:
            res = res.prev()
            if not res.records:
                break
            back.append([r["id"] for r in res])
        assert back == pages[-2::-1], rnd

        # distinct projection vs model
        got = {
            r["s"]
            for r in db.query("t").select("s").distinct().order_by("s")
            .limit(1000).no_cache().fetch()
        }
        assert got == {r.get("s") for r in want}, rnd

        # group_by aggregate vs model
        from tostore_tpu.models.aggregation import Agg
        from tostore_tpu.query.executor import QuerySpec

        spec = QuerySpec(
            group_by=["s"],
            aggregates=[Agg.count(alias="n"), Agg.sum("a", alias="sa")],
        )
        rows = db.engine.query("t", spec).records
        gm: dict = {}
        for r in want:
            g = gm.setdefault(r.get("s"), [0, 0, 0])
            g[0] += 1
            if r.get("a") is not None:
                g[1] += r["a"]
                g[2] += 1
        assert len(rows) == len(gm), rnd
        for row in rows:
            n, sa, na = gm[row["s"]]
            assert row["n"] == n, (rnd, row)
            assert row["sa"] == (sa if na else None), (rnd, row)
    db.close()
