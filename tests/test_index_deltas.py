"""Incremental SortedIndex deltas (reference B+Trees update per write;
index_tree_partition_manager.dart): a single write must not force the
next indexed query to rebuild the whole sorted array. Table mutators
feed every index an ordered (key, rowid, is_add) log; reads serve
base + replayed deltas with EXACT span counts until the log overflows
(~2% of base), and any untracked store mutation breaks the log and falls
back to a full rebuild — never to wrong results."""

import numpy as np
import pytest

from tostore_tpu import ToStoreTPU
from tostore_tpu.engine.table import SortedIndex
from tostore_tpu.models.schema import (
    DataType,
    FieldSchema,
    IndexSchema,
    TableSchema,
)


def _schema():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("a", DataType.integer),
            FieldSchema("b", DataType.integer),
            FieldSchema("s", DataType.text),
        ),
        indexes=(
            IndexSchema(fields=("a",)),
            IndexSchema(fields=("a", "b")),
            IndexSchema(fields=("s",)),
        ),
    )


@pytest.fixture
def db():
    store = ToStoreTPU.memory(schemas=[_schema()])
    store.batch_insert(
        "t",
        [
            {"id": i, "a": i % 20, "b": i % 7, "s": f"w{i % 13:02d}"}
            for i in range(1, 401)
        ],
    )
    yield store
    store.close()


def _count_builds(monkeypatch):
    calls = []
    real = SortedIndex._build

    def spy(self, s):
        calls.append(self.fields)
        return real(self, s)

    monkeypatch.setattr(SortedIndex, "_build", spy)
    return calls


def _expect(db, **cond):
    """Oracle via full column scan (no index path)."""
    t = db.engine._table("t")
    out = []
    for pk in t.store.pks():
        r = t.store.get(pk)
        if all(r.get(k) == v for k, v in cond.items()):
            out.append(pk)
    return sorted(out)


class TestIndexDeltas:
    def test_single_write_does_not_rebuild(self, db, monkeypatch):
        # warm the index
        db.query("t").where("a", "=", 3).no_cache().fetch()
        builds = _count_builds(monkeypatch)
        db.insert("t", {"id": 900, "a": 3, "b": 1, "s": "zz"})
        rows = db.query("t").where("a", "=", 3).no_cache().fetch()
        assert not builds, f"full rebuild after one insert: {builds}"
        assert sorted(r["id"] for r in rows) == _expect(db, a=3)

    def test_insert_update_delete_visibility(self, db):
        db.query("t").where("a", "=", 5).no_cache().fetch()  # warm
        db.insert("t", {"id": 901, "a": 5, "b": 0, "s": "x"})
        db.update("t", {"a": 5}).where("id", "=", 1).execute()  # 1: a 1->5
        db.delete_by_pk("t", 5)  # had a=5
        got = sorted(
            r["id"] for r in db.query("t").where("a", "=", 5).no_cache().fetch()
        )
        assert got == _expect(db, a=5)
        assert 901 in got and 1 in got and 5 not in got

    def test_rowid_reuse_delete_then_insert(self, db):
        db.query("t").where("a", "=", 7).no_cache().fetch()  # warm
        db.delete_by_pk("t", 7)  # frees a rowid
        db.insert("t", {"id": 902, "a": 7, "b": 2, "s": "y"})  # reuses it
        got = sorted(
            r["id"] for r in db.query("t").where("a", "=", 7).no_cache().fetch()
        )
        assert got == _expect(db, a=7)
        assert 902 in got and 7 not in got

    def test_exact_span_counts_with_deltas(self, db):
        t = db.engine._table("t")
        sidx = t.sorted_indexes[("a",)] if ("a",) in t.sorted_indexes else None
        # resolve by fields tuple regardless of key format
        sidx = next(
            x for x in t.sorted_indexes.values() if x.fields == ("a",)
        )
        db.query("t").where("a", "=", 9).no_cache().fetch()  # warm
        before = sidx.span_count(
            t.store, sidx.range_span(t.store, 9, 9)
        )
        db.insert("t", {"id": 903, "a": 9, "b": 0, "s": "q"})
        db.delete_by_pk("t", 9)
        after = sidx.span_count(t.store, sidx.range_span(t.store, 9, 9))
        assert after == before  # +1 insert, -1 delete: EXACT
        assert after == len(_expect(db, a=9))

    def test_ordered_slice_with_deltas(self, db):
        db.query("t").where("a", "=", 2).order_by("b").no_cache().fetch()
        db.insert("t", {"id": 904, "a": 2, "b": -5, "s": "m"})  # sorts first
        db.insert("t", {"id": 905, "a": 2, "b": 99, "s": "m"})  # sorts last
        rows = (
            db.query("t").where("a", "=", 2).order_by("b").no_cache().fetch()
        )
        bs = [r["b"] for r in rows]
        assert bs == sorted(bs)
        assert rows[0]["id"] == 904 and rows[-1]["id"] == 905

    def test_log_overflow_falls_back_to_rebuild(self, db, monkeypatch):
        db.query("t").where("a", "=", 1).no_cache().fetch()  # warm
        monkeypatch.setattr(SortedIndex, "LOG_MIN", 8)
        for i in range(30):  # far beyond the shrunken budget
            db.insert("t", {"id": 1000 + i, "a": 1, "b": i, "s": "o"})
        got = sorted(
            r["id"] for r in db.query("t").where("a", "=", 1).no_cache().fetch()
        )
        assert got == _expect(db, a=1)

    def test_untracked_mutation_forces_rebuild_not_corruption(self, db):
        t = db.engine._table("t")
        db.query("t").where("a", "=", 4).no_cache().fetch()  # warm
        db.insert("t", {"id": 910, "a": 4, "b": 0, "s": "u"})  # tracked
        # untracked: bump the generation behind the indexes' backs
        t.store.generation += 1
        db.insert("t", {"id": 911, "a": 4, "b": 0, "s": "u"})  # gap seen
        got = sorted(
            r["id"] for r in db.query("t").where("a", "=", 4).no_cache().fetch()
        )
        assert got == _expect(db, a=4)
        assert 910 in got and 911 in got

    def test_text_and_like_prefix_arms_with_deltas(self, db):
        db.query("t").where("s", "=", "w05").no_cache().fetch()  # warm
        db.insert("t", {"id": 920, "a": 0, "b": 0, "s": "w05"})
        db.insert("t", {"id": 921, "a": 0, "b": 0, "s": "w9x"})
        got = sorted(
            r["id"]
            for r in db.query("t").where("s", "=", "w05").no_cache().fetch()
        )
        assert got == _expect(db, s="w05") and 920 in got
        like = sorted(
            r["id"]
            for r in db.query("t").where("s", "like", "w9%").no_cache().fetch()
        )
        assert 921 in like

    def test_batch_update_deltas(self, db):
        db.query("t").where("a", "=", 11).no_cache().fetch()  # warm
        # small columnar batch update moving rows into a=11
        db.batch_update(
            "t", [{"id": i, "a": 11} for i in (2, 3, 40)]
        )
        got = sorted(
            r["id"] for r in db.query("t").where("a", "=", 11).no_cache().fetch()
        )
        assert got == _expect(db, a=11)
        assert {2, 3, 40} <= set(got)

    def test_differential_fuzz_vs_scan_oracle(self, db):
        rng = np.random.default_rng(7)
        next_id = 5000
        for step in range(300):
            op = rng.integers(0, 4)
            if op == 0:
                db.insert(
                    "t",
                    {
                        "id": next_id,
                        "a": int(rng.integers(0, 20)),
                        "b": int(rng.integers(0, 7)),
                        "s": f"w{int(rng.integers(0, 13)):02d}",
                    },
                )
                next_id += 1
            elif op == 1:
                pks = db.engine._table("t").store.pks()
                if pks:
                    pk = pks[int(rng.integers(0, len(pks)))]
                    db.update(
                        "t", {"a": int(rng.integers(0, 20))}
                    ).where("id", "=", pk).execute()
            elif op == 2:
                pks = db.engine._table("t").store.pks()
                if pks:
                    db.delete_by_pk("t", pks[int(rng.integers(0, len(pks)))])
            else:
                a = int(rng.integers(0, 20))
                got = sorted(
                    r["id"]
                    for r in db.query("t")
                    .where("a", "=", a)
                    .no_cache()
                    .fetch()
                )
                assert got == _expect(db, a=a), f"step {step} a={a}"
        # closing full comparison on a composite arm
        got = sorted(
            r["id"]
            for r in db.query("t")
            .where("a", "=", 3)
            .where("b", "=", 2)
            .no_cache()
            .fetch()
        )
        assert got == _expect(db, a=3, b=2)

    def test_ordered_paging_differential_fuzz(self, db):
        """Ordered-slice fast path across pending deltas: pages of an
        order_by query must concatenate to the exact oracle match set in
        non-decreasing key order, at every offset, as random writes land
        in the delta log between rounds."""
        rng = np.random.default_rng(11)
        next_id = 9000
        # force the group-reversed desc span at any size so the fuzz
        # exercises the fast path (the sort path has its own differential)
        db.engine.executor.DESC_SPAN_MIN_ROWS = 0
        for rnd in range(12):
            # a couple of writes per round -> fresh delta-log entries
            for _ in range(3):
                op = rng.integers(0, 3)
                if op == 0:
                    db.insert("t", {
                        "id": next_id,
                        "a": int(rng.integers(0, 20)),
                        "b": int(rng.integers(-3, 10)),
                        "s": "pg",
                    })
                    next_id += 1
                elif op == 1:
                    pks = db.engine._table("t").store.pks()
                    pk = pks[int(rng.integers(0, len(pks)))]
                    db.update(
                        "t", {"b": int(rng.integers(-3, 10))}
                    ).where("id", "=", pk).execute()
                else:
                    pks = db.engine._table("t").store.pks()
                    db.delete_by_pk(
                        "t", pks[int(rng.integers(0, len(pks)))]
                    )
            t = db.engine._table("t")
            # range + order_by on the SAME index field: the planner's
            # ordered-slice fast path (plan.ordered) pages span_rows raw,
            # so delta adds must merge at their key position
            lo = int(rng.integers(12, 18))
            desc = bool(rng.integers(0, 2))
            match = {
                pk: t.store.get(pk)["a"]
                for pk in t.store.pks()
                if t.store.get(pk)["a"] > lo
            }
            page_sz = int(rng.integers(2, 6))
            seen, avs = [], []
            for start in range(0, len(match) + page_sz, page_sz):
                page = (
                    db.query("t").where("a", ">", lo).order_by("a", desc=desc)
                    .offset(start).limit(page_sz).no_cache().fetch()
                )
                seen.extend(r["id"] for r in page.records)
                avs.extend(r["a"] for r in page.records)
                if not page.has_more:
                    break
            tag = f"round {rnd} lo={lo} desc={desc}"
            assert sorted(seen) == sorted(match), tag
            assert avs == sorted(match.values(), reverse=desc), tag
            # eq + order_by on the composite (a,b) trailing field: today
            # the tie-broken plan sorts (ordered=False) — this guards the
            # result set if the planner ever prefers the composite arm
            a = int(rng.integers(0, 20))
            rows = (
                db.query("t").where("a", "=", a).order_by("b")
                .no_cache().fetch().records
            )
            bs = [r["b"] for r in rows]
            assert bs == sorted(bs)
            assert sorted(r["id"] for r in rows) == _expect(db, a=a)
