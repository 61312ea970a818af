"""Cost-based planner: DNF index unions, in-expansion, exact-selectivity
cost compare, and the row-level limit-aware sort path (reference
query_optimizer.dart:11 DNF<=64, cost_estimator.dart, topk_heap.dart)."""

import numpy as np
import pytest

from tostore_tpu.api import ToStoreTPU
from tostore_tpu.models.schema import (
    DataType,
    FieldSchema,
    IndexSchema,
    TableSchema,
)
from tostore_tpu.query.condition import QueryCondition
from tostore_tpu.query.executor import QuerySpec


def schema():
    return TableSchema(
        name="t",
        fields=(
            FieldSchema("age", DataType.integer),
            FieldSchema("city", DataType.text),
            FieldSchema("score", DataType.double),
        ),
        indexes=(
            IndexSchema(fields=("age",), type="btree"),
            IndexSchema(fields=("city",), type="btree"),
        ),
    )


@pytest.fixture
def db():
    d = ToStoreTPU.memory(schemas=[schema()])
    rows = [
        {"age": i % 50, "city": f"c{i % 7}", "score": float(i % 13)}
        for i in range(300)
    ]
    d.batch_insert("t", rows)
    yield d
    d.close()


def plan_of(db, cond, order_by=None):
    spec = QuerySpec(condition=cond, order_by=order_by or [])
    return db.engine.executor.choose_plan(db.engine._table("t"), spec)


class TestDnf:
    def test_or_union_of_indexed_fields(self):
        c = QueryCondition().where("age", "=", 1)
        c.or_(QueryCondition().where("city", "=", "c2"))
        arms = c.dnf()
        assert arms == [[("age", "=", 1)], [("city", "=", "c2")]]

    def test_and_of_ors_cross_product(self):
        a = QueryCondition().or_(QueryCondition().where("x", "=", 1)).or_(
            QueryCondition().where("x", "=", 2)
        )
        b = QueryCondition().or_(QueryCondition().where("y", "=", 3)).or_(
            QueryCondition().where("y", "=", 4)
        )
        c = QueryCondition().and_(a).and_(b)
        assert len(c.dnf()) == 4

    def test_cap_returns_none(self):
        c = QueryCondition()
        for _ in range(8):  # 2^8 = 256 > 64
            o = QueryCondition().or_(QueryCondition().where("x", "=", 1)).or_(
                QueryCondition().where("x", "=", 2)
            )
            c.and_(o)
        assert c.dnf() is None


class TestPlanner:
    def test_or_condition_uses_index_union(self, db):
        c = QueryCondition().where("age", "=", 1)
        c.or_(QueryCondition().where("city", "=", "c2"))
        p = plan_of(db, c)
        assert p.plan == "indexUnion"
        got = db.query("t").condition(c).fetch()
        # oracle: full scan via per-record matcher
        allr = db.query("t").limit(1000).fetch().records
        oracle = [r for r in allr if c.matches(r)]
        assert len(got.records) == len(oracle)
        assert {r["id"] for r in got.records} == {r["id"] for r in oracle}

    def test_in_expands_to_arms(self, db):
        c = QueryCondition().where("age", "in", [1, 5, 9])
        p = plan_of(db, c)
        assert p.plan in ("indexScan", "indexUnion")
        assert p.estimated_rows == 18  # 6 rows per age value
        got = db.query("t").condition(c).limit(1000).fetch()
        assert len(got.records) == 18

    def test_wide_range_prefers_table_scan(self, db):
        c = QueryCondition().where("age", ">=", 0)  # matches everything
        p = plan_of(db, c)
        assert p.plan == "tableScan"

    def test_narrow_range_prefers_index(self, db):
        c = QueryCondition().where("age", "=", 3)
        p = plan_of(db, c)
        assert p.plan == "indexScan"
        assert p.estimated_rows == 6

    def test_unindexed_or_falls_back(self, db):
        c = QueryCondition().where("age", "=", 1)
        c.or_(QueryCondition().where("score", "=", 2.0))  # score unindexed
        p = plan_of(db, c)
        assert p.plan == "tableScan"
        allr = db.query("t").limit(1000).fetch().records
        oracle = [r for r in allr if c.matches(r)]
        got = db.query("t").condition(c).limit(1000).fetch()
        assert {r["id"] for r in got.records} == {r["id"] for r in oracle}

    def test_order_only_index_plan(self, db):
        p = plan_of(db, None, order_by=[("age", False)])
        assert p.plan == "indexOrder"


def composite_schema():
    return TableSchema(
        name="ev",
        fields=(
            FieldSchema("tenant", DataType.text),
            FieldSchema("kind", DataType.text),
            FieldSchema("ts", DataType.integer),
            FieldSchema("payload", DataType.text),
        ),
        indexes=(IndexSchema(fields=("tenant", "kind", "ts"), type="btree"),),
    )


@pytest.fixture
def cdb():
    d = ToStoreTPU.memory(schemas=[composite_schema()])
    rows = [
        {
            "tenant": f"t{i % 5}",
            "kind": f"k{i % 3}",
            "ts": i,
            "payload": f"p{i}",
        }
        for i in range(600)
    ]
    d.batch_insert("ev", rows)
    yield d
    d.close()


class TestCompositePrefix:
    def plan(self, db, cond, order_by=None):
        spec = QuerySpec(condition=cond, order_by=order_by or [])
        return db.engine.executor.choose_plan(db.engine._table("ev"), spec)

    def test_eq_prefix_plus_range_uses_composite(self, cdb):
        c = (
            QueryCondition()
            .where("tenant", "=", "t1")
            .where("kind", "=", "k2")
            .where("ts", ">=", 100)
            .where("ts", "<", 200)
        )
        info = self.plan(cdb, c)
        assert info.plan == "indexScan"
        # exact selectivity: t1 & k2 & ts in [100, 200) — far below the
        # 120 rows a tenant-only first-field plan would estimate
        true = len(
            [
                i
                for i in range(600)
                if i % 5 == 1 and i % 3 == 2 and 100 <= i < 200
            ]
        )
        assert info.estimated_rows == true
        res = (
            cdb.query("ev")
            .where("tenant", "=", "t1").where("kind", "=", "k2")
            .where("ts", ">=", 100).where("ts", "<", 200)
            .fetch()
        )
        assert len(res) == true

    def test_pure_eq_prefix(self, cdb):
        c = QueryCondition().where("tenant", "=", "t0").where("kind", "=", "k0")
        info = self.plan(cdb, c)
        assert info.plan == "indexScan"
        assert info.estimated_rows == len(
            [i for i in range(600) if i % 5 == 0 and i % 3 == 0]
        )

    def test_in_after_eq_prefix(self, cdb):
        c = (
            QueryCondition()
            .where("tenant", "=", "t1")
            .where("kind", "in", ["k0", "k1"])
        )
        info = self.plan(cdb, c)
        assert info.plan == "indexUnion"
        res = (
            cdb.query("ev")
            .where("tenant", "=", "t1").where_in("kind", ["k0", "k1"])
            .fetch()
        )
        assert all(r["tenant"] == "t1" and r["kind"] in ("k0", "k1") for r in res)
        assert len(res) == len(
            [i for i in range(600) if i % 5 == 1 and i % 3 in (0, 1)]
        )

    def test_ordered_slice_skips_sort_and_is_correct(self, cdb):
        c = QueryCondition().where("tenant", "=", "t2").where("kind", "=", "k1")
        info = self.plan(cdb, c, order_by=[("ts", False)])
        assert info.plan == "indexScan" and info.ordered
        res = (
            cdb.query("ev")
            .where("tenant", "=", "t2").where("kind", "=", "k1")
            .order_by("ts")
            .limit(5)
            .fetch()
        )
        expect = sorted(
            i for i in range(600) if i % 5 == 2 and i % 3 == 1
        )[:5]
        assert [r["ts"] for r in res] == expect

    def test_desc_order_not_marked_ordered(self, cdb):
        c = QueryCondition().where("tenant", "=", "t2")
        info = self.plan(cdb, c, order_by=[("ts", True)])
        assert not info.ordered
        res = (
            cdb.query("ev").where("tenant", "=", "t2")
            .order_by("ts", desc=True).limit(3).fetch()
        )
        expect = sorted((i for i in range(600) if i % 5 == 2), reverse=True)[:3]
        assert [r["ts"] for r in res] == expect


class TestJoinOrdering:
    def test_inner_reorder_keeps_semantics(self):
        users = TableSchema(
            name="users",
            fields=(
                FieldSchema("dept_id", DataType.integer),
                FieldSchema("badge_id", DataType.integer),
            ),
        )
        depts = TableSchema(
            name="depts", fields=(FieldSchema("dname", DataType.text),)
        )
        badges = TableSchema(
            name="badges", fields=(FieldSchema("bname", DataType.text),)
        )
        d = ToStoreTPU.memory(schemas=[users, depts, badges])
        try:
            d.batch_insert("depts", [{"id": i, "dname": f"d{i}"} for i in range(1, 40)])
            d.batch_insert("badges", [{"id": 1, "bname": "gold"}])
            d.batch_insert(
                "users",
                [{"id": i, "dept_id": (i % 39) + 1, "badge_id": 1 if i % 2 else 99}
                 for i in range(1, 21)],
            )
            res = (
                d.query("users")
                .join("depts", "dept_id", "id")      # big right table first
                .join("badges", "badge_id", "id")    # tiny selective second
                .fetch()
            )
            # inner-join semantics unchanged by selectivity reordering
            assert len(res) == 10
            assert all(r["bname"] == "gold" for r in res)
            assert all(r["dname"].startswith("d") for r in res)
        finally:
            d.close()


class TestLimitAwareSort:
    def test_limit_matches_full_sort(self, db):
        full = db.query("t").order_by("score").limit(1000).fetch().records
        page = db.query("t").order_by("score").limit(7).fetch().records
        assert page == full[:7]

    def test_desc_with_offset(self, db):
        full = db.query("t").order_by_desc("age").limit(1000).fetch().records
        page = db.query("t").order_by_desc("age").offset(5).limit(4).fetch().records
        assert page == full[5:9]

    def test_order_by_text_column(self, db):
        full = db.query("t").order_by("city").limit(1000).fetch().records
        page = db.query("t").order_by("city").limit(9).fetch().records
        assert page == full[:9]

    def test_nulls_first_asc_last_desc(self):
        d = ToStoreTPU.memory(schemas=[schema()])
        d.insert("t", {"age": None, "city": "x", "score": 0.0})
        d.insert("t", {"age": 5, "city": "y", "score": 0.0})
        d.insert("t", {"age": 1, "city": "z", "score": 0.0})
        asc = [r["age"] for r in d.query("t").order_by("age").fetch().records]
        desc = [r["age"] for r in d.query("t").order_by_desc("age").fetch().records]
        assert asc == [None, 1, 5]
        assert desc == [5, 1, None]
        d.close()

    def test_partial_sort_large(self):
        d = ToStoreTPU.memory(schemas=[schema()])
        rng = np.random.default_rng(7)
        vals = rng.integers(0, 10_000, size=20_000)
        d.batch_insert(
            "t",
            [{"age": int(v), "city": "c", "score": 0.0} for v in vals],
        )
        page = d.query("t").order_by("age").limit(5).fetch().records
        want = np.sort(vals)[:5].tolist()
        assert [r["age"] for r in page] == want
        # stable tiebreak: equal ages ordered by insertion (rowid)
        eq = d.query("t").where("age", "=", page[0]["age"]).fetch().records
        ids = [r["id"] for r in eq]
        assert ids == sorted(ids)
        d.close()


class TestLikePrefixAndNullArms:
    """LIKE 'abc%' and IS NULL compile to memcomparable bisect arms
    (reference searchIndex prefix scans, index_manager.dart:3299;
    VERDICT r2 Missing #5)."""

    def test_like_prefix_uses_index(self, db):
        cond = QueryCondition().where("city", "like", "c1%")
        info = plan_of(db, cond)
        assert info.plan == "indexScan" and "city" in info.index
        # exact selectivity: only c1 rows (300 rows, 7 cities)
        assert 0 < info.estimated_rows < 300
        rows = db.query("t").condition(cond).fetch()
        assert rows and all(r["city"].startswith("c1") for r in rows)
        # parity with a table scan
        spec = QuerySpec(condition=cond, use_cache=False)
        got = {r["id"] for r in rows}
        naive = {
            r["id"] for r in db.query("t").fetch()
            if r["city"].startswith("c1")
        }
        assert got == naive

    def test_like_mid_wildcard_tablescans(self, db):
        info = plan_of(db, QueryCondition().where("city", "like", "%1"))
        assert info.plan == "tableScan"

    def test_like_no_wildcard_exact_arm(self, db):
        cond = QueryCondition().where("city", "like", "c3")
        info = plan_of(db, cond)
        assert info.plan == "indexScan"
        rows = db.query("t").condition(cond).fetch()
        assert rows and all(r["city"] == "c3" for r in rows)

    def test_like_is_case_sensitive(self, db):
        # parity: reference matchesLike builds a case-sensitive RegExp
        rows = db.query("t").condition(
            QueryCondition().where("city", "like", "C1%")
        ).fetch()
        assert len(list(rows)) == 0

    def test_is_null_uses_index(self, db):
        db.batch_insert("t", [
            {"id": 1000 + i, "age": None, "city": "x", "score": 1.0}
            for i in range(5)
        ])
        cond = QueryCondition().where("age", "is", None)
        info = plan_of(db, cond)
        assert info.plan == "indexScan" and "age" in info.index
        assert info.estimated_rows == 5
        rows = db.query("t").condition(cond).fetch()
        assert len(rows) == 5 and all(r["age"] is None for r in rows)

    def test_composite_eq_then_like(self, cdb):
        # composite (tenant, kind, ts): eq on tenant + LIKE prefix on kind
        cond = (QueryCondition()
                .where("tenant", "=", "t2")
                .where("kind", "like", "k1%"))
        spec = QuerySpec(condition=cond)
        info = cdb.engine.executor.choose_plan(cdb.engine._table("ev"), spec)
        assert info.plan == "indexScan"
        assert info.estimated_rows == 40  # 600/5 tenants -> /3 kinds
        rows = cdb.query("ev").condition(cond).fetch()
        assert len(rows) == 40
        for r in rows:
            assert r["tenant"] == "t2" and r["kind"].startswith("k1")


class TestCacheCopySafety:
    def test_nested_mutable_in_tuple_does_not_alias_cache(self):
        # VERDICT r2 Weak #10: a list nested inside a tuple-valued JSON
        # cell aliased the cached record under the old list/dict-only copy
        from tostore_tpu.models.schema import DataType, FieldSchema, TableSchema

        schema = TableSchema(
            name="j", fields=(FieldSchema("payload", DataType.json),),
        )
        d = ToStoreTPU.memory(schemas=[schema])
        try:
            d.insert("j", {"payload": {"inner": [1, 2]}})
            r1 = d.query("j").fetch().records[0]
            r1["payload"]["inner"].append(99)  # caller mutates their copy
            r2 = d.query("j").fetch().records[0]  # cache hit
            assert r2["payload"]["inner"] == [1, 2]
        finally:
            d.close()


class TestStaleBoundFlags:
    def test_open_flag_not_inherited_across_leaves(self, db):
        # found by the differential fuzz: `age > -18 AND age between
        # (1, 13)` left lo_open=True from the first leaf on the closed
        # between bound, so the index arm excluded age == 1
        cond = (QueryCondition()
                .where("age", ">", -18)
                .where("age", "between", (1, 13)))
        rows = db.query("t").condition(cond).limit(1000).fetch().records
        allr = db.query("t").limit(1000).fetch().records
        want = {r["id"] for r in allr if 1 <= r["age"] <= 13}
        assert {r["id"] for r in rows} == want
        assert any(r["age"] == 1 for r in rows)

    def test_between_then_gt(self, db):
        cond = (QueryCondition()
                .where("age", "between", (5, 13))
                .where("age", ">", 1))
        rows = db.query("t").condition(cond).limit(1000).fetch().records
        allr = db.query("t").limit(1000).fetch().records
        want = {r["id"] for r in allr if 5 <= r["age"] <= 13}
        assert {r["id"] for r in rows} == want


class TestOrderTieBreak:
    """Equal-cost arms prefer the index that continues into the ascending
    order_by fields past the equality prefix: the chosen plan serves pages
    pre-sorted (plan.ordered) instead of paying a full result sort."""

    def _db(self):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("grp", DataType.integer),
                FieldSchema("ts", DataType.integer),
            ),
            indexes=(
                IndexSchema(fields=("grp",)),          # declared FIRST
                IndexSchema(fields=("grp", "ts")),     # order-serving arm
            ),
        )
        d = ToStoreTPU.memory(schemas=[schema])
        d.batch_insert(
            "t",
            [{"id": i, "grp": i % 10, "ts": (i * 37) % 1000}
             for i in range(400)],
        )
        return d

    def plan(self, db, cond, order_by=None, limit=None):
        spec = QuerySpec(condition=cond, order_by=order_by or [], limit=limit)
        return db.engine.executor.choose_plan(db.engine._table("t"), spec)

    def test_tie_prefers_order_serving_composite(self):
        db = self._db()
        try:
            c = QueryCondition().where("grp", "=", 3)
            # without order_by: first-declared single-field arm wins the tie
            assert self.plan(db, c).index == "idx_grp"
            info = self.plan(db, c, order_by=[("ts", False)])
            assert info.index == "idx_grp_ts" and info.ordered
            # all-DESC is served too (group-reversed slice) — but only
            # above the measured span-size crossover; below it the
            # partial top-k sort is cheaper
            info = self.plan(db, c, order_by=[("ts", True)])
            assert info.index == "idx_grp_ts" and not info.ordered_rev
            exe = db.engine.executor
            old = exe.DESC_SPAN_MIN_ROWS
            exe.DESC_SPAN_MIN_ROWS = 0
            try:
                info = self.plan(db, c, order_by=[("ts", True)])
                assert info.index == "idx_grp_ts" and info.ordered_rev
                assert not info.ordered
            finally:
                exe.DESC_SPAN_MIN_ROWS = old
            res = (
                db.query("t").where("grp", "=", 3).order_by("ts").limit(7)
                .fetch()
            )
            expect = sorted(
                (i * 37) % 1000 for i in range(400) if i % 10 == 3
            )[:7]
            assert [r["ts"] for r in res] == expect
        finally:
            db.close()

    @pytest.mark.parametrize("fast", [False, True])
    def test_desc_pages_match_full_sort(self, fast):
        db = self._db()
        exe = db.engine.executor
        old = exe.DESC_SPAN_MIN_ROWS
        if fast:
            exe.DESC_SPAN_MIN_ROWS = 0  # force the group-reversed span
        try:
            matches = sorted(
                ((i * 37) % 1000, i) for i in range(400) if i % 10 == 3
            )
            ts_desc = [ts for ts, _ in matches][::-1]
            got = []
            for start in range(0, len(matches) + 6, 6):
                page = (
                    db.query("t").where("grp", "=", 3)
                    .order_by("ts", desc=True).offset(start).limit(6)
                    .no_cache().fetch()
                )
                got.extend(r["ts"] for r in page.records)
                if not page.has_more:
                    break
            assert got == ts_desc
            # a fresh delta-log write lands at the right DESC position
            db.insert("t", {"id": 9000, "grp": 3, "ts": 998})
            first = (
                db.query("t").where("grp", "=", 3)
                .order_by("ts", desc=True).limit(2).no_cache().fetch()
            )
            assert [r["ts"] for r in first][0] == 998
        finally:
            exe.DESC_SPAN_MIN_ROWS = old
            db.close()

    def test_cheaper_arm_still_beats_order_serving(self):
        # cost dominates: a strictly smaller arm wins even if unordered
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("grp", DataType.integer),
                FieldSchema("ts", DataType.integer),
                FieldSchema("sel", DataType.integer),
            ),
            indexes=(
                IndexSchema(fields=("grp", "ts")),
                IndexSchema(fields=("sel",)),
            ),
        )
        db = ToStoreTPU.memory(schemas=[schema])
        try:
            db.batch_insert(
                "t",
                [{"id": i, "grp": i % 4, "ts": i, "sel": i}
                 for i in range(400)],
            )
            c = QueryCondition().where("grp", "=", 1).where("sel", "=", 5)
            info = self.plan(db, c, order_by=[("ts", False)])
            assert info.index == "idx_sel" and not info.ordered
            res = (
                db.query("t").where("grp", "=", 1).where("sel", "=", 5)
                .order_by("ts").fetch()
            )
            assert [r["id"] for r in res] == [5]
        finally:
            db.close()


class TestCursorFastPath:
    """Cursor pagination on the row-id fast path: a vectorized
    strictly-after filter + limit-aware partial sort replaces the
    materialize-everything record compare (which remains the fallback for
    object columns)."""

    def _db(self, n=500):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("a", DataType.integer),
                FieldSchema("s", DataType.text),
            ),
            indexes=(IndexSchema(fields=("a",)),),
        )
        d = ToStoreTPU.memory(schemas=[schema])
        rows = []
        for i in range(n):
            rows.append({
                "id": i,
                # heavy ties + nulls to stress the tie-break levels
                "a": None if i % 11 == 0 else (i * 7) % 13,
                "s": f"w{i % 5}",
            })
        d.batch_insert("t", rows)
        return d

    def _walk(self, db, field, desc, page=7):
        got = []
        res = (
            db.query("t").order_by(field, desc=desc).limit(page)
            .no_cache().fetch()
        )
        got.extend(r["id"] for r in res)
        while res.next_cursor:
            res = res.next()
            got.extend(r["id"] for r in res)
        return got

    @pytest.mark.parametrize("desc", [False, True])
    def test_cursor_walk_typed_column_matches_offset_oracle(self, desc):
        db = self._db()
        try:
            # oracle: offset paging over the same order (slow full sort)
            oracle = []
            start = 0
            while True:
                res = (
                    db.query("t").order_by("a", desc=desc)
                    .offset(start).limit(7).no_cache().fetch()
                )
                oracle.extend(r["id"] for r in res)
                if not res.has_more:
                    break
                start += 7
            got = self._walk(db, "a", desc)
            assert got == oracle
            assert sorted(got) == list(range(500))  # every row exactly once
        finally:
            db.close()

    @pytest.mark.parametrize("desc", [False, True])
    def test_cursor_walk_text_column_parity(self, desc):
        db = self._db(200)
        try:
            got = self._walk(db, "s", desc)  # text: U-dtype cursor mask
            assert sorted(got) == list(range(200))
            svals = [
                db.get_by_pk("t", pk)["s"] for pk in got
            ]
            assert svals == sorted(svals, reverse=desc)
        finally:
            db.close()

    def test_cursor_with_condition_and_writes_between_pages(self):
        db = self._db()
        try:
            res = (
                db.query("t").where("a", ">=", 5).order_by("a").limit(9)
                .no_cache().fetch()
            )
            seen = [r["id"] for r in res]
            first_new = 1000
            db.insert("t", {"id": first_new, "a": 12, "s": "zz"})
            while res.next_cursor:
                res = res.next()
                seen.extend(r["id"] for r in res)
            # no duplicates; the concurrent insert (a=12, sorts late)
            # surfaces in a later page
            assert len(seen) == len(set(seen))
            assert first_new in seen
            a_vals = [db.get_by_pk("t", pk)["a"] for pk in seen]
            assert a_vals == sorted(a_vals)
            assert all(v >= 5 for v in a_vals)
        finally:
            db.close()


class TestAggregateFastPath:
    """Vectorized aggregation (group codes + bincount/ufunc.at) must be
    value-identical to the record-path _aggregate, including null
    skipping, empty->None, int/bool result types, and group order."""

    def _db(self, n=400):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("g", DataType.integer),
                FieldSchema("city", DataType.text),
                FieldSchema("x", DataType.integer),
                FieldSchema("f", DataType.double),
                FieldSchema("flag", DataType.boolean),
            ),
        )
        d = ToStoreTPU.memory(schemas=[schema])
        rng = np.random.default_rng(5)
        rows = []
        for i in range(n):
            rows.append({
                "id": i,
                "g": None if i % 13 == 0 else int(rng.integers(0, 6)),
                "city": None if i % 17 == 0 else f"c{int(rng.integers(0, 4))}",
                "x": None if i % 7 == 0 else int(rng.integers(-50, 50)),
                "f": None if i % 5 == 0 else float(rng.standard_normal()),
                "flag": None if i % 19 == 0 else bool(rng.integers(0, 2)),
            })
        d.batch_insert("t", rows)
        return d

    def _agg_spec(self, db, group_by, cond=None, having=None,
                  order_by=None, limit=None, offset=0):
        from tostore_tpu.models.aggregation import Agg

        spec = QuerySpec(
            condition=cond,
            group_by=list(group_by),
            aggregates=[
                Agg.count(alias="n"),
                Agg.count("x", alias="nx"),
                Agg.sum("x", alias="sx"),
                Agg.avg("f", alias="af"),
                Agg.min("x", alias="mnx"),
                Agg.max("f", alias="mxf"),
                Agg.sum("flag", alias="sfl"),
                Agg.min("flag", alias="mnfl"),
            ],
            having=having,
            order_by=order_by or [],
            limit=limit,
            offset=offset,
        )
        return spec

    def _both(self, db, spec):
        exe = db.engine.executor
        fast = db.engine.query("t", spec)
        real = type(exe)._aggregate_rows
        type(exe)._aggregate_rows = lambda self, *a: None
        try:
            slow = db.engine.query("t", spec)
        finally:
            type(exe)._aggregate_rows = real
        return fast, slow

    @staticmethod
    def _assert_rows_equal(fast, slow, ctx=None):
        # float sums reduce in a different order (np.add.at vs sequential
        # python sum): equal to within ulps, everything else exact
        assert len(fast) == len(slow), ctx
        for fr, sr in zip(fast, slow):
            assert fr.keys() == sr.keys(), ctx
            for k in fr:
                fv, sv = fr[k], sr[k]
                if isinstance(fv, float) and isinstance(sv, float):
                    assert fv == pytest.approx(sv, rel=1e-9), (ctx, k)
                else:
                    assert fv == sv, (ctx, k, fv, sv)

    def test_differential_vs_record_path(self):
        db = self._db()
        try:
            rng = np.random.default_rng(9)
            for trial in range(12):
                gb = [
                    ["g"], ["city"], ["g", "city"], ["flag"], [],
                ][trial % 5]
                cond = (
                    QueryCondition().where("x", ">", int(rng.integers(-40, 20)))
                    if trial % 3 == 0 else None
                )
                fast, slow = self._both(db, self._agg_spec(db, gb, cond))
                self._assert_rows_equal(fast.records, slow.records, (trial, gb))
                assert fast.total == slow.total
        finally:
            db.close()

    def test_having_order_limit_parity(self):
        db = self._db()
        try:
            having = QueryCondition().where("n", ">", 10)
            spec = self._agg_spec(
                db, ["g"], having=having,
                order_by=[("sx", True)], limit=3, offset=1,
            )
            fast, slow = self._both(db, spec)
            self._assert_rows_equal(fast.records, slow.records)
            assert fast.total == slow.total
        finally:
            db.close()

    def test_result_types_match(self):
        db = self._db(60)
        try:
            fast, slow = self._both(db, self._agg_spec(db, ["g"]))
            for fr, sr in zip(fast.records, slow.records):
                for k in fr:
                    assert type(fr[k]) is type(sr[k]), (k, fr[k], sr[k])
        finally:
            db.close()

    def test_empty_match_set(self):
        db = self._db(30)
        try:
            cond = QueryCondition().where("x", ">", 10_000)
            fast, slow = self._both(db, self._agg_spec(db, ["g"], cond))
            assert fast.records == slow.records == []
        finally:
            db.close()


class TestDistinctFastPath:
    """Vectorized DISTINCT (sort -> factorize selected columns -> first
    occurrence) must match the record path's sort-then-keep-first dedup,
    projection included."""

    def _db(self, n=300):
        schema = TableSchema(
            name="t",
            fields=(
                FieldSchema("g", DataType.integer),
                FieldSchema("city", DataType.text),
                FieldSchema("x", DataType.integer),
            ),
            indexes=(IndexSchema(fields=("g",)),),
        )
        d = ToStoreTPU.memory(schemas=[schema])
        rng = np.random.default_rng(4)
        d.batch_insert("t", [
            {
                "id": i,
                "g": None if i % 11 == 0 else int(rng.integers(0, 5)),
                "city": None if i % 13 == 0 else f"c{int(rng.integers(0, 4))}",
                "x": int(rng.integers(0, 1000)),
            }
            for i in range(n)
        ])
        return d

    def _both(self, db, build):
        exe = db.engine.executor
        fast = build().fetch()
        real = type(exe)._distinct_rows
        type(exe)._distinct_rows = lambda self, *a, **k: None
        try:
            slow = build().fetch()
        finally:
            type(exe)._distinct_rows = real
        return fast, slow

    def test_distinct_select_matches_record_path(self):
        db = self._db()
        try:
            for sel, order in (
                (["g"], [("g", False)]),
                (["city"], [("city", True)]),
                (["g", "city"], [("g", False), ("city", False)]),
                (["g"], None),  # default pk order
            ):
                def build():
                    q = db.query("t").select(*sel).distinct().no_cache()
                    for f, d in order or []:
                        q = q.order_by(f, desc=d)
                    return q
                fast, slow = self._both(db, build)
                assert fast.records == slow.records, (sel, order)
                assert fast.total == slow.total
        finally:
            db.close()

    def test_distinct_pagination_parity(self):
        db = self._db()
        try:
            def build():
                return (
                    db.query("t").select("g", "city").distinct()
                    .order_by("g").order_by("city")
                    .offset(3).limit(4).no_cache()
                )
            fast, slow = self._both(db, build)
            assert fast.records == slow.records
            assert fast.total == slow.total
            assert fast.has_more == slow.has_more
        finally:
            db.close()

    def test_distinct_with_condition(self):
        db = self._db()
        try:
            def build():
                return (
                    db.query("t").where("x", "<", 500)
                    .select("city").distinct().order_by("city").no_cache()
                )
            fast, slow = self._both(db, build)
            assert fast.records == slow.records
        finally:
            db.close()


class TestBackwardCursor:
    """QueryResult.prev() pages strictly BEFORE the cursor (reference
    query_result.dart prev()); before the fix the backward flag was
    dropped and prev() returned a forward page shifted by one row."""

    def _db(self, n=30):
        s = TableSchema(
            name="t",
            fields=(
                FieldSchema("v", DataType.integer),
                FieldSchema("s", DataType.text),
            ),
        )
        d = ToStoreTPU.memory(schemas=[s])
        d.batch_insert(
            "t", [{"id": i, "v": i % 7, "s": f"w{i:03d}"} for i in range(n)]
        )
        return d

    @pytest.mark.parametrize("field", ["v", "s"])  # fast path + fallback
    @pytest.mark.parametrize("desc", [False, True])
    def test_prev_inverts_next(self, field, desc):
        db = self._db()
        try:
            p1 = db.query("t").order_by(field, desc=desc).limit(5).no_cache().fetch()
            p2 = p1.next()
            p3 = p2.next()
            b2 = p3.prev()
            b1 = b2.prev()
            assert [r["id"] for r in b2] == [r["id"] for r in p2]
            assert [r["id"] for r in b1] == [r["id"] for r in p1]
            assert b1.prev().records == []  # at the beginning
        finally:
            db.close()

    def test_prev_partial_leading_page(self):
        db = self._db()
        try:
            px = db.query("t").order_by("v").offset(3).limit(5).no_cache().fetch()
            pb = px.prev()  # only 3 records exist before the page
            lead = db.query("t").order_by("v").limit(3).no_cache().fetch()
            assert [r["id"] for r in pb] == [r["id"] for r in lead]
            assert pb.has_more
        finally:
            db.close()

    def test_prev_after_writes_between_pages(self):
        db = self._db()
        try:
            p1 = db.query("t").order_by("v").limit(5).no_cache().fetch()
            p2 = p1.next()
            db.insert("t", {"id": 900, "v": 0, "s": "zz"})  # sorts early
            back = p2.prev()
            # the fresh row belongs before the cursor: it surfaces in the
            # backward page, everything stays strictly before page 2
            ids = [r["id"] for r in back]
            assert 900 in ids
            assert len(ids) == 5
        finally:
            db.close()


class TestBackwardCursorNullsTies:
    @pytest.mark.parametrize("desc", [False, True])
    def test_backward_walk_matches_offset_oracle(self, desc):
        s = TableSchema(
            name="t",
            fields=(FieldSchema("a", DataType.integer),),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [
                {"id": i, "a": None if i % 9 == 0 else i % 4}
                for i in range(60)
            ])
            # walk forward to the end, then all the way back
            pages = []
            res = db.query("t").order_by("a", desc=desc).limit(7).no_cache().fetch()
            pages.append([r["id"] for r in res])
            while res.next_cursor:
                res = res.next()
                if res.records:
                    pages.append([r["id"] for r in res])
            back = []
            while res.prev_cursor:
                res = res.prev()
                if not res.records:
                    break
                back.append([r["id"] for r in res])
            # backward pages mirror the forward pages (excluding the last)
            assert back == pages[-2::-1], (desc, pages, back)
        finally:
            db.close()


class TestCursorTieTotalOrder:
    def test_walk_complete_after_rowid_reuse(self):
        """Rowid reuse breaks arrival-order == pk-order within equal-key
        ties; the cursor total order is (key, pk), so every path must
        emit ties pk-ASC or walks skip rows (found by the navigation
        differential fuzz, seed 33)."""
        s = TableSchema(
            name="t",
            fields=(FieldSchema("a", DataType.integer),),
            indexes=(IndexSchema(fields=("a",)),),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            # 60 filler rows (a=0) keep the a>=1 arm selective enough for
            # the ORDERED index-span fast path; 40 tied rows are the walk
            db.batch_insert(
                "t",
                [{"id": i, "a": 0} for i in range(60)]
                + [{"id": 100 + i, "a": 1} for i in range(40)],
            )
            # build the index, then free rowids and reinsert HIGH pks
            # into them — arrival order now diverges from pk order
            db.query("t").where("a", ">=", 1).no_cache().fetch()
            for pk in range(100, 120, 2):
                db.delete_by_pk("t", pk)
            db.batch_insert("t", [{"id": 200 + i, "a": 1} for i in range(10)])
            expected = sorted(
                r["id"]
                for r in db.query("t").where("a", ">=", 1).limit(1000)
                .no_cache().fetch()
            )
            plan = db.engine.executor.choose_plan(
                db.engine._table("t"),
                QuerySpec(
                    condition=QueryCondition().where("a", ">=", 1),
                    order_by=[("a", False)],
                ),
            )
            assert plan.ordered  # the raw-span fast path is under test
            for source in ("indexed", "scan"):
                q = db.query("t").order_by("a")
                if source == "indexed":
                    q = q.where("a", ">=", 1)
                walked = []
                res = q.limit(3).no_cache().fetch()
                walked.extend(r["id"] for r in res)
                while res.next_cursor:
                    res = res.next()
                    walked.extend(r["id"] for r in res)
                if source == "indexed":
                    assert sorted(walked) == expected, source
                    assert walked == sorted(walked), source  # pk-ASC ties
                else:
                    assert len(walked) == len(set(walked)) == 110 - 10
        finally:
            db.close()


class TestChainExplain:
    def test_builder_explain_reflects_chain(self):
        s = TableSchema(
            name="t",
            fields=(FieldSchema("a", DataType.integer),
                    FieldSchema("b", DataType.integer)),
            indexes=(IndexSchema(fields=("a", "b")),),
        )
        db = ToStoreTPU.memory(schemas=[s])
        try:
            db.batch_insert("t", [{"id": i, "a": i % 50, "b": i} for i in range(1000)])
            ex = db.query("t").where("a", "=", 3).order_by("b").explain()
            assert ex == {
                "plan": "indexScan", "index": "idx_a_b",
                "estimated_rows": 20, "ordered": True,
            }
            assert db.query("t").explain()["plan"] == "tableScan"
        finally:
            db.close()


class TestJoinFastPath:
    """Vectorized single-join row-id path must be record-identical to the
    record-path merge (tie order of multi-matches included)."""

    def _db(self):
        left = TableSchema(
            name="l",
            fields=(
                FieldSchema("k", DataType.integer),
                FieldSchema("ks", DataType.text),
                FieldSchema("v", DataType.integer),
            ),
        )
        right = TableSchema(
            name="r",
            fields=(
                FieldSchema("k", DataType.integer),
                FieldSchema("tag", DataType.text),
            ),
        )
        db = ToStoreTPU.memory(schemas=[left, right])
        rng = np.random.default_rng(6)
        db.batch_insert("l", [
            {
                "id": i,
                "k": None if i % 11 == 0 else int(rng.integers(0, 12)),
                "ks": None if i % 9 == 0 else f"s{int(rng.integers(0, 8))}",
                "v": int(rng.integers(0, 100)),
            }
            for i in range(120)
        ])
        db.batch_insert("r", [
            {
                "id": i,
                "k": None if i % 7 == 0 else int(rng.integers(0, 12)),
                "tag": f"t{i}",
            }
            for i in range(40)
        ])
        return db

    def _both(self, db, build):
        exe = db.engine.executor
        fast = build().fetch()
        real = type(exe)._join_rows
        type(exe)._join_rows = lambda self, *a, **kw: None
        try:
            slow = build().fetch()
        finally:
            type(exe)._join_rows = real
        return fast, slow

    @pytest.mark.parametrize("kind", ["inner", "left"])
    def test_join_parity_with_order_and_paging(self, kind):
        db = self._db()
        try:
            def build():
                q = db.query("l")
                q = (
                    q.join("r", "k", "k") if kind == "inner"
                    else q.left_join("r", "k", "k")
                )
                return (
                    q.where("v", "<", 80).order_by("v").offset(5).limit(25)
                    .no_cache()
                )
            fast, slow = self._both(db, build)
            assert fast.records == slow.records
            assert fast.total == slow.total
            assert fast.has_more == slow.has_more
        finally:
            db.close()

    def test_join_on_pk_and_default_order(self, db=None):
        db = self._db()
        try:
            def build():
                return db.query("r").join("l", "id", "id").no_cache()
            fast, slow = self._both(db, build)
            assert fast.records == slow.records
        finally:
            db.close()

    def test_order_on_joined_field_served_fast(self):
        db = self._db()
        try:
            def build():
                return (
                    db.query("l").join("r", "k", "k")
                    .order_by("tag").limit(10).no_cache()
                )
            # tag lives on the RIGHT table: pair-resolved lexsort keys
            # serve it on the fast path (r4 — previously a record-path
            # fallback), record-identical
            exe = db.engine.executor
            calls = []
            real = type(exe)._join_rows
            def spy(self, *a, **kw):
                out = real(self, *a, **kw)
                calls.append(out is None)
                return out
            type(exe)._join_rows = spy
            try:
                res = build().fetch()
            finally:
                type(exe)._join_rows = real
            assert calls == [False]
            tags = [r["tag"] for r in res.records]
            assert tags == sorted(tags)
            type(exe)._join_rows = lambda self, *a, **kw: None
            try:
                slow = build().fetch()
            finally:
                type(exe)._join_rows = real
            assert res.records == slow.records
        finally:
            db.close()


class TestKeysetCursor:
    """Keyset cursor pages bisect the order-serving index (reference
    index_manager.dart:3299) — verified byte-identical to the masked
    (vectorized strictly-after) path on the same data."""

    def _db(self):
        import numpy as np

        from tostore_tpu import (
            DataType, FieldSchema, IndexSchema, TableSchema, ToStoreTPU,
        )

        s = TableSchema(
            name="t",
            fields=(FieldSchema("grp", DataType.integer),
                    FieldSchema("ts", DataType.integer)),
            indexes=(IndexSchema(fields=("ts",)),
                     IndexSchema(fields=("grp", "ts"))),
        )
        db = ToStoreTPU.memory(schemas=[s])
        rng = np.random.default_rng(7)
        # small ts range forces heavy ties (the pk-ASC tie-break matters)
        db.batch_insert("t", [
            {"id": int(i), "grp": int(rng.integers(0, 5)),
             "ts": int(rng.integers(0, 40))}
            for i in range(2000)
        ])
        return db

    def _walk(self, q, pages=6):
        res = q.fetch()
        out = [[r["id"] for r in res.records]]
        while res.next_cursor and len(out) < pages:
            res = res.next()
            out.append([r["id"] for r in res.records])
        return out, res

    def test_keyset_matches_masked_path(self):
        db = self._db()
        try:
            exe = db.engine.executor
            for desc in (False, True):
                def build():
                    return (db.query("t").order_by("ts", desc=desc)
                            .limit(37).no_cache())

                fast, res = self._walk(build())
                # disable the bisect: force the masked path
                real = type(exe)._keyset_bisect
                type(exe)._keyset_bisect = lambda self, *a, **kw: None
                try:
                    slow, _ = self._walk(build())
                finally:
                    type(exe)._keyset_bisect = real
                assert fast == slow, desc
                # prev() inverts next() on the keyset path
                back = res.prev()
                assert [r["id"] for r in back.records] == fast[-2]
        finally:
            db.close()

    def test_keyset_on_eq_prefix_arm(self):
        db = self._db()
        try:
            exe = db.engine.executor

            def build():
                return (db.query("t").where("grp", "=", 3)
                        .order_by("ts").limit(19).no_cache())

            fast, res = self._walk(build())
            real = type(exe)._keyset_bisect
            calls = []

            def spy(self, *a, **kw):
                out = real(self, *a, **kw)
                calls.append(out)
                return out

            type(exe)._keyset_bisect = spy
            try:
                build().fetch()
                r2 = build().fetch().next()
            finally:
                type(exe)._keyset_bisect = real
            assert calls and all(c is not None for c in calls)
            assert [r["id"] for r in r2.records] == fast[1]
            type(exe)._keyset_bisect = lambda self, *a, **kw: None
            try:
                slow, _ = self._walk(build())
            finally:
                type(exe)._keyset_bisect = real
            assert fast == slow
        finally:
            db.close()
