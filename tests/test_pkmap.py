"""PkMap: dense int-keyed pk->rowid map must match dict semantics.

The dense window (rowid+1 in an int64 array) replaces the Python dict that
was the biggest share of the r4 scale soak's 9x RAM blowup; these tests
differential-check it against a plain dict through mixed workloads.
"""

import numpy as np
import pytest

from tostore_tpu.engine.columnstore import PkMap


def test_dense_build_and_lookup():
    pks = np.arange(1, 1001, dtype=np.int64)
    m = PkMap.build_from_arrays(pks, np.arange(1000, dtype=np.int64))
    assert m._arr is not None  # dense activated
    assert len(m) == 1000
    assert m.get(1) == 0 and m.get(1000) == 999
    assert m.get(1001) is None and m.get(0) is None
    assert 500 in m and 2000 not in m
    assert m[500] == 499
    with pytest.raises(KeyError):
        m[5000]


def test_sparse_build_falls_back_to_dict():
    pks = np.array([1, 10_000_000, 99], np.int64)
    m = PkMap.build_from_arrays(pks, np.arange(3, dtype=np.int64))
    assert m._arr is None
    assert m.get(10_000_000) == 1 and len(m) == 3


def test_string_keys_use_dict():
    m = PkMap()
    m["a"] = 0
    m["b"] = 1
    assert m.get("a") == 0 and "b" in m and len(m) == 2
    assert m.pop("a") == 0 and m.get("a") is None


def test_pop_and_reinsert():
    m = PkMap.build_from_arrays(
        np.arange(10, dtype=np.int64), np.arange(10, dtype=np.int64)
    )
    assert m.pop(3) == 3
    assert len(m) == 9 and 3 not in m
    assert m.pop(3, "x") == "x"
    m[3] = 42
    assert m[3] == 42 and len(m) == 10


def test_growth_and_overflow():
    m = PkMap.build_from_arrays(
        np.arange(100, dtype=np.int64), np.arange(100, dtype=np.int64)
    )
    m[100] = 100  # append just past the window -> grows
    assert m[100] == 100
    far = 100 + (1 << 21)
    m[far] = 7  # beyond the grow window -> overflow dict
    assert m[far] == 7 and m.get(far) == 7
    assert len(m) == 102
    assert m.pop(far) == 7
    # below base -> dict
    m[-5] = 9
    assert m[-5] == 9


def test_window_growing_over_overflow_key():
    # a key that overflowed into the dict while out-of-window must stay
    # visible (and poppable) after sequential appends grow the window past it
    m = PkMap.build_from_arrays(
        np.arange(100, dtype=np.int64), np.arange(100, dtype=np.int64)
    )
    far = 100 + (1 << 21)
    m[far] = 7
    assert m._dict.get(far) == 7
    pk = 100
    while len(m._arr) <= far - m._base:
        m[pk] = pk
        pk += 1 << 19
    assert m.get(far) == 7 and far in m
    before = len(m)
    m[far] = 8  # migrates from dict into the dense window
    assert len(m) == before and m[far] == 8 and far not in m._dict
    assert m.pop(far) == 8 and far not in m


def test_bulk_set_activation_and_extend():
    m = PkMap()
    m.bulk_set(list(range(1, 501)), np.arange(500, dtype=np.int64))
    assert m._arr is not None and len(m) == 500
    m.bulk_set(list(range(501, 1001)), np.arange(500, 1000, dtype=np.int64))
    assert len(m) == 1000 and m[1000] == 999
    # overwriting existing keys must not double-count
    m.bulk_set([1, 2], np.array([5, 6], np.int64))
    assert len(m) == 1000 and m[1] == 5


def test_keys_items_cover_both_stores():
    m = PkMap.build_from_arrays(
        np.arange(5, dtype=np.int64), np.arange(5, dtype=np.int64)
    )
    m["s"] = 77
    ks = m.keys()
    assert set(ks) == {0, 1, 2, 3, 4, "s"}
    assert dict(m.items())["s"] == 77
    assert sorted(v for k, v in m.items() if k != "s") == [0, 1, 2, 3, 4]
    assert set(m) == set(ks)


def test_numpy_int_keys_hit_dense_path():
    m = PkMap.build_from_arrays(
        np.arange(10, dtype=np.int64), np.arange(10, dtype=np.int64)
    )
    assert m.get(np.int64(4)) == 4
    m[np.int64(5)] = 50
    assert m[5] == 50
    assert m.pop(np.int32(6)) == 6


def test_differential_fuzz_vs_dict():
    rng = np.random.default_rng(0)
    m, d = PkMap(), {}
    m.bulk_set(list(range(50)), np.arange(50, dtype=np.int64))
    d.update({i: i for i in range(50)})
    for step in range(3000):
        op = rng.integers(0, 4)
        pk = int(rng.integers(-10, 300))
        if op == 0:
            row = int(rng.integers(0, 10_000))
            m[pk] = row
            d[pk] = row
        elif op == 1:
            assert m.pop(pk, None) == d.pop(pk, None)
        elif op == 2:
            assert m.get(pk) == d.get(pk)
            assert (pk in m) == (pk in d)
        else:
            assert len(m) == len(d)
    assert sorted(m.keys()) == sorted(d.keys())
    assert dict(m.items()) == d
