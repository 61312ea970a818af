"""Native accelerator equivalence tests: the C++ module must be
byte-for-byte compatible with the pure-Python codec + memcomparable
implementations (both build the same on-disk artifacts)."""

import numpy as np
import pytest

from tostore_tpu.native import get as get_native
from tostore_tpu.utils import codec
from tostore_tpu.utils import memcomparable as mc

native = get_native()
pytestmark = pytest.mark.skipif(native is None, reason="no C++ toolchain")

SAMPLES = [
    None,
    True,
    False,
    0,
    -1,
    2**53,
    -(2**60),
    3.25,
    -0.0,
    float("inf"),
    "héllo wörld",
    "",
    b"\x00\x01\xff",
    [1, "two", None, [3.5, b"x"]],
    {"k": 1, "nested": {"a": [True, None]}, "s": "v"},
]


class TestCodecEquivalence:
    @pytest.mark.parametrize("v", SAMPLES, ids=range(len(SAMPLES)))
    def test_dumps_identical(self, v):
        assert native.dumps(v) == codec._py_dumps(v)

    def test_f32_array(self):
        v = {"emb": np.arange(64, dtype=np.float32)}
        assert native.dumps(v) == codec._py_dumps(v)
        out_n = native.loads(codec._py_dumps(v))
        out_p = codec._py_loads(native.dumps(v))
        np.testing.assert_array_equal(out_n["emb"], out_p["emb"])

    def test_cross_loads(self):
        v = {"a": [1, 2.5, "x"], "b": None}
        assert native.loads(codec._py_dumps(v)) == v
        assert codec._py_loads(native.dumps(v)) == v

    def test_bigint_falls_back(self):
        v = {"big": 2**70}
        # public dumps must still work (pure-Python fallback)
        assert codec.loads(codec.dumps(v))["big"] == 2**70

    def test_numpy_scalars(self):
        v = {"i": np.int64(42), "f": np.float64(2.5)}
        assert native.dumps(v) == codec._py_dumps(v)

    def test_truncated_raises(self):
        blob = native.dumps({"a": [1, 2, 3]})
        with pytest.raises(ValueError):
            native.loads(blob[:-2])

    # --- tag 10: typed ndarrays (columnar snapshots / WAL batch frames) ---

    TYPED_ARRAYS = [
        np.arange(10, dtype=np.int64),
        np.arange(6, dtype=np.int32).reshape(2, 3),
        np.array([True, False, True]),
        np.random.default_rng(0).standard_normal((3, 5)).astype(np.float64),
        np.zeros((0, 4), np.int64),
        np.arange(8, dtype=np.uint8),
        np.arange(4, dtype=np.uint16),
        np.random.default_rng(1).standard_normal((4, 7)).astype(np.float32),
        np.random.default_rng(2).standard_normal(5).astype(np.float32),  # tag 9
    ]

    @pytest.mark.parametrize("a", TYPED_ARRAYS, ids=range(len(TYPED_ARRAYS)))
    def test_typed_ndarray_identical(self, a):
        assert native.dumps(a) == codec._py_dumps(a)
        for r in (native.loads(native.dumps(a)), codec._py_loads(native.dumps(a))):
            assert isinstance(r, np.ndarray)
            assert r.dtype == a.dtype and r.shape == a.shape
            np.testing.assert_array_equal(r, a)
            # decoded arrays must be writable owners (column loads mutate)
            assert r.flags.writeable and r.flags.owndata

    def test_bfloat16_ndarray(self):
        import ml_dtypes

        a = np.random.default_rng(3).standard_normal((2, 9)).astype(ml_dtypes.bfloat16)
        assert native.dumps(a) == codec._py_dumps(a)
        for r in (native.loads(native.dumps(a)), codec._py_loads(native.dumps(a))):
            assert r.dtype == a.dtype and r.shape == a.shape
            np.testing.assert_array_equal(
                np.asarray(r, np.float32), np.asarray(a, np.float32)
            )

    def test_zero_d_array_encodes_as_scalar(self):
        assert native.dumps(np.array(3.5)) == codec._py_dumps(3.5)
        assert codec._py_dumps(np.array(7, np.int64)) == codec._py_dumps(7)

    def test_nested_typed_arrays(self):
        v = {"cols": {"a": np.arange(5, dtype=np.int64)},
             "null": np.zeros(5, np.bool_), "n": 5}
        assert native.dumps(v) == codec._py_dumps(v)
        out = native.loads(codec._py_dumps(v))
        np.testing.assert_array_equal(out["cols"]["a"], v["cols"]["a"])
        np.testing.assert_array_equal(out["null"], v["null"])

    def test_noncontiguous_and_object_arrays(self):
        a = np.arange(12, dtype=np.int64).reshape(3, 4)[:, ::2]  # strided
        blob = codec.dumps(a)  # public API: any path must round-trip values
        np.testing.assert_array_equal(codec.loads(blob), np.ascontiguousarray(a))
        obj = np.empty(2, dtype=object)
        obj[:] = [{"x": 1}, [1, 2]]
        assert codec.loads(codec.dumps(obj)) == [{"x": 1}, [1, 2]]


class TestMemcomparableEquivalence:
    @pytest.mark.parametrize(
        "v", [None, True, False, -5, 0, 2**62, -2.5, 3.14, "a\x00b", b"\x00\xff", "", b""]
    )
    def test_value_identical(self, v):
        assert native.mc_encode_value(v) == mc.encode_value(v)

    def test_rows(self):
        cols = [[3, 1, 2], ["c", "a", "b"], [None, 1.5, True]]
        got = native.mc_encode_rows(cols)
        ref = [mc.encode_tuple(t) for t in zip(*cols)]
        assert got == ref

    def test_str_fallback_for_exotic(self):
        # dicts/lists in key columns degrade to str() in both paths
        assert native.mc_encode_value([1, 2]) == mc.encode_value(str([1, 2]))

    def test_sort_rows_matches_encode_plus_argsort(self):
        # mc_sort_rows must equal mc_encode_rows + stable argsort exactly:
        # SortedIndex._build depends on identical permutation AND bytes
        import numpy as np

        rng = np.random.default_rng(3)
        vals = [None, 3, -7, 2.5, "abc", "ab\x00c", b"\x00\xff", "", -0.0, True]
        cols = [
            [vals[int(i)] for i in rng.integers(0, len(vals), 4000)],
            [int(x) for x in rng.integers(-50, 50, 4000)],
        ]
        keys = np.asarray(native.mc_encode_rows(cols), dtype=object)
        order = np.argsort(keys, kind="stable")
        sorted_keys, order_buf = native.mc_sort_rows(cols)
        assert np.array_equal(np.frombuffer(order_buf, np.int64), order)
        assert list(keys[order]) == list(sorted_keys)
        # empty input
        sk, ob = native.mc_sort_rows([[]])
        assert sk == [] and ob == b""
