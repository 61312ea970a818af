"""Chunked host<->device transfer helpers + vectorized pk membership.

upload_rows/download_rows exist because one large RPC through the
tunneled TPU stalls (ops/runtime.py H2D_CHUNK_BYTES rationale); their
correctness contract — exact bytes land regardless of how the chunk size
divides the payload — is what these tests pin, on the CPU backend where
chunking is a pure refactor of one copy. contains_many backs the WAL
replay batch filters (engine/database.py) and must agree with per-pk
`in` across dense-window, dict-overflow, and non-int key layouts.
"""

import numpy as np
import pytest

import tostore_tpu.ops.runtime as rt
from tostore_tpu.engine.columnstore import PkMap
from tostore_tpu.vector.corpus import DeviceCorpus

import jax.numpy as jnp


def _mk(shape, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(dtype)


@pytest.mark.parametrize("rows,start", [(0, 0), (1, 3), (7, 0), (64, 10)])
def test_upload_rows_exact(monkeypatch, rows, start):
    # force multi-chunk: 4 rows of f32[..,16] = 256 B per chunk
    monkeypatch.setattr(rt, "H2D_CHUNK_BYTES", 4 * 16 * 4)
    dest = jnp.zeros((128, 16), jnp.float32)
    host = _mk((rows, 16))
    out = np.asarray(rt.upload_rows(dest, host, start))
    expect = np.zeros((128, 16), np.float32)
    expect[start : start + rows] = host
    np.testing.assert_array_equal(out, expect)


def test_upload_rows_cast_and_noncontiguous(monkeypatch):
    monkeypatch.setattr(rt, "H2D_CHUNK_BYTES", 8 * 8 * 4)
    dest = jnp.zeros((32, 8), jnp.bfloat16)
    host = _mk((40, 16))[:30, ::2]  # non-contiguous view, 30x8
    out = rt.upload_rows(dest, host, 1, cast_to=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    expect = np.ascontiguousarray(host).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out)[1:31], expect)
    np.testing.assert_array_equal(np.asarray(out)[0], np.zeros(8))
    np.testing.assert_array_equal(np.asarray(out)[31], np.zeros(8))


def test_upload_rows_1d(monkeypatch):
    monkeypatch.setattr(rt, "H2D_CHUNK_BYTES", 16 * 4)
    dest = jnp.zeros((64,), jnp.float32)
    host = _mk((37,))
    out = np.asarray(rt.upload_rows(dest, host, 5))
    expect = np.zeros(64, np.float32)
    expect[5:42] = host
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize(
    "cap,m",
    [
        (64, 0),       # empty
        (64, 3),       # single chunk (m <= chunk)
        (64, 32),      # exact multiple of chunk
        (64, 37),      # remainder, off+chunk <= cap (sliced full chunk)
        (64, 63),      # remainder where the LAST full chunk ends at 56,
                       # rem chunk [56:64) fits exactly
        (20, 19),      # remainder, off+chunk > cap -> static-tail branch
    ],
)
def test_download_rows_exact(monkeypatch, cap, m):
    host = _mk((cap, 16))
    dev = jnp.asarray(host)
    # chunk = 8 rows (8*16*4 bytes)
    monkeypatch.setattr(rt, "H2D_CHUNK_BYTES", 8 * 16 * 4)
    out = rt.download_rows(dev, m)
    assert out.shape == (m, 16)
    np.testing.assert_array_equal(out, host[:m])


def test_download_rows_roundtrip_bf16(monkeypatch):
    monkeypatch.setattr(rt, "H2D_CHUNK_BYTES", 4 * 8 * 2)
    host = _mk((50, 8)).astype(jnp.bfloat16)
    dev = jnp.asarray(host)
    out = rt.download_rows(dev, 49)
    assert out.dtype == host.dtype
    np.testing.assert_array_equal(out, host[:49])


def test_canonical_cap_family():
    rb = rt.ROW_BLOCK
    assert DeviceCorpus.canonical_cap(1) == rb
    assert DeviceCorpus.canonical_cap(rb) == rb
    assert DeviceCorpus.canonical_cap(rb + 1) == 2 * rb
    assert DeviceCorpus.canonical_cap(3 * rb) == 3 * rb  # <=8 blocks exact
    # every cap covers the request with bounded overscan (<= 1/8 + block pad)
    for n in (1, rb - 1, rb, 5 * rb + 3, 98 * rb, 10**6, 10**7 + 13):
        cap = DeviceCorpus.canonical_cap(n)
        assert cap >= n
        blocks = -(-n // rb)
        assert cap <= rb * (blocks + max(1, blocks // 8))
    # block counts are 3-fraction-bit floats: m * 2^e with m in [8, 15]
    for n in range(1, 400 * rb, 1237):
        b = DeviceCorpus.canonical_cap(n) // rb
        while b % 2 == 0 and b > 15:
            b //= 2
        assert 1 <= b <= 15
    # the family stays small over a wide size range
    caps = {DeviceCorpus.canonical_cap(n) for n in range(1, 400 * rb, 917)}
    assert len(caps) <= 8 + 8 * 7  # 8 small + 8 mantissas per octave


# --- PkMap.contains_many ----------------------------------------------------


def _assert_matches_scalar(m: PkMap, probes):
    got = m.contains_many(probes)
    expect = np.array([p in m for p in probes], np.bool_)
    np.testing.assert_array_equal(got, expect)
    return got


def test_contains_many_dense_window():
    m = PkMap.build_from_arrays(
        np.arange(10, 110, dtype=np.int64), np.arange(100, dtype=np.int64)
    )
    probes = [0, 9, 10, 55, 109, 110, 10_000, -5]
    got = _assert_matches_scalar(m, probes)
    assert got.tolist() == [
        False, False, True, True, True, False, False, False,
    ]


def test_contains_many_dense_plus_dict_overflow():
    m = PkMap.build_from_arrays(
        np.arange(100, dtype=np.int64), np.arange(100, dtype=np.int64)
    )
    m[10**9] = 100  # far outside the window -> dict overflow
    m["alpha"] = 101  # non-int -> dict
    probes = [5, 99, 100, 10**9, 10**9 + 1]
    got = _assert_matches_scalar(m, probes)
    assert got.tolist() == [True, True, False, True, False]
    # non-int probes force the generic path
    got2 = _assert_matches_scalar(m, ["alpha", "beta", 5])
    assert got2.tolist() == [True, False, True]


def test_contains_many_dict_only_and_empty():
    m = PkMap()
    assert m.contains_many([]).shape == (0,)
    m["k1"] = 0
    m["k2"] = 1
    got = _assert_matches_scalar(m, ["k1", "k3", "k2"])
    assert got.tolist() == [True, False, True]


def test_contains_many_respects_deletes():
    m = PkMap.build_from_arrays(
        np.arange(20, dtype=np.int64), np.arange(20, dtype=np.int64)
    )
    m.pop(7)
    got = _assert_matches_scalar(m, [6, 7, 8])
    assert got.tolist() == [True, False, True]
