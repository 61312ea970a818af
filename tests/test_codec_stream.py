"""Streaming snapshot encode: codec.dump_parts must concatenate to bytes
IDENTICAL to codec.dumps (the wire format is frozen; readers never know
which writer produced a file), and Storage.write_atomic_framed must
produce files identical to write_atomic(frame(payload)) on every
backend."""

import numpy as np
import ml_dtypes
import pytest

from tostore_tpu.utils import codec
from tostore_tpu.engine.storage import FileStorage, MemoryStorage


def _cat(parts) -> bytes:
    return b"".join(bytes(p) for p in parts)


CASES = [
    None,
    True,
    {"a": 1, "b": [1, 2.5, "x", None], "c": b"bytes"},
    np.arange(17, dtype=np.int64),
    {"big": np.arange(300_000, dtype=np.int64)},  # 2.4 MB -> streams
    {"bigf32": np.random.default_rng(0).standard_normal(400_000).astype(np.float32)},
    {"big2d": np.random.default_rng(1).standard_normal((700, 600)).astype(np.float32)},
    {"bf16": np.random.default_rng(2).standard_normal((900, 700)).astype(ml_dtypes.bfloat16)},
    {"bools": np.zeros(2_000_000, np.bool_)},  # 2 MB bool column
    # object-column shape: list of small f32 cells (vector column pack)
    {"values": [np.float32(0).repeat(8) + i for i in range(500)]},
    # nesting: big arrays inside lists inside dicts
    {"t": {"cols": {"a": {"data": np.arange(200_000, dtype=np.int64),
                          "null": np.zeros(200_000, np.bool_)}},
           "meta": [1, "x", {"y": 2}],
           "cells": [np.arange(4, dtype=np.float32)] * 300}},
    [],
    {},
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_dump_parts_byte_identical(i):
    v = CASES[i]
    expect = codec._py_dumps(v)  # the reference encoder
    got = _cat(codec.dump_parts(v))
    assert got == expect
    # and round-trips through the normal reader
    back = codec.loads(got)
    _assert_eq(back, codec.loads(expect))


def _assert_eq(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_eq(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_eq(x, y)
    elif isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b)
    else:
        assert a == b


def test_dump_parts_noncontiguous_and_bigendian():
    big = np.arange(600_000, dtype=np.int64)[::2]  # non-contiguous view
    assert _cat(codec.dump_parts({"x": big})) == codec._py_dumps({"x": big})
    be = np.arange(300_000, dtype=">i4")
    # encode_value routes big-endian via the tag-7 tolist fallback or
    # conversion; just require parts == dumps, whatever that is
    assert _cat(codec.dump_parts({"x": be})) == codec._py_dumps({"x": be})


def test_dump_parts_bounded_buffers():
    v = {"a": np.arange(3_000_000, dtype=np.int64),
         "b": np.arange(3_000_000, dtype=np.int64)}
    glue = [len(bytes(p)) for p in codec.dump_parts(v)
            if not isinstance(p, memoryview)]
    assert max(glue) < codec._STREAM_CHUNK + 1024


@pytest.mark.parametrize("store_cls", [FileStorage, MemoryStorage])
def test_write_atomic_framed_equivalence(tmp_path, store_cls):
    st = store_cls()
    payload_v = {"col": np.arange(500_000, dtype=np.int64),
                 "cells": [np.arange(8, dtype=np.float32)] * 100,
                 "meta": {"n": 100}}
    p1 = str(tmp_path / "a.snap")
    p2 = str(tmp_path / "b.snap")
    st.write_atomic(p1, codec.frame(codec.dumps(payload_v)))
    st.write_atomic_framed(p2, codec.dump_parts(payload_v))
    assert st.read(p1) == st.read(p2)
    frames = list(codec.iter_frames(st.read(p2)))
    assert len(frames) == 1
    _assert_eq(codec.loads(frames[0]), payload_v)


def test_write_atomic_framed_no_torn_file_on_error(tmp_path):
    st = FileStorage()
    p = str(tmp_path / "c.snap")
    st.write_atomic_framed(p, codec.dump_parts({"v": 1}))

    def exploding():
        yield b"\x00" * 100
        raise RuntimeError("mid-stream failure")

    with pytest.raises(RuntimeError):
        st.write_atomic_framed(p, exploding())
    # the committed file is untouched (replace never happened)
    frames = list(codec.iter_frames(st.read(p)))
    assert codec.loads(frames[0]) == {"v": 1}
