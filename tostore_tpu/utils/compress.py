"""Compression for host artifacts (reference core/data_compressor.dart:
zlib levels). Framed with a 1-byte algo tag so decompress is self-
describing; level 0 = store."""

from __future__ import annotations

import zlib

TAG_STORE = 0
TAG_ZLIB = 1


def compress(data: bytes, level: int = 6) -> bytes:
    if level <= 0:
        return bytes([TAG_STORE]) + data
    return bytes([TAG_ZLIB]) + zlib.compress(data, level)


def decompress(blob: bytes) -> bytes:
    tag = blob[0]
    if tag == TAG_STORE:
        return blob[1:]
    if tag == TAG_ZLIB:
        return zlib.decompress(blob[1:])
    raise ValueError(f"unknown compression tag {tag}")
