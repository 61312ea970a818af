"""Public API facade (placeholder — full facade lands with the engine core).

Mirrors reference lib/tostore.dart ToStore.open()/memory().
"""

from __future__ import annotations


class ToStoreTPU:
    def __init__(self, *a, **kw):
        raise NotImplementedError("engine core not yet wired; see tostore_tpu.engine")

    @staticmethod
    def memory(**kw):
        raise NotImplementedError

    @staticmethod
    def open(path: str, **kw):
        raise NotImplementedError
