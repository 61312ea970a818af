"""Native accelerator loader.

Builds `_tostore_native` (CPython extension, tostore_native.cpp) with g++
on first import and caches the .so next to the source; falls back silently
to the pure-Python implementations when no compiler is available. Set
TOSTORE_TPU_NO_NATIVE=1 to force the fallback (used by equivalence tests).
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "tostore_native.cpp")
_SO = os.path.join(_DIR, f"_tostore_native.{sysconfig.get_config_var('SOABI')}.so")

_mod = None
_tried = False


def _build() -> bool:
    inc = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{inc}", _SRC, "-o", _SO,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def get():
    """The native module, or None when unavailable/disabled."""
    global _mod, _tried
    if _mod is not None:
        return _mod
    if _tried or os.environ.get("TOSTORE_TPU_NO_NATIVE"):
        return None
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        spec = importlib.util.spec_from_file_location("_tostore_native", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _mod = None
    return _mod
