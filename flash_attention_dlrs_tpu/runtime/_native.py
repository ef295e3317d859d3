"""Shared loader for the native (C++) runtime library.

One ``libfa_tpu_native.so`` holds every native runtime component (page
allocator, data loader); this module owns the build-on-demand + dlopen so
each binding module doesn't duplicate it.  The library is rebuilt when any
``native/src/*.cc`` (or the Makefile) is newer than the built .so — a stale
build from a previous checkout would otherwise silently miss newer symbols.
Failure to build (no toolchain) is non-fatal: callers fall back to their
pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libfa_tpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    built = os.path.getmtime(_LIB_PATH)
    deps = glob.glob(os.path.join(_NATIVE_DIR, "src", "*.cc"))
    deps.append(os.path.join(_NATIVE_DIR, "Makefile"))
    return any(
        os.path.exists(p) and os.path.getmtime(p) > built for p in deps
    )


def load_lib() -> Optional[ctypes.CDLL]:
    """Build (once, if missing or stale) and dlopen; None on failure."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if _stale():
                subprocess.run(
                    ["make", "-s", "-B"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=180,
                )
            _lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _build_failed = True
    return _lib
