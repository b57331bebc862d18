"""Native (C++) host-runtime tier: lazy-built ctypes bindings.

The compute path is JAX/XLA/Pallas; this tier covers host-side runtime
work where Python is the bottleneck — currently the Tanner-graph edge-list
compiler.  The shared library is built on first use with the system g++
and cached; every entry point has a pure-NumPy fallback, so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

__all__ = ["compile_tanner_native", "native_available"]

_lock = threading.Lock()
_lib = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(__file__), "graph_compiler.cpp")


def _cache_dir() -> str:
    d = os.environ.get(
        "LDPCDECODERS_TPU_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ldpcdecoders_tpu",
        ),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so_path = os.path.join(_cache_dir(), "graph_compiler.so")
        try:
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                with tempfile.TemporaryDirectory() as td:
                    tmp_so = os.path.join(td, "graph_compiler.so")
                    subprocess.run(
                        ["g++", "-O3", "-shared", "-fPIC", "-o", tmp_so, _SRC],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    os.replace(tmp_so, so_path)
            lib = ctypes.CDLL(so_path)
            lib.compile_tanner.restype = ctypes.c_int
            lib.compile_tanner.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
            ] + [ctypes.c_void_p] * 6
            lib.degrees.restype = None
            lib.degrees.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def compile_tanner_native(H: np.ndarray, max_dc: int, max_dv: int):
    """Fill padded adjacency + gather arrays via the C++ compiler.

    Returns ``(chk_vars, chk_mask, var_chks, var_mask, c2v, v2c)`` or
    ``None`` if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    H = np.ascontiguousarray(H, dtype=np.uint8)
    m, n = H.shape
    chk_vars = np.zeros((m, max_dc), np.int32)
    chk_mask = np.zeros((m, max_dc), np.uint8)
    var_chks = np.zeros((n, max_dv), np.int32)
    var_mask = np.zeros((n, max_dv), np.uint8)
    c2v = np.zeros((m, max_dc), np.int32)
    v2c = np.zeros((n, max_dv), np.int32)
    rc = lib.compile_tanner(
        H.ctypes.data,
        m,
        n,
        max_dc,
        max_dv,
        chk_vars.ctypes.data,
        chk_mask.ctypes.data,
        var_chks.ctypes.data,
        var_mask.ctypes.data,
        c2v.ctypes.data,
        v2c.ctypes.data,
    )
    if rc != 0:
        raise ValueError("degree exceeds padded maximum (internal error)")
    return chk_vars, chk_mask.astype(bool), var_chks, var_mask.astype(bool), c2v, v2c
