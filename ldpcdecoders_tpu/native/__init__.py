"""Native (C++) host-runtime tier: lazy-built ctypes bindings.

The compute path is JAX/XLA/Pallas; this tier covers host-side runtime
work where Python is the bottleneck — the Tanner-graph edge-list compiler
and the bit-packed GF(2) syndrome/verification kernels that feed the FER
sweep harness.  The shared library is built on first use with the system
g++ and cached; every entry point has a pure-NumPy fallback, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

__all__ = [
    "compile_tanner_native",
    "native_available",
    "pack_gf2_rows",
    "gf2_syndromes_packed",
    "gf2_verify_packed",
]

_lock = threading.Lock()
_lib = None
_build_failed = False

_SRCS = [
    os.path.join(os.path.dirname(__file__), "graph_compiler.cpp"),
    os.path.join(os.path.dirname(__file__), "gf2_host.cpp"),
]
_SRC = _SRCS[0]


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
        so_path = os.path.join(_cache_dir(), "ldpc_native.so")
        try:
            src_mtime = max(os.path.getmtime(s) for s in _SRCS)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                with tempfile.TemporaryDirectory() as td:
                    tmp_so = os.path.join(td, "ldpc_native.so")
                    subprocess.run(
                        ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                         "-o", tmp_so, *_SRCS],
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
            lib.gf2_pack_rows.restype = None
            lib.gf2_pack_rows.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.gf2_syndromes_packed.restype = None
            lib.gf2_syndromes_packed.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.gf2_verify_packed.restype = None
            lib.gf2_verify_packed.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
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


def pack_gf2_rows(M: np.ndarray) -> np.ndarray | None:
    """Pack a ``[rows, n]`` 0/1 matrix into ``[rows, ceil(n/64)]`` uint64
    words (threaded C++), or ``None`` if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    M = np.ascontiguousarray(M, dtype=np.uint8)
    rows, n = M.shape
    nw = (n + 63) // 64
    out = np.empty((rows, nw), np.uint64)
    lib.gf2_pack_rows(M.ctypes.data, rows, n, nw, out.ctypes.data)
    return out


def gf2_syndromes_packed(Hp: np.ndarray, Ep: np.ndarray, m: int) -> np.ndarray | None:
    """``[B, m]`` uint8 syndromes from packed H rows and packed error rows."""
    lib = _load()
    if lib is None:
        return None
    B, nw = Ep.shape
    if Hp.shape != (m, nw):
        raise ValueError(f"packed H shape {Hp.shape} != ({m}, {nw})")
    out = np.empty((B, m), np.uint8)
    lib.gf2_syndromes_packed(
        Hp.ctypes.data, m, nw, Ep.ctypes.data, B, out.ctypes.data
    )
    return out


def gf2_verify_packed(Hp: np.ndarray, Ep: np.ndarray, Gp: np.ndarray):
    """Fused decode verification on packed lanes.

    Returns ``(exact [B] bool, smatch [B] bool)`` where ``exact`` is
    bitwise recovery of the injected error and ``smatch`` is syndrome
    consistency (H @ (E xor G) == 0); ``None`` if native is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    m, nw = Hp.shape
    B = Ep.shape[0]
    if Ep.shape != (B, nw) or Gp.shape != (B, nw):
        raise ValueError("packed error/guess shapes disagree with packed H")
    exact = np.empty((B,), np.uint8)
    smatch = np.empty((B,), np.uint8)
    lib.gf2_verify_packed(
        Hp.ctypes.data, m, nw, Ep.ctypes.data, Gp.ctypes.data, B,
        exact.ctypes.data, smatch.ctypes.data,
    )
    return exact.astype(bool), smatch.astype(bool)
