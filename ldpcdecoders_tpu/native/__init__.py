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
    "gf2_pack_cols",
    "gf2_osd0_host",
    "gf2_osd_cs_host",
    "gf2_syndromes_packed",
    "gf2_verify_packed",
]

_lock = threading.Lock()
_lib = None
_build_failed = False

_SRCS = [
    os.path.join(os.path.dirname(__file__), "graph_compiler.cpp"),
    os.path.join(os.path.dirname(__file__), "gf2_host.cpp"),
    os.path.join(os.path.dirname(__file__), "gf2_osd.cpp"),
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
            lib.gf2_osd0_host.restype = None
            lib.gf2_osd0_host.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.gf2_osd_cs_host.restype = None
            lib.gf2_osd_cs_host.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.gf2_pack_cols.restype = None
            lib.gf2_pack_cols.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
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


def gf2_pack_cols(H: np.ndarray) -> np.ndarray | None:
    """Pack ``[m, n]`` 0/1 H into ``[n, ceil(m/64)]`` uint64 column
    bitsets (bit r of word w = row 64w+r), or ``None`` if unavailable."""
    lib = _load()
    if lib is None:
        return None
    H = np.ascontiguousarray(H, dtype=np.uint8)
    m, n = H.shape
    mw = (m + 63) // 64
    out = np.empty((n, mw), np.uint64)
    lib.gf2_pack_cols(H.ctypes.data, m, n, mw, out.ctypes.data)
    return out


def gf2_osd0_host(Hcols: np.ndarray, m: int, order: np.ndarray,
                  bp: np.ndarray, syn: np.ndarray):
    """Threaded host OSD-0 over packed columns (see native/gf2_osd.cpp).

    Bit-identical to the device path (ops/gf2.py::gf2_osd0) given the
    same per-lane column order; built for problem widths the device
    elimination cannot hold (golden-tested in tests/test_native.py).

    Args:
      Hcols: ``[n, ceil(m/64)]`` uint64 packed columns (gf2_pack_cols).
      m: row count.
      order: ``[B, n]`` int32 per-lane scan order, most reliable first.
      bp: ``[B, n]`` uint8 hard decisions (original column order).
      syn: ``[B, m]`` uint8 syndromes.

    Returns ``(out [B, n] uint8, consistent [B] bool)`` or ``None`` if
    the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    Hcols = np.ascontiguousarray(Hcols, dtype=np.uint64)
    n, mw = Hcols.shape
    order = np.ascontiguousarray(order, dtype=np.int32)
    bp = np.ascontiguousarray(bp, dtype=np.uint8)
    syn = np.ascontiguousarray(syn, dtype=np.uint8)
    B = order.shape[0]
    if order.shape != (B, n) or bp.shape != (B, n) or syn.shape != (B, m):
        raise ValueError(
            f"shape mismatch: order {order.shape}, bp {bp.shape}, "
            f"syn {syn.shape} for n={n}, m={m}")
    if order.size and (order.min() < 0 or order.max() >= n):
        # the C++ indexes Hcols with these directly; OOB would be UB
        raise ValueError("order entries must be column indices in [0, n)")
    if mw != (m + 63) // 64:
        raise ValueError(
            f"m={m} inconsistent with packed-column width {mw} words")
    out = np.empty((B, n), np.uint8)
    consistent = np.empty(B, np.uint8)
    lib.gf2_osd0_host(Hcols.ctypes.data, n, m, mw, order.ctypes.data,
                      bp.ctypes.data, syn.ctypes.data, B, out.ctypes.data,
                      consistent.ctypes.data)
    return out, consistent.astype(bool)


def gf2_osd_cs_host(Hcols: np.ndarray, m: int, lam: int, order: np.ndarray,
                    bp: np.ndarray, syn: np.ndarray, lam3: int = 0):
    """Threaded host OSD-CS (combination sweep; native/gf2_osd.cpp).

    Same conventions as :func:`gf2_osd0_host` plus ``lam``, the pair-
    sweep depth over the most-reliable non-pivot columns, and ``lam3``,
    the TRIPLE-sweep depth (order-3 combinations; 0 disables — the
    device sweep's semantics, against which lam3=0 is golden-tested;
    triples are a host-only extension, tested against a NumPy oracle).
    Returns ``(out, consistent)`` or ``None`` if the native library is
    unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    Hcols = np.ascontiguousarray(Hcols, dtype=np.uint64)
    n, mw = Hcols.shape
    order = np.ascontiguousarray(order, dtype=np.int32)
    bp = np.ascontiguousarray(bp, dtype=np.uint8)
    syn = np.ascontiguousarray(syn, dtype=np.uint8)
    B = order.shape[0]
    if order.shape != (B, n) or bp.shape != (B, n) or syn.shape != (B, m):
        raise ValueError(
            f"shape mismatch: order {order.shape}, bp {bp.shape}, "
            f"syn {syn.shape} for n={n}, m={m}")
    if order.size and (order.min() < 0 or order.max() >= n):
        raise ValueError("order entries must be column indices in [0, n)")
    if mw != (m + 63) // 64:
        raise ValueError(
            f"m={m} inconsistent with packed-column width {mw} words")
    if lam < 0 or lam3 < 0:
        raise ValueError("lam and lam3 must be >= 0")
    out = np.empty((B, n), np.uint8)
    consistent = np.empty(B, np.uint8)
    lib.gf2_osd_cs_host(Hcols.ctypes.data, n, m, mw, int(lam), int(lam3),
                        order.ctypes.data, bp.ctypes.data, syn.ctypes.data,
                        B, out.ctypes.data, consistent.ctypes.data)
    return out, consistent.astype(bool)
