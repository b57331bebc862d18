"""Native (C++) graph-compiler tier tests: build, exact parity with the
pure-Python compiler, and scale."""

import time

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.graph import TannerGraph
from ldpcdecoders_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def _graphs_equal(a: TannerGraph, b: TannerGraph) -> bool:
    return all(
        np.array_equal(getattr(a, f), getattr(b, f))
        for f in (
            "chk_vars",
            "chk_mask",
            "var_chks",
            "var_mask",
            "c2v_gather",
            "v2c_gather",
        )
    )


def test_native_matches_python_regular():
    H = lt.parity_check_matrix(240, 8, 4, rng=41)
    py = TannerGraph.from_pcm(H, use_native=False)
    nat = TannerGraph.from_pcm(H, use_native=True)
    assert _graphs_equal(py, nat)


def test_native_matches_python_irregular():
    H = lt.toric_code_x(4)
    py = TannerGraph.from_pcm(H, use_native=False, degree_multiple=8)
    nat = TannerGraph.from_pcm(H, use_native=True, degree_multiple=8)
    assert _graphs_equal(py, nat)


def test_native_is_fast_at_scale():
    H = lt.parity_check_matrix(20000, 10, 5, rng=43)
    t0 = time.perf_counter()
    g = TannerGraph.from_pcm(H, use_native=True)
    dt = time.perf_counter() - t0
    assert g.n_edges == 100000
    # generous bound: includes the one-time g++ build of the .so when the
    # cache is cold; the compile itself is ~0.15s
    assert dt < 15.0, f"native compile too slow: {dt}s"


def test_auto_dispatch_uses_native_for_large():
    # >100k entries triggers native automatically; results must be identical
    H = lt.parity_check_matrix(1000, 10, 9, rng=42)
    auto = TannerGraph.from_pcm(H)
    py = TannerGraph.from_pcm(H, use_native=False)
    assert _graphs_equal(auto, py)
