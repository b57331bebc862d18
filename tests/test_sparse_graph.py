"""Sparse (COO) graph construction and dense-H-free decoding."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.graph import TannerGraph


def test_from_edges_matches_from_pcm():
    H = lt.parity_check_matrix(240, 8, 4, rng=71)
    rows, cols = np.nonzero(H)
    a = TannerGraph.from_pcm(H, use_native=False)
    b = TannerGraph.from_edges(rows, cols, *H.shape)
    for f in ("chk_vars", "chk_mask", "var_chks", "var_mask", "c2v_gather", "v2c_gather"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert b.H is None
    assert b.n_edges == a.n_edges


def test_decoders_work_without_dense_H():
    """BP / min-sum / bit-flip / BP-OTS must decode a graph built purely
    from an edge list (no dense H anywhere)."""
    H = lt.parity_check_matrix(240, 8, 4, rng=72)
    rows, cols = np.nonzero(H)
    g = TannerGraph.from_edges(rows, cols, *H.shape)
    rng = np.random.default_rng(1)
    errs = rng.random((16, H.shape[1])) < 0.01
    syns = (errs @ H.T) % 2
    for cls in (
        lambda: lt.BeliefPropagationDecoder(g, 0.01, 50),
        lambda: lt.MinSumDecoder(g, 0.01, 50),
        lambda: lt.QuantizedMinSumDecoder(g, 0.01, 50),
        lambda: lt.BitFlipDecoder(g, 0.01, 50),
        lambda: lt.BPOTSDecoder(g, 0.01, 50),
        lambda: lt.LayeredMinSumDecoder(g, 0.01, 50),
    ):
        dec = cls()
        e, c = dec.batch_decode(syns)
        ok = (e.astype(bool) == errs).all(axis=1)
        assert ok.mean() > 0.9, type(dec).__name__


def test_osd_requires_dense_H():
    H = lt.parity_check_matrix(120, 6, 3, rng=73)
    rows, cols = np.nonzero(H)
    g = TannerGraph.from_edges(rows, cols, *H.shape)
    with pytest.raises(ValueError, match="dense parity-check"):
        lt.BeliefPropagationOSDDecoder(g, 0.01, 10)
    # attaching H restores OSD
    g2 = TannerGraph.from_edges(rows, cols, *H.shape, H=H)
    dec = lt.BeliefPropagationOSDDecoder(g2, 0.01, 10)
    assert dec.osd_order == 0


def test_from_edges_rejects_bad_input():
    with pytest.raises(ValueError):
        TannerGraph.from_edges([0, 1], [0], 2, 2)
    with pytest.raises(ValueError):
        TannerGraph.from_edges([0, 5], [0, 0], 2, 2)
    with pytest.raises(ValueError):
        TannerGraph.from_edges([0, 0], [1, 1], 2, 2)  # duplicate edge


def test_from_edges_scales_to_large_codes():
    """A 100k-variable code compiles in seconds from COO and decodes
    (CPU, tiny batch, few iterations)."""
    import time

    n, wr, wc = 99996, 6, 3
    H_small_seed = np.random.default_rng(74)
    # build the edge list directly (block structure), never densifying
    block = n // wr
    rows_list, cols_list = [], []
    for b in range(wc):
        perm = H_small_seed.permutation(n)
        r = np.repeat(np.arange(block), wr) + b * block
        rows_list.append(r)
        cols_list.append(perm[: block * wr])
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    t0 = time.perf_counter()
    g = TannerGraph.from_edges(rows, cols, block * wc, n)
    dt = time.perf_counter() - t0
    assert dt < 10.0, f"COO compile too slow: {dt}s"
    assert g.n_edges == n * wc
    dec = lt.MinSumDecoder(g, 0.005, 5)
    syns = np.zeros((2, g.m), np.uint8)
    e, c = dec.batch_decode(syns)
    assert c.all() and not e.any()
