"""Code-construction layer tests (reference oracle: test_oldtests.jl)."""

import numpy as np
import pytest

from ldpcdecoders_tpu.codes import (
    parity_check_matrix,
    save_pcm,
    load_pcm,
    TannerGraph,
    toric_code_x,
    toric_code_z,
    surface_code_x,
    surface_code_z,
    repetition_code,
    cycle_matrix,
    hamming_code,
)


def test_gallager_regularity():
    # reference oracle: constant row sums == wr, column sums == wc
    # (/root/reference/test/test_oldtests.jl)
    n, wr, wc = 1000, 10, 9
    H = parity_check_matrix(n, wr, wc, rng=0)
    assert H.shape == (n * wc // wr, n)
    assert (H.sum(axis=1) == wr).all()
    assert (H.sum(axis=0) == wc).all()


def test_gallager_requires_divisibility():
    with pytest.raises(ValueError):
        parity_check_matrix(10, 3, 2)


def test_gallager_deterministic_with_seed():
    a = parity_check_matrix(60, 6, 3, rng=7)
    b = parity_check_matrix(60, 6, 3, rng=7)
    assert np.array_equal(a, b)


def test_pcm_roundtrip(tmp_path):
    H = parity_check_matrix(60, 6, 3, rng=3)
    p = str(tmp_path / "h.pcm")
    save_pcm(H, p)
    H2 = load_pcm(p)
    assert np.array_equal(H, H2)


def test_toric_code_structure():
    for d in (2, 3, 4):
        Hx = toric_code_x(d)
        Hz = toric_code_z(d)
        assert Hx.shape == (d * d, 2 * d * d)
        assert (Hx.sum(axis=1) == 4).all()
        assert (Hx.sum(axis=0) == 2).all()
        # CSS condition: Hx @ Hz^T == 0 (mod 2)
        assert ((Hx.astype(int) @ Hz.astype(int).T) % 2 == 0).all()


def test_surface_code_css_condition():
    for d in (3, 5):
        Hx = surface_code_x(d)
        Hz = surface_code_z(d)
        assert Hx.shape[1] == d * d
        assert ((Hx.astype(int) @ Hz.astype(int).T) % 2 == 0).all()
        # d^2 qubits, (d^2-1) total stabilizers -> 1 logical qubit
        assert Hx.shape[0] + Hz.shape[0] == d * d - 1


def test_cycle_matrix_matches_reference_testutil():
    # reference test util: diag + superdiag circulant
    # (/root/reference/test/test_bpots.jl:14-25)
    H = cycle_matrix(4)
    assert (H.sum(axis=0) == 2).all()
    assert (H.sum(axis=1) == 2).all()
    assert H[3, 0] == 1  # wraparound


def test_repetition_and_hamming():
    H = repetition_code(5)
    assert H.shape == (4, 5)
    Hh = hamming_code(3)
    assert Hh.shape == (3, 7)
    # all columns distinct and nonzero
    cols = {tuple(c) for c in Hh.T.tolist()}
    assert len(cols) == 7


def test_tanner_graph_roundtrip():
    H = parity_check_matrix(60, 6, 3, rng=5)
    g = TannerGraph.from_pcm(H)
    assert g.n_edges == int(H.sum())
    # adjacency must reproduce H
    H2 = np.zeros_like(H)
    for i in range(g.m):
        for k in range(g.max_dc):
            if g.chk_mask[i, k]:
                H2[i, g.chk_vars[i, k]] = 1
    assert np.array_equal(H, H2)
    # gather permutations are mutually inverse on real edges
    for j in range(g.n):
        for k in range(g.max_dv):
            if g.var_mask[j, k]:
                flat = g.v2c_gather[j, k]
                i, kc = divmod(int(flat), g.max_dc)
                assert g.chk_vars[i, kc] == j
                assert g.c2v_gather[i, kc] == j * g.max_dv + k


def test_tanner_graph_irregular_degrees():
    H = toric_code_x(3)
    g = TannerGraph.from_pcm(H)
    assert g.max_dc == 4
    assert g.max_dv == 2
    g8 = TannerGraph.from_pcm(H, degree_multiple=8)
    assert g8.max_dc == 8 and g8.max_dv == 8


def test_syndromes_from_edges_matches_dense():
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.utils import syndromes_from_edges, syndromes_of

    H = lt.parity_check_matrix(120, 6, 3, rng=9)
    rows, cols = np.nonzero(H)
    errs = np.random.default_rng(4).random((7, H.shape[1])) < 0.1
    want = syndromes_of(H, errs)
    got = syndromes_from_edges(errs, rows, cols, H.shape[0])
    assert np.array_equal(got, want)
