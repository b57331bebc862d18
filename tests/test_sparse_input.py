"""scipy.sparse input acceptance (reference parity: the Julia decoders take
SparseMatrixCSC{Bool,Int} directly, /root/reference/src/decoders/bpots_decoder.jl:90,
and the reference tests build sparse cycle matrices,
/root/reference/test/test_bpots.jl:14-25)."""

import numpy as np
import pytest

import scipy.sparse as sp

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes import TannerGraph, cycle_matrix


def _graph_eq(a: TannerGraph, b: TannerGraph):
    assert (a.m, a.n, a.max_dc, a.max_dv, a.n_edges) == (
        b.m,
        b.n,
        b.max_dc,
        b.max_dv,
        b.n_edges,
    )
    np.testing.assert_array_equal(a.chk_vars, b.chk_vars)
    np.testing.assert_array_equal(a.chk_mask, b.chk_mask)
    np.testing.assert_array_equal(a.var_chks, b.var_chks)
    np.testing.assert_array_equal(a.var_mask, b.var_mask)
    np.testing.assert_array_equal(a.c2v_gather, b.c2v_gather)
    np.testing.assert_array_equal(a.v2c_gather, b.v2c_gather)


@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_from_pcm_sparse_matches_dense(fmt):
    H = cycle_matrix(8)
    Hs = sp.csr_matrix(H).asformat(fmt)
    g_dense = TannerGraph.from_pcm(H)
    g_sparse = TannerGraph.from_pcm(Hs)
    _graph_eq(g_dense, g_sparse)
    # small sparse inputs keep a dense H attached for OSD tools
    np.testing.assert_array_equal(g_sparse.require_H(), g_dense.require_H())


def test_from_pcm_sparse_explicit_zeros_dropped():
    H = cycle_matrix(6).astype(np.int8)
    Hs = sp.csr_matrix(H)
    Hs.data[0] = 0  # explicit stored zero must not become an edge
    g = TannerGraph.from_pcm(Hs)
    assert g.n_edges == int(H.sum()) - 1


def test_from_pcm_huge_sparse_skips_dense():
    # above the densify threshold the graph must stay dense-free
    m = n = 3000  # 9e6 > 4e6 threshold
    rows = np.arange(m)
    cols = (rows * 7) % n
    Hs = sp.coo_matrix((np.ones(m, np.int8), (rows, cols)), shape=(m, n))
    g = TannerGraph.from_pcm(Hs)
    assert g.H is None
    assert g.n_edges == m


def test_from_pcm_coo_duplicates_summed():
    # duplicate (row, col) COO entries are legal scipy input whose values
    # sum; the graph must match the tocsr()/dense form of the same matrix
    H = cycle_matrix(6)
    r, c = np.nonzero(H)
    rows = np.concatenate([r, r[:1]])  # repeat one edge -> value 2
    cols = np.concatenate([c, c[:1]])
    Hs = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=H.shape)
    g = TannerGraph.from_pcm(Hs)
    _graph_eq(g, TannerGraph.from_pcm(H))


def test_css_decoder_accepts_mixed_sparse_and_list():
    from ldpcdecoders_tpu import CSSDecoder, toric_code_x, toric_code_z

    Hx, Hz = toric_code_x(3), toric_code_z(3)
    css = CSSDecoder(sp.csr_matrix(Hx), Hz.tolist(), 0.02, 30)
    syn_x = np.zeros((2, Hx.shape[0]), np.int8)
    syn_z = np.zeros((2, Hz.shape[0]), np.int8)
    z_err, x_err, zc, xc = css.batch_decode(syn_x, syn_z)
    assert zc.all() and xc.all()


def test_css_decoder_accepts_sparse():
    from ldpcdecoders_tpu import CSSDecoder, toric_code_x, toric_code_z

    Hx, Hz = toric_code_x(3), toric_code_z(3)
    css = CSSDecoder(sp.csr_matrix(Hx), sp.csr_matrix(Hz), 0.02, 30)
    rng = np.random.default_rng(9)
    errz = (rng.random((4, Hx.shape[1])) < 0.03).astype(np.int8)
    errx = (rng.random((4, Hz.shape[1])) < 0.03).astype(np.int8)
    syn_x = (errz @ Hx.T) % 2
    syn_z = (errx @ Hz.T) % 2
    z_err, x_err, zc, xc = css.batch_decode(syn_x, syn_z)
    assert ((z_err.astype(int) @ Hx.T) % 2 == syn_x).all()
    assert ((x_err.astype(int) @ Hz.T) % 2 == syn_z).all()
    # sparse CSS-condition validation still fires on violation: a single-
    # qubit Z-check anticommutes with any X-stabilizer touching that qubit
    bad_np = np.zeros((1, Hx.shape[1]), np.int8)
    bad_np[0, 0] = 1
    with pytest.raises(ValueError):
        CSSDecoder(sp.csr_matrix(Hx), sp.csr_matrix(bad_np), 0.02, 10)


@pytest.mark.parametrize(
    "ctor",
    [
        lambda H: lt.BeliefPropagationDecoder(H, 0.05, 30),
        lambda H: lt.BeliefPropagationOSDDecoder(H, 0.05, 30),
        lambda H: lt.BitFlipDecoder(H, 0.05, 30),
        lambda H: lt.BPOTSDecoder(H, 0.05, 30, T=9, C=2.0),
        lambda H: lt.MinSumDecoder(H, 0.05, 30),
    ],
)
def test_decoders_accept_sparse_cycle(ctor):
    """Live decode through every reference decoder kind with a sparse PCM
    (mirrors /root/reference/test/test_bpots.jl:14-25)."""
    H = cycle_matrix(8)
    dec = ctor(sp.csr_matrix(H))
    err = np.zeros(8, np.int8)
    err[[1, 4]] = 1
    syn = (H @ err) % 2
    guess, _ = dec.decode(syn)
    assert ((H @ guess) % 2 == syn).all()
