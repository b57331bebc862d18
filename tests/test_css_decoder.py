"""CSS-pair decoder + TannerGraph persistence tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.graph import TannerGraph
from ldpcdecoders_tpu.utils import save_graph_npz, load_graph_npz


def test_css_decoder_toric():
    d = 3
    Hx, Hz = lt.toric_code_x(d), lt.toric_code_z(d)
    rng = np.random.default_rng(1)
    B = 32
    z_err_true = rng.random((B, Hx.shape[1])) < 0.03  # detected by Hx
    x_err_true = rng.random((B, Hz.shape[1])) < 0.03  # detected by Hz
    syn_x = (z_err_true @ Hx.T) % 2
    syn_z = (x_err_true @ Hz.T) % 2

    dec = lt.CSSDecoder(Hx, Hz, per=0.03, max_iters=50, decoder="bposd")
    z_err, x_err, z_conv, x_conv = dec.batch_decode(syn_x, syn_z)
    assert (((z_err.astype(int) @ Hx.T) % 2) == syn_x).all()
    assert (((x_err.astype(int) @ Hz.T) % 2) == syn_z).all()


def test_css_decoder_single_and_bpots():
    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    rng = np.random.default_rng(2)
    ze = rng.random(Hx.shape[1]) < 0.03
    xe = rng.random(Hz.shape[1]) < 0.03
    dec = lt.CSSDecoder(Hx, Hz, per=0.03, max_iters=50, decoder="bpots", C=3.0)
    z, x, okz, okx = dec.decode((Hx @ ze) % 2, (Hz @ xe) % 2)
    assert np.array_equal((Hx @ z.astype(int)) % 2, (Hx @ ze) % 2)
    assert np.array_equal((Hz @ x.astype(int)) % 2, (Hz @ xe) % 2)


def test_css_decoder_rejects_non_css_pair():
    H1 = lt.parity_check_matrix(24, 6, 3, rng=1)
    with pytest.raises(ValueError, match="CSS condition"):
        lt.CSSDecoder(H1, H1, per=0.01, max_iters=10)
    with pytest.raises(ValueError, match="same qubits"):
        lt.CSSDecoder(lt.toric_code_x(2), lt.toric_code_z(3), per=0.01, max_iters=10)


def test_css_decoder_hgp_with_vector_prior():
    H1 = lt.parity_check_matrix(12, 4, 2, rng=4)
    Hx, Hz = lt.hypergraph_product(H1, H1)
    n = Hx.shape[1]
    prior = np.full(n, 0.02)
    dec = lt.CSSDecoder(Hx, Hz, per=prior, max_iters=50, decoder="bp")
    rng = np.random.default_rng(5)
    ze = rng.random((8, n)) < 0.02
    xe = rng.random((8, n)) < 0.02
    z, x, zc, xc = dec.batch_decode((ze @ Hx.T) % 2, (xe @ Hz.T) % 2)
    synx = (z.astype(int) @ Hx.T) % 2
    for b in np.flatnonzero(zc):
        assert np.array_equal(synx[b], (ze[b] @ Hx.T) % 2)


def test_graph_npz_roundtrip(tmp_path):
    H = lt.parity_check_matrix(120, 6, 3, rng=6)
    # dense graph
    g = TannerGraph.from_pcm(H)
    p = str(tmp_path / "g.npz")
    save_graph_npz(p, g)
    g2 = load_graph_npz(p)
    for f in ("chk_vars", "chk_mask", "var_chks", "var_mask", "c2v_gather", "v2c_gather", "H"):
        assert np.array_equal(getattr(g, f), getattr(g2, f)), f
    # dense-free graph round-trips with H=None and still decodes
    rows, cols = np.nonzero(H)
    gs = TannerGraph.from_edges(rows, cols, *H.shape)
    p2 = str(tmp_path / "gs.npz")
    save_graph_npz(p2, gs)
    gs2 = load_graph_npz(p2)
    assert gs2.H is None
    dec = lt.MinSumDecoder(gs2, 0.01, 30)
    e, c = dec.decode(np.zeros(H.shape[0], np.uint8))
    assert c and not e.any()
