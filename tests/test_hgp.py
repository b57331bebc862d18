"""Hypergraph-product code construction + decoding tests."""

import numpy as np

import ldpcdecoders_tpu as lt


def test_hgp_css_condition():
    H1 = lt.parity_check_matrix(24, 6, 3, rng=1)
    H2 = lt.repetition_code(5)
    Hx, Hz = lt.hypergraph_product(H1, H2)
    n_qubits = H1.shape[1] * H2.shape[1] + H1.shape[0] * H2.shape[0]
    assert Hx.shape[1] == Hz.shape[1] == n_qubits
    assert ((Hx.astype(int) @ Hz.astype(int).T) % 2 == 0).all()


def test_hgp_of_repetition_is_toric_like():
    """HGP of two cyclic repetition codes has the toric code's parameters."""
    d = 3
    Hc = lt.cycle_matrix(d)  # cyclic repetition parity checks
    Hx, Hz = lt.hypergraph_product(Hc, Hc)
    assert Hx.shape == (d * d, 2 * d * d)
    assert (Hx.sum(axis=1) == 4).all()


def test_hgp_decoding_with_bposd():
    """End-to-end: decode X-syndromes of an HGP code with BP+OSD."""
    H1 = lt.parity_check_matrix(12, 4, 2, rng=2)
    Hx, Hz = lt.hypergraph_product(H1, H1)
    rng = np.random.default_rng(3)
    B = 16
    errs = rng.random((B, Hx.shape[1])) < 0.02
    syns = (errs @ Hx.T) % 2
    dec = lt.BeliefPropagationOSDDecoder(Hx, 0.02, 50)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ Hx.T) % 2
    assert (synhat == syns).all()


def test_hgp_decoding_with_bpots():
    H1 = lt.parity_check_matrix(12, 4, 2, rng=4)
    Hx, _ = lt.hypergraph_product(H1, H1)
    rng = np.random.default_rng(5)
    B = 32
    errs = rng.random((B, Hx.shape[1])) < 0.01
    syns = (errs @ Hx.T) % 2
    dec = lt.BPOTSDecoder(Hx, 0.01, 50, T=9, C=3.0)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ Hx.T) % 2
    rate = (synhat == syns).all(axis=1).mean()
    assert rate >= 0.85


def test_sparse_hgp_matches_dense():
    """hypergraph_product_edges must produce exactly the dense kron edges."""
    H1 = lt.parity_check_matrix(12, 4, 2, rng=7)
    H2 = lt.repetition_code(5)
    Hx_d, Hz_d = lt.hypergraph_product(H1, H2)
    hx, hz = lt.hypergraph_product_edges(H1, H2)
    for (rows, cols, m, n), Hd in ((hx, Hx_d), (hz, Hz_d)):
        assert (m, n) == Hd.shape
        Hs = np.zeros((m, n), np.uint8)
        Hs[rows, cols] = 1
        assert np.array_equal(Hs, Hd)


def test_sparse_hgp_scales_and_decodes():
    """A ~400k-qubit HGP code builds in seconds from COO and decodes."""
    import time
    from ldpcdecoders_tpu.codes.graph import TannerGraph

    n1, wr, wc = 480, 6, 3
    rng = np.random.default_rng(8)
    block = n1 // wr
    rows = np.concatenate([np.repeat(np.arange(block), wr) + b * block for b in range(wc)])
    cols = np.concatenate([rng.permutation(n1) for _ in range(wc)])
    coo1 = (rows, cols, block * wc, n1)
    t0 = time.perf_counter()
    hx, hz = lt.hypergraph_product_edges(coo1, coo1)
    g = TannerGraph.from_edges(*hx)
    dt = time.perf_counter() - t0
    n_qubits = n1 * n1 + (block * wc) ** 2
    assert g.n == n_qubits and n_qubits > 280_000
    assert dt < 30.0, f"sparse HGP too slow: {dt}s"
    # CSS condition on a random sample of X/Z row pairs (dense check is
    # infeasible at this scale; sampled anticommutation must vanish)
    Hxr, Hxc, mx, _ = hx
    Hzr, Hzc, mz, _ = hz
    import collections
    x_rows = collections.defaultdict(set)
    for r, c in zip(Hxr[:50000], Hxc[:50000]):
        x_rows[r].add(c)
    z_rows = collections.defaultdict(set)
    for r, c in zip(Hzr, Hzc):
        z_rows[r].add(c)
    sample = rng.choice(list(x_rows), size=20, replace=False)
    zkeys = list(z_rows)
    for xr in sample:
        for zr in rng.choice(zkeys, size=20, replace=False):
            assert len(x_rows[xr] & z_rows[zr]) % 2 == 0
    # decode the zero syndrome end-to-end
    dec = lt.MinSumDecoder(g, 0.001, 5)
    e, c = dec.decode(np.zeros(g.m, np.uint8))
    assert c and not e.any()
