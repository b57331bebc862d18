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
