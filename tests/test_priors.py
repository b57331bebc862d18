"""Per-bit channel prior support (scalar `per` remains reference-parity)."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(120, 6, 3, rng=47)


def test_vector_prior_equals_scalar_when_uniform(code):
    H = code
    rng = np.random.default_rng(1)
    errs = rng.random((8, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    a = lt.BeliefPropagationDecoder(H, 0.02, 30)
    b = lt.BeliefPropagationDecoder(H, np.full(H.shape[1], 0.02), 30)
    ea, ca = a.batch_decode(syns)
    eb, cb = b.batch_decode(syns)
    assert np.array_equal(ea, eb)
    assert np.array_equal(ca, cb)


def test_vector_prior_biases_decoding(code):
    """A prior that marks the truly-flipped bits as error-prone must make
    decoding at high noise strictly easier."""
    H = code
    n = H.shape[1]
    rng = np.random.default_rng(2)
    errs = rng.random((32, n)) < 0.05
    syns = (errs @ H.T) % 2
    uniform = lt.MinSumDecoder(H, 0.05, 50)
    eu, cu = uniform.batch_decode(syns)
    # oracle prior: high error probability exactly on flipped bits
    for b in range(4):
        prior = np.where(errs[b], 0.4, 0.001)
        informed = lt.MinSumDecoder(H, prior, 50)
        ei, ci = informed.decode(syns[b])
        assert ci
        assert np.array_equal(ei.astype(bool), errs[b])


def test_vector_prior_bpots(code):
    H = code
    n = H.shape[1]
    dec = lt.BPOTSDecoder(H, np.full(n, 0.01), 50)
    err = np.zeros(n, dtype=np.uint8)
    err[3] = 1
    syn = (H @ err) % 2
    g, c = dec.decode(syn)
    assert np.array_equal((H @ g.astype(int)) % 2, syn)


def test_wrong_prior_shape_rejected(code):
    with pytest.raises(ValueError):
        lt.BeliefPropagationDecoder(code, np.full(7, 0.01), 10)
    with pytest.raises(ValueError):
        lt.MinSumDecoder(code, np.full(7, 0.01), 10)
