"""BP-OTS tests (reference oracle: test_bpots.jl — trapping-set cycle
matrices, toric-code syndrome-match thresholds, batch API)."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes import cycle_matrix, toric_code_x
from ldpcdecoders_tpu.golden import bpots_decode as golden_bpots


def _random_syndromes(H, B, rng):
    errs = rng.random((B, H.shape[1])) < 0.5
    return (errs @ H.T) % 2


def test_trapping_set_resistance():
    """Weight-2 errors on cycle matrices (known trapping sets) must decode
    to a matching syndrome across (T, C) configs
    (test_bpots.jl:56-86)."""
    for n in (4, 8, 16):
        H = cycle_matrix(n)
        err = np.zeros(n, dtype=np.uint8)
        err[:2] = 1
        syn = (H @ err) % 2
        for T, C in ((3, 1.0), (5, 2.0), (9, 3.0)):
            dec = lt.BPOTSDecoder(H, 0.01, 100, T=T, C=C)
            guess, converged = dec.decode(syn)
            synhat = (H @ guess.astype(int)) % 2
            assert np.array_equal(synhat, syn), f"n={n} T={T} C={C}"


def test_parameter_sensitivity():
    """Random syndromes on the 4-cycle across T and C grids
    (test_bpots.jl:88-114)."""
    H = cycle_matrix(4)
    rng = np.random.default_rng(4)
    for T in (3, 5, 9, 15):
        syn = _random_syndromes(H, 1, rng)[0]
        dec = lt.BPOTSDecoder(H, 0.01, 100, T=T, C=3.0)
        guess, _ = dec.decode(syn)
        assert np.array_equal((H @ guess.astype(int)) % 2, syn), f"T={T}"
    for C in (1.0, 2.0, 5.0, 10.0):
        syn = _random_syndromes(H, 1, rng)[0]
        dec = lt.BPOTSDecoder(H, 0.01, 100, T=9, C=C)
        guess, _ = dec.decode(syn)
        assert np.array_equal((H @ guess.astype(int)) % 2, syn), f"C={C}"


@pytest.mark.parametrize("noise", [0.01, 0.05, 0.1])
def test_toric_code_syndrome_match_rate(noise):
    """Reference oracle: >= 85% syndrome-match rate on the d=3 toric code
    at each noise level, T=9 C=3.0, max_iters=50 (test_bpots.jl:116-137)."""
    H = toric_code_x(3)
    rng = np.random.default_rng(5)
    B = 100
    syns = _random_syndromes(H, B, rng)
    dec = lt.BPOTSDecoder(H, noise, 50, T=9, C=3.0)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    rate = (synhat == syns).all(axis=1).mean()
    assert rate >= 0.85, f"noise={noise} rate={rate}"


def test_bpots_batch_api():
    H = cycle_matrix(8)
    rng = np.random.default_rng(6)
    syns = _random_syndromes(H, 5, rng)
    dec = lt.BPOTSDecoder(H, 0.01, 100, T=9, C=3.0)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    for i in range(5):
        assert np.array_equal(synhat[i], syns[i])


def test_bpots_matches_golden_behavior():
    """JAX BP-OTS vs the NumPy golden: identical convergence outcomes and
    mismatch counts on a trapping-set-rich graph (bitwise llr equality is
    not expected across float orders; behavior is the contract)."""
    H = cycle_matrix(8)
    rng = np.random.default_rng(7)
    syns = _random_syndromes(H, 10, rng)
    dec = lt.BPOTSDecoder(H, 0.01, 60, T=9, C=2.0)
    guesses, conv = dec.batch_decode(syns)
    for b in range(10):
        g_dec, g_conv = golden_bpots(H, syns[b], 0.01, 60, T=9, C=2.0)
        assert bool(conv[b]) == g_conv, f"lane {b}"
        if g_conv:
            # both converged: both must satisfy the syndrome
            assert np.array_equal((H @ guesses[b].astype(int)) % 2, syns[b])
            assert np.array_equal((H @ g_dec) % 2, syns[b])


def test_bpots_accepts_bool_and_int_syndromes():
    # reference accepts AbstractVector/BitVector inputs (test_bpots.jl:155-167)
    H = cycle_matrix(8)
    err = np.zeros(8, dtype=np.uint8)
    err[:2] = 1
    syn = (H @ err) % 2
    dec = lt.BPOTSDecoder(H, 0.01, 100, T=9, C=3.0)
    g1, _ = dec.decode(syn.astype(bool))
    g2, _ = dec.decode(syn.astype(np.int64))
    assert np.array_equal(g1, g2)
