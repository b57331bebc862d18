"""Min-sum production decoder tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(240, 8, 4, rng=29)


def test_minsum_single_recovery(code):
    H = code
    rng = np.random.default_rng(1)
    err_true = rng.random(H.shape[1]) < 0.01
    syn = (H @ err_true) % 2
    dec = lt.MinSumDecoder(H, 0.01, 100)
    guess, success = dec.decode(syn)
    assert success
    assert np.array_equal(guess.astype(bool), err_true)


def test_minsum_batch_ler(code):
    H = code
    rng = np.random.default_rng(2)
    trials = 200
    errs = rng.random((trials, H.shape[1])) < 0.01
    syns = (errs @ H.T) % 2
    dec = lt.MinSumDecoder(H, 0.01, 100)
    guesses, conv = dec.batch_decode(syns)
    exact = (guesses.astype(bool) == errs).all(axis=1)
    assert 1.0 - exact.mean() < 0.02


def test_minsum_normalized_variant(code):
    H = code
    rng = np.random.default_rng(3)
    errs = rng.random((32, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    dec = lt.MinSumDecoder(H, 0.02, 100, alpha=0.8)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    for b in np.flatnonzero(conv):
        assert np.array_equal(synhat[b], syns[b])


def test_minsum_zero_syndrome(code):
    dec = lt.MinSumDecoder(code, 0.01, 10)
    guess, success = dec.decode(np.zeros(code.shape[0], dtype=np.uint8))
    assert success and not guess.any()


def test_minsum_irregular_graph():
    H = lt.toric_code_x(3)
    rng = np.random.default_rng(4)
    errs = rng.random((16, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    dec = lt.MinSumDecoder(H, 0.02, 50)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    for b in np.flatnonzero(conv):
        assert np.array_equal(synhat[b], syns[b])
