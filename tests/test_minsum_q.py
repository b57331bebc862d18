"""Quantized (int8) min-sum decoder tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(240, 8, 4, rng=31)


def test_q_minsum_single_recovery(code):
    H = code
    rng = np.random.default_rng(1)
    err_true = rng.random(H.shape[1]) < 0.01
    syn = (H @ err_true) % 2
    dec = lt.QuantizedMinSumDecoder(H, 0.01, 100)
    guess, success = dec.decode(syn)
    assert success
    assert np.array_equal(guess.astype(bool), err_true)


def test_q_minsum_batch_ler(code):
    H = code
    rng = np.random.default_rng(2)
    trials = 200
    errs = rng.random((trials, H.shape[1])) < 0.01
    syns = (errs @ H.T) % 2
    dec = lt.QuantizedMinSumDecoder(H, 0.01, 100)
    guesses, conv = dec.batch_decode(syns)
    exact = (guesses.astype(bool) == errs).all(axis=1)
    assert 1.0 - exact.mean() < 0.02


def test_q_minsum_ler_close_to_float(code):
    """Quantization must not measurably degrade FER at moderate noise."""
    H = code
    rng = np.random.default_rng(3)
    trials = 200
    errs = rng.random((trials, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    f = lt.MinSumDecoder(H, 0.02, 100)
    q = lt.QuantizedMinSumDecoder(H, 0.02, 100)
    gf, cf = f.batch_decode(syns)
    gq, cq = q.batch_decode(syns)
    ler_f = 1.0 - (gf.astype(bool) == errs).all(axis=1).mean()
    ler_q = 1.0 - (gq.astype(bool) == errs).all(axis=1).mean()
    assert abs(ler_q - ler_f) < 0.05, (ler_f, ler_q)


def test_q_minsum_syndrome_consistency_on_converged(code):
    H = code
    rng = np.random.default_rng(4)
    errs = rng.random((64, H.shape[1])) < 0.03
    syns = (errs @ H.T) % 2
    dec = lt.QuantizedMinSumDecoder(H, 0.03, 50)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    for b in np.flatnonzero(conv):
        assert np.array_equal(synhat[b], syns[b])


def test_q_minsum_offset_variant(code):
    dec = lt.QuantizedMinSumDecoder(code, 0.01, 50, beta_q=1)
    guess, success = dec.decode(np.zeros(code.shape[0], dtype=np.uint8))
    assert success and not guess.any()
