"""Bucketed serving-wrapper tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(120, 6, 3, rng=61)


def test_bucketed_matches_inner(code):
    H = code
    rng = np.random.default_rng(1)
    inner = lt.BeliefPropagationDecoder(H, 0.02, 30)
    buck = lt.BucketedDecoder(inner, min_bucket=16, max_bucket=64)
    for B in (1, 7, 16, 33, 150):
        errs = rng.random((B, H.shape[1])) < 0.02
        syns = (errs @ H.T) % 2
        e_ref, c_ref = inner.batch_decode(syns)
        e_b, c_b = buck.batch_decode(syns)
        assert np.array_equal(e_ref, e_b), f"B={B}"
        assert np.array_equal(c_ref, c_b), f"B={B}"


def test_bucketed_bounds_compiles(code):
    """Only power-of-two bucket shapes ever reach the inner decoder."""
    H = code
    seen = []
    inner = lt.MinSumDecoder(H, 0.02, 20)
    orig = inner._decode_batch

    def spy(syndromes, seed=0):
        seen.append(np.asarray(syndromes).shape[0])
        return orig(syndromes, seed)

    inner._decode_batch = spy
    buck = lt.BucketedDecoder(inner, min_bucket=8, max_bucket=32)
    rng = np.random.default_rng(2)
    for B in (3, 9, 20, 70):
        syns = np.zeros((B, H.shape[0]), np.uint8)
        buck.batch_decode(syns)
    assert all(s in (8, 16, 32) for s in seen), seen


def test_bucketed_aux_passthrough(code):
    H = code
    inner = lt.BeliefPropagationDecoder(H, 0.02, 20)
    buck = lt.BucketedDecoder(inner, min_bucket=8, max_bucket=16)
    rng = np.random.default_rng(3)
    errs = rng.random((21, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    e, c, it, aux, stats = buck.batch_decode_detailed(syns)
    assert aux["log_probabs"].shape == (21, H.shape[1])
    assert stats.batch_size == 21


def test_bucketed_forwards_per_override(code):
    """batch_decode(per=...) must reach the inner decoder (advisor finding:
    the wrapper advertised supports_per_override but raised TypeError)."""
    H = code
    inner = lt.BeliefPropagationDecoder(H, 0.02, 30)
    buck = lt.BucketedDecoder(inner, min_bucket=8, max_bucket=32)
    rng = np.random.default_rng(4)
    errs = rng.random((21, H.shape[1])) < 0.05
    syns = (errs @ H.T) % 2
    e_b, c_b = buck.batch_decode(syns, per=0.05)
    e_ref, c_ref = inner.batch_decode(syns, per=0.05)
    assert np.array_equal(e_ref, e_b)
    assert np.array_equal(c_ref, c_b)
    # and a decoder without per support still rejects cleanly
    bf = lt.BucketedDecoder(lt.BitFlipDecoder(H, 0.02, 10), min_bucket=8)
    assert not bf.supports_per_override
    with pytest.raises(ValueError):
        bf.batch_decode(syns, per=0.05)


def test_bucketed_rejects_bad_config(code):
    inner = lt.MinSumDecoder(code, 0.02, 10)
    with pytest.raises(ValueError):
        lt.BucketedDecoder(inner, min_bucket=64, max_bucket=8)
