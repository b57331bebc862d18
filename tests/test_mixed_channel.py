"""Per-lane [B, n] channel priors: the mixed erasure+flip channel.

An erased bit carries no channel information — prior p=0.5 (LLR 0,
probability ratio 1).  With per-lane priors a single compiled decoder
handles every lane's erasure pattern: per = where(erasures, 0.5, p).
"""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(240, 6, 3, rng=0)


def _mixed_channel(H, B, p_flip, p_erase, seed):
    rng = np.random.default_rng(seed)
    n = H.shape[1]
    eps = rng.random((B, n)) < p_erase
    flips = rng.random((B, n)) < p_flip
    erased_vals = rng.random((B, n)) < 0.5
    e = np.where(eps, erased_vals, flips)
    syn = ((e @ H.T) % 2).astype(np.int8)
    prior = np.where(eps, 0.5, p_flip)
    return eps, e, syn, prior


@pytest.mark.parametrize("make", [
    lambda H: lt.BeliefPropagationDecoder(H, 0.02, 60),
    lambda H: lt.MinSumDecoder(H, 0.02, 60),
    lambda H: lt.LayeredMinSumDecoder(H, 0.02, 60),
])
def test_per_lane_prior_beats_scalar_on_mixed_channel(code, make):
    H = code
    dec = make(H)
    eps, e, syn, prior = _mixed_channel(H, 96, 0.01, 0.12, 1)
    out_s, conv_s = dec.batch_decode(syn)                # scalar prior
    out_m, conv_m = dec.batch_decode(syn, per=prior)     # lane-aware prior
    exact_s = (out_s.astype(bool) == e).all(axis=1).mean()
    exact_m = (out_m.astype(bool) == e).all(axis=1).mean()
    assert conv_m.mean() >= conv_s.mean()
    assert exact_m > exact_s  # knowing the erasure locations must help
    assert exact_m > 0.85


def test_blockwise_constant_lane_prior_matches_vector(code):
    """[B, n] rows all equal to one [n] vector must decode identically."""
    H = code
    dec = lt.MinSumDecoder(H, 0.02, 40)
    rng = np.random.default_rng(2)
    n = H.shape[1]
    vec = np.full(n, 0.03)
    vec[: n // 3] = 0.08
    e = rng.random((24, n)) < 0.02
    syn = ((e @ H.T) % 2).astype(np.int8)
    out_v, conv_v = dec.batch_decode(syn, per=vec)
    out_b, conv_b = dec.batch_decode(syn, per=np.tile(vec, (24, 1)))
    assert np.array_equal(out_v, out_b)
    assert np.array_equal(conv_v, conv_b)


def test_per_shape_validation(code):
    H = code
    dec = lt.BeliefPropagationDecoder(H, 0.02, 10)
    syn = np.zeros((4, H.shape[0]), np.int8)
    with pytest.raises(ValueError, match="per must be"):
        dec.batch_decode(syn, per=np.full((4, 7), 0.1))
    with pytest.raises(ValueError, match="per must be"):
        dec.batch_decode(syn, per=np.full((2, 3, H.shape[1]), 0.1))


@pytest.mark.parametrize("make", [
    lambda H: lt.MinSumDecoder(H, 0.02, 60),
    lambda H: lt.BeliefPropagationDecoder(H, 0.02, 60),
    lambda H: lt.LayeredMinSumDecoder(H, 0.02, 60),
])
def test_decode_soft_awgn_waterfall(code, make):
    """Soft-input codeword decoding (BPSK/AWGN, zero codeword): the
    decoded BER must collapse well below the raw channel BER, and soft
    inputs must beat hard-decision decoding of the same received words."""
    H = code
    dec = make(H)
    rng = np.random.default_rng(0)
    B, n = 128, H.shape[1]
    sigma = 10 ** (-4.0 / 20)  # 4 dB
    y = 1.0 + sigma * rng.standard_normal((B, n))
    llrs = 2.0 * y / sigma**2
    cw, ok = lt.decode_soft(dec, llrs)
    raw_ber = (y < 0).mean()
    assert raw_ber > 0.03
    assert cw.mean() < raw_ber / 20
    assert ok.mean() > 0.95
    # hard-decision baseline: same hard words, scalar prior at the raw BER
    hard = (y < 0).astype(np.int8)
    syn = ((hard @ H.T) % 2).astype(np.int8)
    err_h, ok_h = dec.batch_decode(syn, per=float(raw_ber))
    ber_hard = (hard ^ err_h).mean()
    assert cw.mean() <= ber_hard
    assert ok.mean() >= ok_h.mean()


def test_decode_soft_validation(code):
    H = code
    dec = lt.MinSumDecoder(H, 0.02, 10)
    with pytest.raises(ValueError, match="llrs of shape"):
        lt.decode_soft(dec, np.zeros((4, 7)))
    # noiseless input decodes to the all-zero codeword instantly
    cw, ok = lt.decode_soft(dec, np.full((4, H.shape[1]), 30.0))
    assert ok.all() and cw.sum() == 0


def test_per_lane_batch_mismatch_rejected(code):
    H = code
    dec = lt.MinSumDecoder(H, 0.02, 10)
    syn = np.zeros((4, H.shape[0]), np.int8)
    with pytest.raises(ValueError, match="per-lane prior batch"):
        dec.batch_decode(syn, per=np.full((8, H.shape[1]), 0.1))
