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


# ---------------------------------------------------------------------------
# MixedChannelDecoder: the combined peel -> prior-BP (-> OSD) pipeline
# ---------------------------------------------------------------------------


def test_mixed_decoder_recovers_mixed_channel(code):
    H = code
    dec = lt.MixedChannelDecoder(H, 0.01, 60)
    eps, e, syn, _ = _mixed_channel(H, 96, 0.01, 0.10, 3)
    err, ok, rounds, bp_iters = dec.batch_decode_detailed(syn, eps)
    exact = (err.astype(bool) == e).all(axis=1)
    assert exact.mean() > 0.85
    # every ok lane is exactly syndrome-consistent
    synhat = (err.astype(np.int64) @ H.T) % 2
    assert (synhat[ok] == syn[ok]).all()
    assert bp_iters > 0  # flips force the BP stage


def test_mixed_decoder_erasure_only_skips_bp(code):
    """A batch whose every lane peels clean must never pay for BP."""
    H = code
    n = H.shape[1]
    dec = lt.MixedChannelDecoder(H, 0.01, 60)
    rng = np.random.default_rng(4)
    # low erasure rate -> no stopping sets on this (6,3) code
    eps = rng.random((64, n)) < 0.03
    e = np.where(eps, rng.random((64, n)) < 0.5, False)
    syn = ((e @ H.T) % 2).astype(np.int8)
    err, ok, rounds, bp_iters = dec.batch_decode_detailed(syn, eps)
    if bool(ok.all()):  # no stopping set in this stream (expected)
        assert bp_iters == 0
        assert (err.astype(bool) == e).all()
    # and it agrees with the dedicated erasure decoder
    ref = lt.ErasurePeelingDecoder(H, on_stuck="fail")
    err_p, ok_p = ref.batch_decode(syn, eps)
    assert np.array_equal(ok, ok_p)
    assert np.array_equal(err[ok], err_p[ok_p])


def test_mixed_decoder_osd_completion_closes_stopping_sets(code):
    """osd_order=0: output is syndrome-consistent on every solvable lane,
    matching the pure-erasure decoder's exact GF(2) completion power."""
    H = code
    n = H.shape[1]
    dec = lt.MixedChannelDecoder(H, 0.01, 60, osd_order=0)
    rng = np.random.default_rng(5)
    eps = rng.random((64, n)) < 0.12  # high enough for stopping sets
    e = np.where(eps, rng.random((64, n)) < 0.5, rng.random((64, n)) < 0.01)
    syn = ((e @ H.T) % 2).astype(np.int8)
    err, ok = dec.batch_decode(syn, eps)
    assert ok.all()
    synhat = (err.astype(np.int64) @ H.T) % 2
    assert (synhat == syn).all()


@pytest.mark.parametrize("algorithm", ["minsum", "sumproduct"])
def test_mixed_decoder_strategies_agree_on_ok_lanes(code, algorithm):
    """peel+bp and plain prior-BP must reach syndrome-consistent answers
    on the same channel; peel+bp may only improve convergence."""
    H = code
    eps, e, syn, _ = _mixed_channel(H, 64, 0.01, 0.08, 6)
    d_pb = lt.MixedChannelDecoder(H, 0.01, 60, algorithm=algorithm)
    d_bp = lt.MixedChannelDecoder(H, 0.01, 60, algorithm=algorithm, strategy="bp")
    err1, ok1 = d_pb.batch_decode(syn, eps)
    err2, ok2 = d_bp.batch_decode(syn, eps)
    assert ok1.mean() >= ok2.mean()
    for err, ok in ((err1, ok1), (err2, ok2)):
        synhat = (err.astype(np.int64) @ H.T) % 2
        assert (synhat[ok] == syn[ok]).all()


def test_mixed_decoder_dense_free_graph(code):
    """peel+bp runs on a from_edges graph (no dense H materialized)."""
    H = code
    rows, cols = np.nonzero(H)
    graph = lt.TannerGraph.from_edges(rows, cols, *H.shape)
    dec = lt.MixedChannelDecoder(graph, 0.01, 60)
    eps, e, syn, _ = _mixed_channel(H, 32, 0.005, 0.06, 7)
    err, ok = dec.batch_decode(syn, eps)
    assert ok.mean() > 0.9
    synhat = (err.astype(np.int64) @ H.T) % 2
    assert (synhat[ok] == syn[ok]).all()


def test_mixed_decoder_per_override(code):
    """One compiled program serves every flip rate of a sweep."""
    H = code
    dec = lt.MixedChannelDecoder(H, 0.01, 60)
    eps, e, syn, _ = _mixed_channel(H, 32, 0.02, 0.08, 8)
    err_a, ok_a = dec.batch_decode(syn, eps, per=0.02)
    err_b, ok_b = dec.batch_decode(syn, eps, per=np.full(H.shape[1], 0.02))
    assert np.array_equal(err_a, err_b)
    assert np.array_equal(ok_a, ok_b)


def test_mixed_decoder_validation(code):
    H = code
    with pytest.raises(ValueError, match="algorithm must be"):
        lt.MixedChannelDecoder(H, 0.01, 10, algorithm="nope")
    with pytest.raises(ValueError, match="strategy must be"):
        lt.MixedChannelDecoder(H, 0.01, 10, strategy="nope")
    dec = lt.MixedChannelDecoder(H, 0.01, 10)
    with pytest.raises(ValueError, match="syndromes of shape"):
        dec.batch_decode(np.zeros((4, 7), np.int8), np.zeros((4, H.shape[1]), bool))
    with pytest.raises(ValueError, match="erasures of shape"):
        dec.batch_decode(np.zeros((4, H.shape[0]), np.int8), np.zeros((4, 7), bool))
