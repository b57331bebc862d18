"""WindowedDemDecoder: streaming any DEM in bounded memory (round 4).

The key structural property tested: committed rows telescope — if every
window decode is syndrome-consistent within its truncated model (the
staged inner guarantees it via OSD), the concatenated committed
estimate reproduces the ORIGINAL detector record globally.
"""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.spacetime import spacetime_pcm, spacetime_prior
from ldpcdecoders_tpu.models.demwindow import WindowedDemDecoder
from ldpcdecoders_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native host OSD unavailable")


def _toric_stream(R=8, per=0.01, q=0.01, B=32, seed=0):
    H = lt.toric_code_x(3)
    m, n = H.shape
    A = spacetime_pcm(H, R)
    pr = spacetime_prior(n, m, R, per, q)
    rng = np.random.default_rng(seed)
    x = (rng.random((B, A.shape[1])) < pr).astype(np.uint8)
    det = np.asarray((A @ x.T).T % 2, np.uint8)
    return H, np.asarray(A.todense()), pr, x, det, m


def test_windowed_matches_record_globally():
    H, A, pr, x, det, m = _toric_stream()
    wd = WindowedDemDecoder(A, pr, detectors_per_round=m, window=3,
                            commit=1, decoder="staged", max_iters=96,
                            gammas=(0.2,), lam=16, min_bucket=16)
    out, info = wd.decode_detector_stream(det)
    assert info["windows"] > 2
    # telescoping consistency: committed estimate reproduces the record
    rec2 = (out.astype(np.int32) @ A.T) % 2
    np.testing.assert_array_equal(rec2.astype(np.uint8), det)
    # every column committed exactly once: plan covers all mechanisms
    plan_cols = np.concatenate([
        wd._window_model(i)[0][wd._window_model(i)[3]]
        for i in range(len(wd._plan))])
    assert np.array_equal(np.sort(plan_cols), np.arange(A.shape[1]))


def test_windowed_zero_and_single_mechanism():
    H, A, pr, x, det, m = _toric_stream(B=4)
    wd = WindowedDemDecoder(A, pr, detectors_per_round=m, window=3,
                            commit=2, decoder="staged", max_iters=64,
                            gammas=(0.2,), lam=12, min_bucket=16)
    z = np.zeros((2, A.shape[0]), np.uint8)
    out, _ = wd.decode_detector_stream(z)
    assert not out.any()
    # a single mid-stream mechanism decodes to an equivalent record
    one = np.zeros((1, A.shape[1]), np.uint8)
    one[0, A.shape[1] // 2] = 1
    det1 = np.asarray((A @ one.T).T % 2, np.uint8)
    o1, _ = wd.decode_detector_stream(det1)
    np.testing.assert_array_equal(
        (o1.astype(np.int32) @ A.T) % 2, det1.astype(np.int32))


def test_windowed_bulk_windows_share_one_decoder():
    H, A, pr, *_ , m = _toric_stream(R=12)
    wd = WindowedDemDecoder(A, pr, detectors_per_round=m, window=3,
                            commit=1, decoder="staged", max_iters=32,
                            gammas=(0.2,), lam=8, min_bucket=16)
    for i in range(len(wd._plan)):
        cols, A_w, pr_w, cm = wd._window_model(i)
        wd._decoder_for(A_w, pr_w)
    # 12 rounds, W=3, C=1: ~10 windows but only boundary structures
    # differ -> a handful of distinct compiled decoders
    assert len(wd._dec_cache) <= 4, len(wd._dec_cache)


def test_windowed_validation():
    H, A, pr, *_ , m = _toric_stream()
    with pytest.raises(ValueError, match="divide"):
        WindowedDemDecoder(A, pr, detectors_per_round=m + 1)
    with pytest.raises(ValueError, match="commit"):
        WindowedDemDecoder(A, pr, detectors_per_round=m, window=3,
                           commit=3)
    # a mechanism spanning 3 rounds cannot stream at W=3, C=2
    # (overlap W-C+1=2 < span): commits would truncate live evidence
    A3 = np.zeros((8, 3), np.uint8)
    A3[0, 0] = A3[2, 0] = A3[4, 0] = 1  # rounds 0..2 (r=2)
    A3[1, 1] = A3[3, 2] = 1
    with pytest.raises(ValueError, match="spans"):
        WindowedDemDecoder(A3, np.full(3, 0.01),
                           detectors_per_round=2, window=3, commit=2)


def test_windowed_observables_against_joint():
    """LER proximity: windowed decode within a loose band of the joint
    whole-experiment decode on the toric space-time model."""
    from ldpcdecoders_tpu.models.staged import StagedDemDecoder

    H, A, pr, x, det, m = _toric_stream(R=6, per=0.02, q=0.02, B=128,
                                        seed=3)
    n = H.shape[1]
    # observables: net data error on each logical support (crude: total
    # parity of every data-qubit column across rounds)
    R = A.shape[0] // m
    O = np.zeros((1, A.shape[1]), np.uint8)
    O[0, : R * n : n] = 1  # data-qubit 0's error across all rounds
    wd = WindowedDemDecoder(A, pr, detectors_per_round=m, window=4,
                            commit=2, observables=O, decoder="staged",
                            max_iters=96, gammas=(0.2,), lam=16,
                            min_bucket=16)
    joint = StagedDemDecoder(A, pr, observables=O, gammas=(0.2,),
                             stage0_iters=32, deep_iters=96, lam=16,
                             min_bucket=16)
    fw, _ = wd.predict_observables(det)
    fj, _ = joint.predict_observables(det)
    ow = (fw != ((x @ O.T) & 1)).any(axis=1).mean()
    oj = (fj != ((x @ O.T) & 1)).any(axis=1).mean()
    assert abs(ow - oj) <= 0.1  # same ballpark on 128 shots
