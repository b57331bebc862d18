"""Detector-graph (circuit-level DEM import) decoding tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.spacetime import detectors_of, spacetime_pcm, spacetime_prior
from ldpcdecoders_tpu.models.detector import DetectorGraphDecoder, load_dem
from ldpcdecoders_tpu.models.spacetime import SpaceTimeDecoder
from ldpcdecoders_tpu.utils.noise import sample_errors, syndromes_of


DEM_REP3 = """\
# repetition-code-ish toy model
error(0.05) D0 L0
error(0.05) D0 D1
error(0.05) D1 D2
error(0.05) D2 L0
detector D0
detector D1
detector D2
logical_observable L0
"""


def test_load_dem_shapes_and_priors():
    A, priors, O = load_dem(DEM_REP3)
    assert A.shape == (3, 4)
    assert O.shape == (1, 4)
    np.testing.assert_allclose(priors, 0.05)
    # columns sorted by (detector footprint, observable footprint)
    Ad = np.asarray(A.todense())
    assert Ad.sum() == 6
    assert O.sum() == 2


def test_load_dem_merges_duplicate_mechanisms():
    A, priors, O = load_dem("error(0.1) D0 D1\nerror(0.2) D1 D0\n")
    assert A.shape == (2, 1)
    # XOR combination: 0.1*0.8 + 0.2*0.9 = 0.26
    np.testing.assert_allclose(priors, [0.26])


def test_load_dem_ignores_decomposition_and_comments():
    A, priors, O = load_dem(
        "error(0.01) D0 D1 ^ D1 D2 L0  # comment\n// another\n")
    assert A.shape == (3, 1)
    # whole mechanism with parity: D1 appears in both decomposition
    # components, so it cancels (flipped twice = not flipped)
    np.testing.assert_array_equal(np.asarray(A.todense())[:, 0], [1, 0, 1])
    assert O[0, 0] == 1


def test_load_dem_unflattened_and_malformed():
    # repeat/shift_detectors are interpreted since round 3
    # (full semantics in tests/test_circuit.py); junk still rejects
    A, _, _ = load_dem("repeat 5 {\n error(0.1) D0\n}")
    assert A.shape == (1, 1)
    A, _, _ = load_dem("shift_detectors 2\nerror(0.1) D0")
    assert A.shape == (3, 1)  # D0 shifted to D2
    with pytest.raises(ValueError, match="unrecognized"):
        load_dem("banana D0")
    with pytest.raises(ValueError, match="no error mechanisms"):
        load_dem("detector D0")


def test_load_dem_drops_impossible_and_rejects_deterministic():
    # p == 0 mechanisms (stim keeps explicit error(0) lines) are dropped,
    # so from_dem round-trips models that retain them
    A, priors, O = load_dem("error(0) D0 L0\nerror(0.1) D0 D1\n")
    assert A.shape == (2, 1)
    np.testing.assert_allclose(priors, [0.1])
    # footprint-free no-op mechanisms are dropped too
    A2, p2, _ = load_dem("error(0.3)\nerror(0.1) D0\n")
    assert A2.shape == (1, 1)
    # a model that is ONLY impossible mechanisms is empty
    with pytest.raises(ValueError, match="no error mechanisms"):
        load_dem("error(0) D0\n")
    # deterministic mechanisms have no BP prior representation
    with pytest.raises(ValueError, match="deterministic"):
        load_dem("error(1) D0 D1\n")
    # and two p=0.5 copies of a mechanism XOR-merge to 0.5, not 1
    _, p3, _ = load_dem("error(0.5) D0\nerror(0.5) D0\n")
    np.testing.assert_allclose(p3, [0.5])


def test_undetectable_observable_mechanism_warns():
    with pytest.warns(UserWarning, match="invisible to the decoder"):
        load_dem("error(0.01) L0\nerror(0.1) D0 L0\n")
    # direct construction warns too
    A = np.array([[1, 0], [0, 0]], np.uint8)
    O = np.array([[0, 1]], np.uint8)
    with pytest.warns(UserWarning, match="undetectable"):
        DetectorGraphDecoder(A, [0.1, 0.01], 10, observables=O)


def test_detector_decoder_matches_spacetime_on_same_graph():
    """Feeding spacetime_pcm + spacetime_prior through the generic
    detector decoder must reproduce SpaceTimeDecoder bit for bit."""
    H = lt.toric_code_x(3)
    m, n = H.shape
    R, per = 3, 0.01
    A = spacetime_pcm(H, R)
    prior = spacetime_prior(n, m, R, per, per)
    rng = np.random.default_rng(3)
    e = sample_errors(rng, 16 * R, n, per).reshape(16, R, n)
    cum = (np.cumsum(e, 1) & 1).astype(np.uint8)
    syn = np.stack([syndromes_of(H, cum[:, r]) for r in range(R)], 1)
    det = detectors_of(syn)

    g = DetectorGraphDecoder(A, prior, max_iters=40)
    st = SpaceTimeDecoder(H, R, per, max_iters=40)
    x, conv = g.batch_decode(det, seed=4)
    e_st, conv_st, _, aux, _ = st.batch_decode_detailed(det, seed=4)
    np.testing.assert_array_equal(conv, conv_st)
    np.testing.assert_array_equal(
        x[:, : R * n].reshape(16, R, n), np.asarray(aux["data_rounds"]))


def test_predict_observables_end_to_end():
    """Sample mechanisms from the DEM's own priors; the decoder's
    observable prediction should match the true flips almost always at
    these rates."""
    A, priors, O = load_dem(DEM_REP3)
    rng = np.random.default_rng(5)
    B = 512
    x_true = (rng.random((B, A.shape[1])) < priors).astype(np.uint8)
    det = (x_true @ np.asarray(A.todense()).T) & 1
    obs_true = (x_true @ O.T) & 1
    dec = DetectorGraphDecoder(A, priors, max_iters=30, observables=O)
    flips, conv = dec.predict_observables(det)
    assert conv.mean() > 0.95  # BP flag; OSD keeps every lane consistent
    assert (flips == obs_true).mean() > 0.95


def test_from_dem_and_validation(tmp_path):
    p = tmp_path / "model.dem"
    p.write_text(DEM_REP3)
    dec = DetectorGraphDecoder.from_dem(str(p), max_iters=20)
    assert dec.D == 3 and dec.N == 4 and dec.O.shape == (1, 4)
    with pytest.raises(ValueError, match="priors must be"):
        DetectorGraphDecoder(np.eye(3, dtype=np.uint8), [0.1, 0.2], 10)
    with pytest.raises(ValueError, match="strictly in"):
        DetectorGraphDecoder(np.eye(2, dtype=np.uint8), [0.0, 0.5], 10)
    with pytest.raises(ValueError, match="observables"):
        DetectorGraphDecoder(np.eye(2, dtype=np.uint8), [0.1, 0.1], 10,
                             observables=np.zeros((1, 3)))
    with pytest.raises(ValueError, match="prior-capable|cannot honor"):
        DetectorGraphDecoder(np.eye(2, dtype=np.uint8), [0.1, 0.1], 10,
                             decoder="bitflip")
    dec2 = DetectorGraphDecoder(np.eye(2, dtype=np.uint8), [0.1, 0.1], 10)
    with pytest.raises(ValueError, match="no observables"):
        dec2.predict_observables(np.zeros((1, 2), np.uint8))
    with pytest.raises(ValueError, match="detectors"):
        dec2.batch_decode(np.zeros((1, 5), np.uint8))


def test_large_sparse_dem_densifies_for_osd():
    """TannerGraph only auto-attaches dense rows up to 4M entries; a
    circuit-level-scale sparse A must still build a bposd decoder
    (detector.py densifies deliberately) instead of failing require_H."""
    import scipy.sparse as sp

    m, n = 1500, 3000  # 4.5M entries: above the auto-dense threshold
    A = sp.eye(m, n, dtype=np.uint8, format="csr")
    dec = DetectorGraphDecoder(A, np.full(n, 0.01), max_iters=5)
    syn = np.zeros((2, m), np.uint8)
    syn[1, 7] = 1
    x, conv = dec.batch_decode(syn)
    assert conv.all() and x[1, 7] == 1 and x[0].sum() == 0
