"""Circuit-level tier: memory circuits, exact DEM extraction, fixtures.

The rigor ladder (VERDICT r2 item 3 — no more toy DEMs):

1. the frame engine's noiseless assumptions are verified against an
   independent CHP tableau simulator (golden/tableau.py);
2. single Pauli faults injected as REAL gates into the tableau oracle
   reproduce the frame-propagated detector/observable footprints
   exactly;
3. sampled detector marginals match the closed-form XOR-of-Bernoullis
   prediction computed from the extracted DEM;
4. committed surface-code DEM fixtures (tests/fixtures/*.dem) parse,
   decode, and order correctly with noise;
5. unflattened repeat/shift_detectors models parse identically to
   their flattened twins.
"""

import os

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.circuit import (
    _cx_layers,
    _enumerate_faults,
    _frame_pass,
    circuit_dem,
    css_memory_circuit,
    dem_text,
    sample_circuit,
)
from ldpcdecoders_tpu.golden.tableau import run_circuit
from ldpcdecoders_tpu.models.detector import DetectorGraphDecoder, load_dem

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _surface(d):
    return lt.surface_code_x(d), lt.surface_code_z(d)


# ---------------------------------------------------------------- structure


def test_detector_and_measurement_counts():
    """Rotated memory-z: D = (R+1)*mz + (R-1)*mx = R*(d^2-1) detectors
    (stim's rotated_memory_z count), M = R*(mz+mx) + n measurements."""
    for d, R in [(3, 1), (3, 3), (5, 2)]:
        Hx, Hz = _surface(d)
        c = css_memory_circuit(Hx, Hz, R, p=0.001)
        mz, mx, n = Hz.shape[0], Hx.shape[0], Hx.shape[1]
        assert len(c.detectors) == (R + 1) * mz + (R - 1) * mx == R * (d * d - 1)
        assert c.n_meas == R * (mz + mx) + n
        assert len(c.observables) == 1


def test_cx_layers_are_disjoint_and_cover():
    H = lt.surface_code_z(5)
    layers = _cx_layers(H)
    seen = set()
    for anc, dat in layers:
        # one gate per ancilla and per data qubit within a layer
        assert len(np.unique(anc)) == len(anc)
        assert len(np.unique(dat)) == len(dat)
        seen |= set(zip(anc.tolist(), dat.tolist()))
    H = np.asarray(H)
    assert seen == {(a, q) for a in range(H.shape[0])
                    for q in np.flatnonzero(H[a])}
    assert len(layers) == int(H.sum(axis=1).max())  # König-optimal here


def test_non_css_pair_rejected():
    Hx, _ = _surface(3)
    with pytest.raises(ValueError, match="CSS"):
        css_memory_circuit(Hx, Hx, 2, p=0.01)


# ------------------------------------------------- tableau-oracle exactness


def test_noiseless_detectors_deterministically_zero():
    """All detectors and observables of the noiseless circuit evaluate
    to 0 in the full stabilizer simulation, for every RNG resolution of
    the random (first-round X ancilla) measurements — the assumption
    the Pauli-frame engine is built on."""
    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 2, p=0.01)  # noise ops are skipped
    for s in range(4):
        _, dv, ov, _ = run_circuit(c, rng=np.random.default_rng(s))
        assert not dv.any()
        assert not ov.any()


def test_single_fault_footprints_match_tableau():
    """Inject elementary faults as real Pauli gates into the tableau
    oracle: flipped detectors/observables must equal the frame engine's
    footprint, fault by fault."""
    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 2, p=0.01)
    probs, inject = _enumerate_faults(c)

    def seed(i, op, X, Z):
        if i in inject:
            rows, qs, xs, zs = inject[i]
            X[rows, qs] ^= xs
            Z[rows, qs] ^= zs

    flips = _frame_pass(c, len(probs), seed)
    Dinc, Oinc = c.meas_maps()
    det_fp = np.asarray((flips @ Dinc.T).todense()) & 1
    obs_fp = np.asarray((flips @ Oinc.T).todense()) & 1

    fault_paulis: dict[int, list] = {}
    for opi, (rows, qs, xs, zs) in inject.items():
        for r, q, x, z in zip(rows, qs, xs, zs):
            fault_paulis.setdefault(int(r), []).append(
                (opi, int(q), bool(x), bool(z)))

    rng = np.random.default_rng(3)
    for f in rng.choice(len(probs), size=60, replace=False):
        _, dv, ov, _ = run_circuit(
            c, rng=np.random.default_rng(11), inject=fault_paulis[int(f)])
        np.testing.assert_array_equal(dv, det_fp[f])
        np.testing.assert_array_equal(ov, obs_fp[f])


def test_sampled_marginals_match_dem_closed_form():
    """P(detector fires) = (1 - prod_j (1 - 2 p_j)) / 2 over the DEM's
    incident mechanisms (XOR of independent Bernoullis) — the sampler
    must land on it."""
    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 3, p=0.004)
    A, pr, _ = circuit_dem(c)
    Ad = np.asarray(A.todense())
    exact = (1 - np.prod(1 - 2 * pr[None, :] * Ad, axis=1)) / 2
    det, _ = sample_circuit(c, 60_000, seed=5)
    assert np.abs(det.mean(axis=0) - exact).max() < 0.006


def test_dem_text_round_trips_through_load_dem():
    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 2, p=0.003)
    A0, p0, O0 = circuit_dem(c)
    A1, p1, O1 = load_dem(dem_text(c))
    np.testing.assert_array_equal(
        np.asarray(A0.todense()), np.asarray(A1.todense()))
    np.testing.assert_allclose(p0, p1, rtol=1e-9)
    np.testing.assert_array_equal(O0, O1)


def test_basis_x_is_the_dual_experiment():
    Hx, Hz = _surface(3)
    cz = css_memory_circuit(Hx, Hz, 2, p=0.002, basis="z")
    cx = css_memory_circuit(Hx, Hz, 2, p=0.002, basis="x")
    # dual: Z/X stabilizer roles swap, so detector counts swap too
    mz, mx = Hz.shape[0], Hx.shape[0]
    assert len(cx.detectors) == 3 * mx + 1 * mz
    assert len(cz.detectors) == 3 * mz + 1 * mx
    for s in range(2):
        _, dv, ov, _ = run_circuit(cx, rng=np.random.default_rng(s))
        assert not dv.any() and not ov.any()


# -------------------------------------------------------------- fixtures


def test_fixture_dems_parse_and_decode():
    dec = DetectorGraphDecoder.from_dem(
        os.path.join(FIXDIR, "surface_d3_r3_p002.dem"), 40)
    assert dec.D == 24 and dec.O.shape == (1, dec.N)
    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 3, p=0.002)
    det, obs = sample_circuit(c, 1024, seed=7)
    pred, conv = dec.predict_observables(det, seed=1)
    ler = (pred != obs).any(axis=1).mean()
    assert ler < 0.05  # ~0.008 typical; generous statistical headroom
    assert conv.mean() > 0.9


def test_fixture_noise_ordering():
    """More circuit noise -> more predicted-vs-actual disagreement,
    decoded from the matching fixture DEM each time."""
    Hx, Hz = _surface(3)
    lers = {}
    for p, name in [(0.002, "surface_d3_r3_p002"),
                    (0.005, "surface_d3_r3_p005")]:
        dec = DetectorGraphDecoder.from_dem(
            os.path.join(FIXDIR, name + ".dem"), 40)
        det, obs = sample_circuit(
            css_memory_circuit(Hx, Hz, 3, p=p), 4096, seed=9)
        pred, _ = dec.predict_observables(det, seed=2)
        lers[p] = (pred != obs).any(axis=1).mean()
    assert lers[0.005] > 2 * lers[0.002]


def test_fixture_d5_structure():
    A, pr, O = load_dem(os.path.join(FIXDIR, "surface_d5_r5_p002.dem"))
    assert A.shape[0] == 120  # R * (d^2 - 1)
    assert O.shape[0] == 1
    assert 0 < pr.min() and pr.max() < 1


def test_unflattened_fixture_equals_flattened():
    A1, p1, O1 = load_dem(os.path.join(
        FIXDIR, "repetition_r4_unflattened.dem"))
    A2, p2, O2 = load_dem(os.path.join(
        FIXDIR, "repetition_r4_flattened.dem"))
    np.testing.assert_array_equal(
        np.asarray(A1.todense()), np.asarray(A2.todense()))
    np.testing.assert_allclose(p1, p2)


# -------------------------------------------- repeat/shift_detectors parser


def test_repeat_shift_detectors_semantics():
    unflat = """
    error(0.1) D0
    repeat 3 {
        error(0.1) D0 D1
        shift_detectors(0, 1) 1
    }
    error(0.1) D0 D1
    """
    A, p, _ = load_dem(unflat)
    assert A.shape == (5, 5)
    Ad = np.asarray(A.todense())
    # chain structure: D0 | D0 D1 | D1 D2 | D2 D3 | D3 D4
    assert Ad.sum() == 9
    for j in range(1, 5):
        assert Ad[j - 1: j + 1, :].sum(axis=0).max() == 2


def test_nested_repeat_blocks():
    A, p, _ = load_dem(
        "repeat 2 {\nrepeat 2 {\nerror(0.01) D0\nshift_detectors 1\n}\n}\n")
    assert A.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(A.todense()), np.eye(4))


@pytest.mark.parametrize("bad", [
    "repeat 2 {\nerror(0.1) D0",     # unterminated block
    "}\nerror(0.1) D0",              # unmatched brace
    "shift_detectors x\nerror(0.1) D0",  # malformed shift
    "repeat two {\nerror(0.1) D0\n}",    # malformed count
])
def test_malformed_block_structure_rejected(bad):
    with pytest.raises(ValueError):
        load_dem(bad)


# ------------------------------------------------------- evaluation sweep


def test_dem_logical_sweep_modes_agree():
    """Device DEM-sampling, host DEM-sampling, and circuit-frame
    sampling are three draws of the same XOR-of-mechanisms model: the
    rates must agree within CI (they share no RNG bits)."""
    from ldpcdecoders_tpu.harness import dem_logical_sweep

    Hx, Hz = _surface(3)
    c = css_memory_circuit(Hx, Hz, 3, p=0.004)
    txt = dem_text(c)
    dev = dem_logical_sweep(txt, shots=6144, batch=2048, seed=5, rounds=3)
    host = dem_logical_sweep(txt, shots=6144, batch=2048, seed=6,
                             on_device=False)
    circ = dem_logical_sweep(txt, shots=6144, batch=2048, seed=7, circuit=c)
    assert dev["device_sampled"] and not host["device_sampled"]
    assert not circ["device_sampled"]
    lo, hi = dev["logical_ci95"]
    assert 0.5 * lo < host["logical_rate"] < 2 * hi
    assert 0.5 * lo < circ["logical_rate"] < 2 * hi
    assert 0 < dev["per_round_rate"] < dev["logical_rate"]
    # deterministic reruns
    dev2 = dem_logical_sweep(txt, shots=6144, batch=2048, seed=5, rounds=3)
    assert dev2["logical_rate"] == dev["logical_rate"]


def test_cli_logical_dem(capsys):
    import json

    from ldpcdecoders_tpu.cli import main

    main(["logical", "--dem",
          os.path.join(FIXDIR, "surface_d3_r3_p002.dem"),
          "--trials", "1024", "--rounds", "3", "--max-iters", "30"])
    out = json.loads(capsys.readouterr().out)
    assert out["shots"] == 1024 and "per_round_rate" in out


# -------------------------------------------------- physical sanity checks


def test_logical_error_grows_with_rounds():
    """Memory decay: at fixed circuit noise, more rounds mean more
    fault opportunities, so the per-experiment LER must grow with R.

    (An earlier draft asserted circuit-level > phenomenological at
    equal p; measured, the OPPOSITE holds here — the DEM decoder works
    the two detector species JOINTLY with correlation-aware Y-error
    hyperedge mechanisms, while spacetime_logical_sweep decodes the
    two blocks independently — so that ordering is a property of the
    decoders, not the noise, and is documented in the circuit-level
    benchmark artifact instead of asserted.)"""
    Hx, Hz = _surface(3)
    p = 0.004
    lers = {}
    for R in (1, 4):
        c = css_memory_circuit(Hx, Hz, R, p=p)
        dec = DetectorGraphDecoder.from_dem(dem_text(c), 40)
        det, obs = sample_circuit(c, 4096, seed=13)
        pred, _ = dec.predict_observables(det, seed=3)
        lers[R] = (pred != obs).any(axis=1).mean()
    assert lers[4] > 2 * lers[1], lers


def test_cli_dem_roundtrip(tmp_path, capsys):
    import json

    from ldpcdecoders_tpu.cli import main

    out = str(tmp_path / "m.dem")
    main(["dem", "--code", "surface:3", "--rounds", "2", "--p", "0.004",
          "--out", out])
    meta = json.loads(capsys.readouterr().out)
    assert meta["detectors"] == 16 and meta["observables"] == 1
    # the emitted file equals the library-built model
    Hx, Hz = _surface(3)
    A0, p0, O0 = circuit_dem(css_memory_circuit(Hx, Hz, 2, p=0.004))
    A1, p1, O1 = load_dem(out)
    np.testing.assert_array_equal(
        np.asarray(A0.todense()), np.asarray(A1.todense()))
    np.testing.assert_allclose(p0, p1, rtol=1e-9)
    # and decodes through the logical --dem path
    main(["logical", "--dem", out, "--trials", "256", "--rounds", "2",
          "--max-iters", "20"])
    res = json.loads(capsys.readouterr().out)
    assert res["shots"] == 256


@pytest.mark.slow
def test_bb144_circuit_vs_dem_statistics():
    """bb144-scale extractor guard (VERDICT r3 item 5): circuit-sampled
    detector marginals, observable-flip marginals, and detector-pair
    XOR rates must match the exact DEM closed forms (XORs of
    independent Bernoullis).  Surface d3 already has the decoded
    agreement check; this catches footprint bugs at the scale where
    they would silently corrupt the flagship curve, without needing a
    decoder in the loop."""
    Hx, Hz, *_ = lt.named_bicycle_code("bb144")
    c = css_memory_circuit(Hx, Hz, 6, p=0.003)
    A, pr, O = circuit_dem(c)
    Ad = np.asarray(A.todense())
    D, N = Ad.shape
    assert (D, N) == (864, 31648)
    shots = 8192
    det, obs = sample_circuit(c, shots, seed=3)

    # detector marginals, z <= 4.5 per cell (Bonferroni across 864)
    exact_d = (1 - np.prod(1 - 2 * pr[None, :] * Ad, axis=1)) / 2
    emp_d = det.mean(axis=0)
    sig = np.sqrt(np.maximum(exact_d * (1 - exact_d), 1e-9) / shots)
    z = np.abs(emp_d - exact_d) / sig
    assert z.max() < 4.5, f"detector marginal z={z.max():.1f}"

    # observable-flip marginals
    Od = np.asarray(O)
    exact_o = (1 - np.prod(1 - 2 * pr[None, :] * Od, axis=1)) / 2
    emp_o = obs.mean(axis=0)
    sig_o = np.sqrt(np.maximum(exact_o * (1 - exact_o), 1e-9) / shots)
    assert (np.abs(emp_o - exact_o) / sig_o).max() < 4.5

    # pairwise detector XOR rates on 128 random pairs: catches footprint
    # misalignments that single-detector marginals cannot see
    rng = np.random.default_rng(7)
    i = rng.integers(0, D, 128)
    j = (i + rng.integers(1, D, 128)) % D
    diff = Ad[i] ^ Ad[j]
    exact_p = (1 - np.prod(1 - 2 * pr[None, :] * diff, axis=1)) / 2
    emp_p = (det[:, i] ^ det[:, j]).mean(axis=0)
    sig_p = np.sqrt(np.maximum(exact_p * (1 - exact_p), 1e-9) / shots)
    assert (np.abs(emp_p - exact_p) / sig_p).max() < 4.5
