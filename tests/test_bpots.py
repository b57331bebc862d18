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


def _trace_compare(H, syns, per, max_iters, T, C, *, require_bias):
    """Bitwise per-iteration parity of the f64 JAX trace vs the golden."""
    import jax
    import jax.numpy as jnp

    from ldpcdecoders_tpu import TannerGraph
    from ldpcdecoders_tpu.models.bpots import make_bpots_decode_fn

    graph = TannerGraph.from_pcm(H)
    with jax.enable_x64():
        fn = jax.jit(
            make_bpots_decode_fn(
                graph, per, max_iters, T, C, dtype=jnp.float64, trace=True
            )
        )
        (best, done, iters, llrs), rec = fn(jnp.asarray(syns))
        rec = {k: np.asarray(v) for k, v in rec.items()}
    assert rec["llrs"].dtype == np.float64

    def _tie_equivalent(g, ours, theirs, ctx, *, check_osc):
        """A j1/j2 disagreement is only legitimate on an analytic tie:
        |llr| equal to fp tolerance (and, for j1, identical oscillation
        counts) — libm vs XLA differ in last-ulp, so symmetric graphs can
        order exactly-tied minima differently."""
        absllr = np.abs(np.asarray(g["llrs"]))
        if check_osc:
            osc_g = np.asarray(g["osc"])
            assert osc_g[ours] == osc_g[theirs], ctx
        np.testing.assert_allclose(absllr[ours], absllr[theirs], rtol=1e-9, err_msg=ctx)

    any_bias = False
    for b in range(syns.shape[0]):
        gt = []
        g_best, g_conv = golden_bpots(
            H, syns[b], per, max_iters, T=T, C=C, trace=gt
        )
        diverged = False
        for t, g in enumerate(gt):
            ctx = f"lane {b} iter {t}"
            assert np.array_equal(rec["dec"][t, b], g["dec"]), ctx
            assert np.array_equal(rec["osc"][t, b], g["osc"]), ctx
            assert rec["mis"][t, b] == g["mis"], ctx
            assert rec["weight"][t, b] == g["weight"], ctx
            assert rec["best_mis"][t, b] == g["best_mis"], ctx
            assert rec["best_w"][t, b] == g["best_w"], ctx
            np.testing.assert_allclose(
                rec["llrs"][t, b], g["llrs"], rtol=1e-9, err_msg=ctx
            )
            assert bool(rec["biased"][t, b]) == g["biased"], ctx
            if g["biased"]:
                any_bias = True
                j1, j2 = int(rec["j1"][t, b]), int(rec["j2"][t, b])
                if j1 != g["j1"] or j2 != g["j2"]:
                    if j1 != g["j1"]:
                        _tie_equivalent(g, j1, g["j1"], ctx + " j1", check_osc=True)
                    if j2 != g["j2"]:
                        _tie_equivalent(g, j2, g["j2"], ctx + " j2", check_osc=False)
                    diverged = True  # different (valid) bias node: traces
                    break  # legitimately separate from here on
        if not diverged:
            assert bool(done[b]) == g_conv, f"lane {b}"
            if g_conv:
                assert np.array_equal(best[b], g_best), f"lane {b} final"
    if require_bias:
        assert any_bias, "test case never exercised the OTS bias path"


def test_bpots_bitwise_trace_parity_cycle():
    """Exact per-iteration decision/oscillation/best-tracking parity with
    the golden on the 8-cycle (trapping sets guarantee the OTS bias path
    fires, so the j1/j2 selection order is verified in-situ)."""
    H = cycle_matrix(8)
    rng = np.random.default_rng(17)
    syns = _random_syndromes(H, 6, rng)
    _trace_compare(H, syns, 0.01, 40, 9, 2.0, require_bias=True)


def test_bpots_bitwise_trace_parity_toric():
    """Same bitwise trace parity on the d=3 toric code (irregular degrees,
    real quantum code)."""
    H = toric_code_x(3)
    rng = np.random.default_rng(19)
    errs = rng.random((4, H.shape[1])) < 0.08
    syns = (errs @ H.T) % 2
    _trace_compare(H, syns, 0.08, 30, 5, 2.0, require_bias=False)


def test_bpots_bitwise_trace_parity_gallager():
    """Trace parity on an asymmetric random code (no analytic |llr| ties,
    so bias-node picks must match exactly whenever biasing fires)."""
    H = lt.parity_check_matrix(60, 6, 3, rng=31)
    rng = np.random.default_rng(23)
    errs = rng.random((4, H.shape[1])) < 0.15
    syns = (errs @ H.T) % 2
    _trace_compare(H, syns, 0.15, 30, 5, 2.0, require_bias=False)


def test_select_bias_nodes_tie_order():
    """Constructed ties proving the reference's (max-osc, min-|llr|,
    first-index) selection order (bpots_decoder.jl:300-334)."""
    import jax.numpy as jnp

    from ldpcdecoders_tpu.models.bpots import select_bias_nodes

    osc = jnp.asarray([[2, 2, 0, 1], [3, 0, 3, 3], [0, 0, 0, 0]])
    absllr = jnp.asarray(
        [
            [5.0, 3.0, 0.1, 9.0],  # max-osc tie {0,1} -> smaller |llr| = 1
            [4.0, 0.2, 4.0, 4.0],  # max-osc tie {0,2,3}, |llr| tie -> first = 0
            [1.0, 0.5, 2.0, 3.0],  # no oscillation: bias must not apply
        ]
    )
    j1, j2, has_osc = select_bias_nodes(osc, absllr)
    assert j1.tolist() == [1, 0, 1]  # lane 2's j1 is irrelevant (has_osc False)
    assert j2.tolist() == [2, 1, 1]  # global argmin |llr|, first index on ties
    assert has_osc.tolist() == [True, True, False]


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
