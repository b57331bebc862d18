"""EnsembleDecoder: max-likelihood pick across member decoders."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.models.ensemble import EnsembleDecoder


def _code():
    H = lt.toric_code_x(3)
    rng = np.random.default_rng(3)
    x = (rng.random((128, H.shape[1])) < 0.06).astype(np.uint8)
    return H, x, (x @ H.T) & 1


def test_single_member_matches_member_when_consistent():
    """With one member, the ensemble's outputs equal the member's on
    every consistent lane, and `converged` IS the consistency mask."""
    H, x, syn = _code()
    member = lt.BeliefPropagationOSDDecoder(H, 0.06, 40)
    ens = EnsembleDecoder([member])
    em, cm = member.batch_decode(syn, seed=1)
    ee, ce = ens.batch_decode(syn, seed=1)
    consistent = (((em.astype(np.uint8) @ H.T) & 1) == syn).all(axis=1)
    np.testing.assert_array_equal(ce, consistent)
    np.testing.assert_array_equal(ee, em)  # fallback keeps member output


def test_picks_the_lighter_consistent_candidate():
    """A deliberately bad member (returns a heavy consistent solution)
    must lose to a good member on every lane, shot by shot."""
    H, x, syn = _code()

    class Heavy(lt.Decoder):
        m, n = H.shape

        def __init__(self):
            self.good = lt.BeliefPropagationOSDDecoder(H, 0.06, 40)

        def _decode_batch(self, syndromes, seed=0, per=None):
            e, conv, iters, aux = self.good._decode_batch(syndromes, seed,
                                                          per=per)
            e = np.asarray(e).astype(np.uint8)
            # add a stabilizer (weight-4 plaquette row) to every lane:
            # still syndrome-consistent, strictly heavier
            import jax.numpy as jnp

            row = np.asarray(lt.toric_code_z(3))[0].astype(np.uint8)
            return jnp.asarray((e ^ row[None, :]).astype(np.int8)), \
                conv, iters, aux

    good = lt.BeliefPropagationOSDDecoder(H, 0.06, 40)
    ens = EnsembleDecoder([Heavy(), good], H=H)
    eg, _ = good.batch_decode(syn, seed=1)  # == ensemble member 1's seed
    ee, ce = ens.batch_decode(syn, seed=0)  # member k decodes at seed+k
    consistent = (((eg.astype(np.uint8) @ H.T) & 1) == syn).all(axis=1)
    assert ce[consistent].all()
    # the pick is (a) syndrome-consistent wherever flagged and (b) never
    # heavier than the good member's candidate — the Heavy member only
    # wins a lane if its (different-seed) base solution is lighter even
    # with the stabilizer overhead
    assert (((ee[ce].astype(np.uint8) @ H.T) & 1) == syn[ce]).all()
    w_ens = ee.astype(np.uint8).sum(axis=1)
    w_good = eg.astype(np.uint8).sum(axis=1)
    assert (w_ens[consistent] <= w_good[consistent]).all()


def test_prior_weighted_ranking_prefers_likely_columns():
    """With per-column priors, the ML rank distinguishes equal-Hamming
    candidates: two flips on likely columns beat two flips that include
    a near-impossible column."""
    H = np.array([[1, 1, 1, 1]], np.uint8)  # one check, four columns
    syn = np.array([[0]], np.uint8)

    class Fixed(lt.Decoder):
        m, n = 1, 4
        supports_per_override = True
        supports_vector_prior = True

        def __init__(self, pattern):
            self.pattern = np.asarray(pattern, np.int8)

        def _decode_batch(self, syndromes, seed=0, per=None):
            import jax.numpy as jnp

            B = np.asarray(syndromes).shape[0]
            e = jnp.asarray(np.tile(self.pattern, (B, 1)))
            return e, jnp.ones(B, bool), jnp.zeros(B, jnp.int32), {}

    rare_pair = Fixed([0, 0, 1, 1])     # weight 2, includes the rare col
    likely_pair = Fixed([1, 1, 0, 0])   # weight 2, likely cols only
    priors = np.array([0.4, 0.4, 0.4, 1e-6])
    ens = EnsembleDecoder([rare_pair, likely_pair], priors=priors, H=H)
    e, conv = ens.batch_decode(syn)
    np.testing.assert_array_equal(e[0], [1, 1, 0, 0])  # ML pick
    # Hamming ranking ties; the earlier member wins the tie
    ens2 = EnsembleDecoder([rare_pair, likely_pair], H=H)
    e2, _ = ens2.batch_decode(syn)
    np.testing.assert_array_equal(e2[0], [0, 0, 1, 1])


def test_ensemble_validation():
    H = lt.toric_code_x(3)
    d = lt.BeliefPropagationOSDDecoder(H, 0.06, 10)
    with pytest.raises(ValueError, match="at least one"):
        EnsembleDecoder([])
    d2 = lt.BeliefPropagationOSDDecoder(lt.toric_code_x(5), 0.06, 10)
    with pytest.raises(ValueError, match="ensemble is"):
        EnsembleDecoder([d, d2])
    with pytest.raises(ValueError, match="priors must be"):
        EnsembleDecoder([d], priors=np.zeros(H.shape[1]))
    with pytest.raises(ValueError, match="expected syndromes"):
        EnsembleDecoder([d]).batch_decode(np.zeros((2, 5), np.uint8))


def test_ensemble_improves_on_degenerate_dem():
    """Three damping values + ML pick on a circuit-level DEM: the
    ensemble's failure count is <= the best member's (and its picks are
    always syndrome-consistent where converged)."""
    from ldpcdecoders_tpu.codes.circuit import (circuit_dem,
                                                css_memory_circuit,
                                                sample_circuit)

    Hx, Hz = lt.surface_code_x(3), lt.surface_code_z(3)
    c = css_memory_circuit(Hx, Hz, 3, p=0.006)
    A, pr, O = circuit_dem(c)
    Ad = np.asarray(A.todense())
    det, obs = sample_circuit(c, 512, seed=7)
    from ldpcdecoders_tpu.models.minsum import MinSumDecoder

    members = []
    fails = []
    for g in (0.0, 0.4):
        inner = MinSumDecoder(Ad, 0.006, 80, damping=g)
        dec = lt.BeliefPropagationOSDDecoder(
            Ad, float(pr.mean()), 80, inner=inner, fused=True)
        members.append(dec)
        e, _ = dec.batch_decode(det, seed=5, per=pr)
        pred = (e.astype(np.uint8) @ O.T) & 1
        fails.append(int((pred != obs).any(axis=1).sum()))
    ens = EnsembleDecoder(members, priors=pr, H=Ad)
    e, conv = ens.batch_decode(det, seed=5, per=pr)
    assert (((e[conv].astype(np.uint8) @ Ad.T) & 1) == det[conv]).all()
    pred = (e.astype(np.uint8) @ O.T) & 1
    ens_fails = int((pred != obs).any(axis=1).sum())
    assert ens_fails <= min(fails), (ens_fails, fails)


def test_ensemble_decoder_config_roundtrip():
    """kind='ensemble' JSON round-trips (member configs stored as
    canonical dicts) and builds a working EnsembleDecoder."""
    H = lt.toric_code_x(3)
    cfg = lt.DecoderConfig(kind="ensemble", per=0.06, max_iters=30, members=(
        lt.DecoderConfig(kind="bposd", per=0.06, max_iters=30,
                         inner="minsum", damping=0.4, fused=True),
        {"kind": "bposd", "per": 0.06, "max_iters": 30, "fused": True},
    ))
    cfg2 = lt.DecoderConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    ens = cfg2.build(H)
    assert len(ens.members) == 2
    rng = np.random.default_rng(3)
    x = (rng.random((32, H.shape[1])) < 0.06).astype(np.uint8)
    syn = (x @ H.T) & 1
    e, conv = ens.batch_decode(syn, seed=1)
    assert (((e[conv].astype(np.uint8) @ H.T) & 1) == syn[conv]).all()
    with pytest.raises(ValueError, match="at least one"):
        lt.DecoderConfig(kind="ensemble", members=())
    with pytest.raises(ValueError, match="nest"):
        lt.DecoderConfig(kind="ensemble", members=(cfg,))
    with pytest.raises(ValueError, match="ensemble-only"):
        lt.DecoderConfig(kind="bp", members=({"kind": "bp"},))


def test_fused_minsum_ensemble_matches_sequential_loop():
    """Shared-graph MinSum members differing only in damping take the
    fused lane-damped path (VERDICT r4 item 9); outputs, convergence,
    ml_score aux, and iteration sums must match the sequential loop
    bit for bit (same decode math, same first-min tie-breaking)."""
    H, x, syn = _code()
    graph = lt.TannerGraph.from_pcm(H)
    members = [lt.MinSumDecoder(graph, 0.06, 24, damping=g, check_every=4)
               for g in (0.0, 0.2, 0.5)]
    ens = EnsembleDecoder(members, H=H)
    assert ens._fused_gammas is not None  # plan detected
    ef, cf, itf, auxf = ens._call_decode(syn, 0, None)
    ens._fused_gammas = None  # force the general loop on the same object
    el, cl, itl, auxl = ens._call_decode(syn, 0, None)
    np.testing.assert_array_equal(np.asarray(ef), np.asarray(el))
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cl))
    np.testing.assert_array_equal(np.asarray(itf), np.asarray(itl))
    np.testing.assert_allclose(np.asarray(auxf["ml_score"]),
                               np.asarray(auxl["ml_score"]), rtol=1e-5)


def test_fused_plan_rejects_heterogeneous_members():
    """Members that differ in anything but damping keep the loop."""
    H, _, _ = _code()
    graph = lt.TannerGraph.from_pcm(H)
    diff_alpha = EnsembleDecoder(
        [lt.MinSumDecoder(graph, 0.06, 24, alpha=1.0),
         lt.MinSumDecoder(graph, 0.06, 24, alpha=0.8)], H=H)
    assert diff_alpha._fused_gammas is None
    diff_kind = EnsembleDecoder(
        [lt.MinSumDecoder(graph, 0.06, 24),
         lt.BeliefPropagationDecoder(graph, 0.06, 24)], H=H)
    assert diff_kind._fused_gammas is None
