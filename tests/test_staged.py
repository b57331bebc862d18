"""StagedDemDecoder: the round-4 production circuit-level path.

Covers the three exactness claims the design rests on:
  * single-gamma staged decode == one deep decoder (per-lane freezing
    makes stage0 + redecoded stragglers bit-identical to the full run);
  * every output is syndrome-consistent (BP-converged or OSD-repaired);
  * the pipelined evaluator's bookkeeping (cross-batch straggler
    pooling, bucket padding, async OSD accounting) reproduces the
    synchronous decode path's verdicts exactly on identical draws.
"""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.models.staged import StagedDemDecoder
from ldpcdecoders_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native host OSD unavailable")


def _small_dem(seed=0, D=40, N=300, k=3):
    rng = np.random.default_rng(seed)
    A = (rng.random((D, N)) < 0.08).astype(np.uint8)
    A[:, A.sum(axis=0) == 0] = 1
    pr = np.clip(rng.random(N) * 0.01, 1e-4, 0.01)
    O = (rng.random((k, N)) < 0.1).astype(np.uint8)
    return A, pr, O


def test_staged_single_gamma_equals_deep_run():
    """gammas=(g,): converged verdicts and outputs match one deep
    MinSumDecoder exactly (stage0_iters on the check_every grid)."""
    import jax.numpy as jnp

    from ldpcdecoders_tpu.models.minsum import MinSumDecoder

    A, pr, O = _small_dem()
    rng = np.random.default_rng(1)
    x = (rng.random((64, A.shape[1])) < pr * 8).astype(np.uint8)
    det = (x @ A.T % 2).astype(np.uint8)
    sd = StagedDemDecoder(A, pr, observables=O, gammas=(0.3,),
                          stage0_iters=32, deep_iters=192, lam=20,
                          check_every=8)
    out, conv = sd.batch_decode(det)
    ref = MinSumDecoder(A, pr.mean(), 192, damping=0.3, check_every=8)
    L0 = jnp.asarray(np.log((1 - pr) / pr), jnp.float32)
    eref, cref, _, _ = ref._decode_fn(jnp.asarray(det), L0)
    eref, cref = np.asarray(eref), np.asarray(cref)
    np.testing.assert_array_equal(conv, cref)
    np.testing.assert_array_equal(out[cref], eref[cref].astype(np.int8))
    # OSD-repaired lanes: syndrome-consistent
    syn2 = (out.astype(np.uint8) @ A.T % 2).astype(np.uint8)
    np.testing.assert_array_equal(syn2, det)


def test_staged_ensemble_consistent_and_solves_more():
    A, pr, O = _small_dem(seed=3)
    rng = np.random.default_rng(2)
    x = (rng.random((96, A.shape[1])) < pr * 8).astype(np.uint8)
    det = (x @ A.T % 2).astype(np.uint8)
    one = StagedDemDecoder(A, pr, observables=O, gammas=(0.3,),
                           stage0_iters=32, deep_iters=96, lam=16)
    three = StagedDemDecoder(A, pr, observables=O, gammas=(0.0, 0.3, 0.5),
                             stage0_iters=32, deep_iters=96, lam=16,
                             lam3=8)
    o1, c1 = one.batch_decode(det)
    o3, c3 = three.batch_decode(det)
    assert c3.sum() >= c1.sum()  # more members can only widen coverage
    syn3 = (o3.astype(np.uint8) @ A.T % 2).astype(np.uint8)
    np.testing.assert_array_equal(syn3, det)


def test_run_eval_matches_sync_decode_exactly():
    """The pipelined evaluator must reproduce the synchronous path's
    verdicts on identical mechanism draws — exercising straggler
    pooling across batches, final-bucket padding masks, and the async
    OSD accounting."""
    import jax
    import jax.numpy as jnp

    A, pr, O = _small_dem(seed=5)
    N = A.shape[1]
    sd = StagedDemDecoder(A, pr, observables=O, gammas=(0.2, 0.4),
                          stage0_iters=32, deep_iters=96, lam=16,
                          min_bucket=16)
    shots, batch, bucket = 1024, 256, 64
    st = sd.run_eval(shots, batch=batch, deep_bucket=bucket, pipeline=3,
                     seed=11)
    assert st["shots"] == shots
    # replay: regenerate the same per-step draws and run the sync path
    rng0 = np.random.default_rng(11)
    fails = 0
    for _ in range(shots // batch):
        noise_seed = int(rng0.integers(1 << 31))
        x = np.asarray(jax.random.bernoulli(
            jax.random.PRNGKey(noise_seed), jnp.asarray(pr, jnp.float32),
            (batch, N))).astype(np.uint8)
        det = (x @ A.T % 2).astype(np.uint8)
        obs_t = (x @ O.T % 2).astype(np.uint8)
        pred, conv = sd.predict_observables(det)
        fails += int((pred != obs_t).any(axis=1).sum())
    assert st["fails"] == fails
    prof = st["profile"]
    assert prof["deep_shots"] >= prof["osd_shots"]
    assert prof["osd_consistent"] == prof["osd_shots"]  # reachable syndromes


def test_dem_logical_sweep_staged_kind():
    from ldpcdecoders_tpu.harness import dem_logical_sweep

    A, pr, O = _small_dem(seed=7)
    out = dem_logical_sweep((A, pr, O), shots=512, max_iters=96,
                            decoder="staged", batch=256, rounds=4,
                            gammas=(0.3,), stage0_iters=32, lam=16,
                            min_bucket=16)
    assert out["shots"] == 512 and "per_round_rate" in out
    assert out["device_sampled"] is True


def test_staged_validation_errors():
    A, pr, O = _small_dem()
    with pytest.raises(ValueError, match="priors"):
        StagedDemDecoder(A, pr[:-1])
    with pytest.raises(ValueError, match="gammas"):
        StagedDemDecoder(A, pr, gammas=())
    with pytest.raises(ValueError, match="observables"):
        StagedDemDecoder(A, pr, observables=O[:, :-1])
    sd = StagedDemDecoder(A, pr, gammas=(0.3,), stage0_iters=16,
                          deep_iters=32, lam=8)
    with pytest.raises(ValueError, match="observables"):
        sd.predict_observables(np.zeros((2, A.shape[0]), np.uint8))


def test_relay_legs_widen_coverage_and_stay_exact():
    """Relay restarts (fresh disordered-memory draws on survivors) can
    only add solved lanes, keep every output syndrome-consistent, and
    the pipelined evaluator still matches the sync path exactly."""
    import jax
    import jax.numpy as jnp

    A, pr, O = _small_dem(seed=9)
    N = A.shape[1]
    base = dict(observables=O, gammas=(0.2, (0.0, 0.5)), stage0_iters=32,
                deep_iters=96, lam=16, min_bucket=16)
    rng = np.random.default_rng(4)
    x = (rng.random((96, N)) < pr * 8).astype(np.uint8)
    det = (x @ A.T % 2).astype(np.uint8)
    d0 = StagedDemDecoder(A, pr, **base)
    d2 = StagedDemDecoder(A, pr, relay_legs=2, **base)
    o0, c0 = d0.batch_decode(det)
    o2, c2 = d2.batch_decode(det)
    assert c2.sum() >= c0.sum()
    np.testing.assert_array_equal(
        (o2.astype(np.uint8) @ A.T % 2).astype(np.uint8), det)
    # evaluator bookkeeping with relay on
    shots, batch = 512, 256
    st = d2.run_eval(shots, batch=batch, deep_bucket=32, pipeline=2,
                     seed=13)
    rng0 = np.random.default_rng(13)
    fails = 0
    for _ in range(shots // batch):
        ns = int(rng0.integers(1 << 31))
        xs = np.asarray(jax.random.bernoulli(
            jax.random.PRNGKey(ns), jnp.asarray(pr, jnp.float32),
            (batch, N))).astype(np.uint8)
        ds = (xs @ A.T % 2).astype(np.uint8)
        ob = (xs @ O.T % 2).astype(np.uint8)
        pred, _ = d2.predict_observables(ds)
        fails += int((pred != ob).any(axis=1).sum())
    assert st["fails"] == fails


def test_staged_config_round_trip_and_build():
    """DecoderConfig kind='staged': gammas (scalars and [lo, hi] dmem
    ranges) JSON round-trip; build takes (A, priors[, observables])."""
    A, pr, O = _small_dem(seed=11)
    cfg = lt.DecoderConfig(kind="staged", per=0.003, max_iters=96,
                           gammas=(0.4, [-0.2, 0.6]), stage0_iters=32,
                           relay_legs=1, lam=16, lam3=8)
    cfg2 = lt.DecoderConfig.from_json(cfg.to_json())
    assert cfg2.stage0_iters == 32 and cfg2.relay_legs == 1
    dec = cfg2.build((A, pr, O))
    assert isinstance(dec, StagedDemDecoder) and dec.K == 2
    assert dec.lam == 16 and dec.lam3 == 8 and dec.deep_iters == 96
    with pytest.raises(ValueError, match="staged"):
        cfg2.build(A)  # needs the (A, priors) tuple
    # deep_dtype rides the JSON round-trip as a string
    import jax.numpy as jnp

    cfg3 = lt.DecoderConfig.from_json(lt.DecoderConfig(
        kind="staged", per=0.003, max_iters=64, gammas=(0.3,),
        deep_dtype="bf16").to_json())
    dec3 = cfg3.build((A, pr))
    assert dec3.deep_dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="deep_dtype"):
        lt.DecoderConfig(kind="staged", per=0.003,
                         deep_dtype="f16").build((A, pr))
