"""FER-sweep harness + utils tests, including checkpoint/resume."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.harness import FERSweep
from ldpcdecoders_tpu.utils import (
    sample_errors,
    syndromes_of,
    exact_recovery_ler,
    syndrome_match_rate,
    wilson_interval,
    save_code_npz,
    load_code_npz,
)


def test_utils_roundtrip(tmp_path):
    H = lt.parity_check_matrix(60, 6, 3, rng=1)
    p = str(tmp_path / "code.npz")
    save_code_npz(p, H, wr=np.array(6))
    H2, meta = load_code_npz(p)
    assert np.array_equal(H, H2)
    assert int(meta["wr"]) == 6


def test_metrics():
    H = lt.parity_check_matrix(60, 6, 3, rng=2)
    errs = sample_errors(3, 10, 60, 0.05)
    syns = syndromes_of(H, errs)
    assert exact_recovery_ler(errs, errs) == 0.0
    assert syndrome_match_rate(H, errs, syns) == 1.0
    lo, hi = wilson_interval(5, 100)
    assert lo < 0.05 < hi


def test_fer_sweep_runs(tmp_path):
    H = lt.parity_check_matrix(120, 6, 3, rng=3)
    sweep = FERSweep(
        H,
        lambda per: lt.BeliefPropagationDecoder(H, per, 30),
        pers=[0.005, 0.02],
        batch=32,
        checkpoint_path=str(tmp_path / "ck.json"),
        seed=5,
    )
    out = sweep.run(trials_per_point=64)
    assert set(out) == {0.005, 0.02}
    for per, s in out.items():
        assert s["trials"] == 64
        assert 0 <= s["ler"] <= 1
        assert s["ler_ci95"][0] <= s["ler"] <= s["ler_ci95"][1]
    # lower noise should not be worse
    assert out[0.005]["ler"] <= out[0.02]["ler"] + 0.05


def test_fer_sweep_pipelined_matches_sync():
    """pipeline=N must reproduce the synchronous loop's counts exactly:
    streams derive from the step index alone and batches finalize in
    dispatch order."""
    H = lt.parity_check_matrix(120, 6, 3, rng=7)
    factory = lambda per: lt.MinSumDecoder(H, per, 30)
    outs = []
    for depth in (1, 4):
        sweep = FERSweep(H, factory, pers=[0.01, 0.04], batch=16, seed=11,
                         multihost=False, pipeline=depth)
        # 40 trials with batch=16 exercises a partial final batch in flight
        outs.append(sweep.run(trials_per_point=40))
    for per in (0.01, 0.04):
        a, b = outs[0][per], outs[1][per]
        for k in ("trials", "ler", "syndrome_match_rate",
                  "converged_fraction", "mean_iters"):
            assert a[k] == b[k], (per, k)


def test_fer_sweep_pipelined_max_seconds_drains(tmp_path):
    """A max_seconds stop mid-pipeline must drain in-flight batches into
    the checkpoint (no lost or double-counted trials on resume)."""
    H = lt.parity_check_matrix(120, 6, 3, rng=8)
    factory = lambda per: lt.MinSumDecoder(H, per, 30)
    ck = str(tmp_path / "ck.json")
    sweep = FERSweep(H, factory, pers=[0.02], batch=16, seed=12,
                     checkpoint_path=ck, multihost=False, pipeline=4)
    sweep.run(trials_per_point=64, max_seconds=0.0)  # stops at first check
    resumed = FERSweep(H, factory, pers=[0.02], batch=16, seed=12,
                       checkpoint_path=ck, multihost=False, pipeline=4)
    done_before = resumed.points[0.02].trials
    assert done_before % 16 == 0  # whole batches only
    out = resumed.run(trials_per_point=64)
    full = FERSweep(H, factory, pers=[0.02], batch=16, seed=12,
                    multihost=False, pipeline=1).run(trials_per_point=64)
    assert out[0.02]["trials"] == 64
    assert out[0.02]["ler"] == full[0.02]["ler"]


def test_fer_sweep_sample_on_device(tmp_path):
    """Device-resident sampling: reproducible across runs and resume, and
    statistically consistent with the host-sampled sweep."""
    H = lt.parity_check_matrix(120, 6, 3, rng=17)
    factory = lambda per: lt.MinSumDecoder(H, per, 30)

    a = FERSweep(H, factory, pers=[0.04], batch=32, seed=21, multihost=False,
                 sample_on_device=True).run(trials_per_point=96)
    b = FERSweep(H, factory, pers=[0.04], batch=32, seed=21, multihost=False,
                 sample_on_device=True).run(trials_per_point=96)
    assert a[0.04]["ler"] == b[0.04]["ler"]  # same counted streams

    # resume mid-sweep reproduces the uninterrupted run exactly
    ck = str(tmp_path / "ck.json")
    part = FERSweep(H, factory, pers=[0.04], batch=32, seed=21,
                    multihost=False, sample_on_device=True, checkpoint_path=ck)
    part.run(trials_per_point=32)
    resumed = FERSweep(H, factory, pers=[0.04], batch=32, seed=21,
                       multihost=False, sample_on_device=True,
                       checkpoint_path=ck)
    out = resumed.run(trials_per_point=96)
    assert out[0.04]["ler"] == a[0.04]["ler"]

    # switching sampling modes against an existing checkpoint must raise
    with pytest.raises(ValueError, match="sampling mode"):
        FERSweep(H, factory, pers=[0.04], batch=32, seed=21,
                 multihost=False, sample_on_device=False, checkpoint_path=ck)

    # statistically consistent with host sampling (same physics)
    host = FERSweep(H, factory, pers=[0.04], batch=32, seed=21,
                    multihost=False).run(trials_per_point=96)
    assert abs(host[0.04]["ler"] - a[0.04]["ler"]) < 0.25


def test_fer_sweep_fused_fallback_decoders():
    """Decoders that cannot trace into the fused device step (OSD's
    host-side lane compaction) or reject per overrides (bit-flip) must
    fall back transparently and still produce correct counts."""
    H = lt.parity_check_matrix(120, 6, 3, rng=13)
    osd = FERSweep(
        H, lambda per: lt.BeliefPropagationOSDDecoder(H, per, 20),
        pers=[0.03], batch=16, seed=4, multihost=False, pipeline=4,
    ).run(trials_per_point=32)[0.03]
    assert osd["trials"] == 32
    assert osd["syndrome_match_rate"] == 1.0  # OSD guarantee survives
    bf = FERSweep(
        H, lambda per: lt.BitFlipDecoder(H, per, 20),
        pers=[0.01], batch=16, seed=4, multihost=False, pipeline=4,
    ).run(trials_per_point=32)[0.01]
    assert bf["trials"] == 32
    assert 0.0 <= bf["ler"] <= 1.0


def test_fer_sweep_resume_matches_uninterrupted(tmp_path):
    H = lt.parity_check_matrix(120, 6, 3, rng=4)
    factory = lambda per: lt.BeliefPropagationDecoder(H, per, 30)

    full = FERSweep(H, factory, pers=[0.02], batch=16, seed=9)
    out_full = full.run(trials_per_point=48)

    ck = str(tmp_path / "ck.json")
    part = FERSweep(H, factory, pers=[0.02], batch=16, checkpoint_path=ck, seed=9)
    part.run(trials_per_point=16)  # stop early
    resumed = FERSweep(H, factory, pers=[0.02], batch=16, checkpoint_path=ck, seed=9)
    assert resumed.points[0.02].trials == 16  # picked up from checkpoint
    out_res = resumed.run(trials_per_point=48)

    assert out_res[0.02]["trials"] == 48
    # identical failure counts: resume reproduces the uninterrupted stream
    assert out_res[0.02]["ler"] == out_full[0.02]["ler"]
    assert out_res[0.02]["syndrome_match_rate"] == out_full[0.02]["syndrome_match_rate"]


def test_fer_sweep_keeps_sparse_H_sparse():
    """A scipy.sparse H must run without densification (large-code path)
    and produce the exact counts of the dense run on the same streams."""
    import scipy.sparse as sp

    H = lt.parity_check_matrix(120, 6, 3, rng=7)
    factory = lambda per: lt.BeliefPropagationDecoder(H, per, 30)
    dense = FERSweep(H, factory, pers=[0.02], batch=16, seed=11)
    sparse = FERSweep(sp.csr_matrix(H), factory, pers=[0.02], batch=16, seed=11)
    assert hasattr(sparse.H, "tocsr")  # stayed sparse
    out_d = dense.run(trials_per_point=32)
    out_s = sparse.run(trials_per_point=32)
    assert out_d[0.02]["ler"] == out_s[0.02]["ler"]
    assert out_d[0.02]["syndrome_match_rate"] == out_s[0.02]["syndrome_match_rate"]


def test_fer_sweep_defers_multihost_detection():
    """__init__ must not touch the JAX backend; auto-detection happens at
    run() so initialize_multihost() can still be called in between."""
    H = lt.parity_check_matrix(60, 6, 3, rng=8)
    sweep = FERSweep(H, lambda per: lt.BitFlipDecoder(H, per, 10), pers=[0.01])
    assert sweep.multihost is None  # unresolved until run()
    sweep.run(trials_per_point=8)
    assert sweep.multihost is False


def test_fer_sweep_rejects_mismatched_checkpoint(tmp_path):
    H = lt.parity_check_matrix(120, 6, 3, rng=5)
    factory = lambda per: lt.BeliefPropagationDecoder(H, per, 10)
    ck = str(tmp_path / "ck.json")
    FERSweep(H, factory, pers=[0.01], batch=8, checkpoint_path=ck, seed=1).run(
        trials_per_point=8
    )
    with pytest.raises(ValueError):
        FERSweep(H, factory, pers=[0.01], batch=8, checkpoint_path=ck, seed=2)


def test_find_threshold_brackets_crossing():
    """Bisection converges to a per bracket whose LER straddles the target,
    and probes are reproducible from the counted-RNG seed discipline."""
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.harness import find_threshold

    H = lt.parity_check_matrix(240, 8, 4, rng=17)
    factory = lambda p: lt.MinSumDecoder(H, p, 30)
    res = find_threshold(
        H, factory, target_ler=0.5, lo=1e-3, hi=0.2,
        trials_per_probe=256, batch=64, seed=5, max_probes=5, rel_tol=0.2,
    )
    assert 1e-3 <= res["lo"] < res["hi"] <= 0.2
    assert res["lo"] <= res["threshold"] <= res["hi"]
    assert len(res["probes"]) >= 3
    # monotone bracket: every probe landed inside the previous bracket
    for p in res["probes"]:
        assert 1e-3 <= p["per"] <= 0.2
    # rerun reproduces identically (counted RNG streams)
    res2 = find_threshold(
        H, factory, target_ler=0.5, lo=1e-3, hi=0.2,
        trials_per_probe=256, batch=64, seed=5, max_probes=5, rel_tol=0.2,
    )
    strip = lambda r: {
        **{k: v for k, v in r.items() if k != "probes"},
        "probes": [
            {k: v for k, v in p.items() if k != "throughput_syndromes_per_s"}
            for p in r["probes"]
        ],
    }
    assert strip(res2) == strip(res)


def test_find_threshold_validation():
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.harness import find_threshold

    H = lt.parity_check_matrix(48, 6, 3, rng=1)
    with pytest.raises(ValueError):
        find_threshold(H, lambda p: lt.MinSumDecoder(H, p, 5), lo=0.2, hi=0.1)
    with pytest.raises(ValueError):
        find_threshold(H, lambda p: lt.MinSumDecoder(H, p, 5), target_ler=0.0)


def test_mixed_fer_sweep_reproducible_and_monotone():
    """mixed_fer_sweep: counted streams reproduce exactly; failure rate
    does not decrease with erasure rate; erasure-light points peel clean."""
    from ldpcdecoders_tpu.harness import mixed_fer_sweep

    H = lt.parity_check_matrix(240, 6, 3, rng=0)
    rates = [0.02, 0.12]
    a = mixed_fer_sweep(H, 0.005, rates, trials_per_point=96, batch=48,
                        seed=3, osd_order=0)
    b = mixed_fer_sweep(H, 0.005, rates, trials_per_point=96, batch=48,
                        seed=3, osd_order=0)
    for eps in rates:
        assert a[eps]["exact_failure_rate"] == b[eps]["exact_failure_rate"]
        assert a[eps]["trials"] == 96
        # osd completion keeps every lane syndrome-consistent
        assert a[eps]["syndrome_mismatch_rate"] == 0.0
    assert a[0.12]["exact_failure_rate"] >= a[0.02]["exact_failure_rate"]
    assert a[0.12]["mean_peel_rounds"] >= a[0.02]["mean_peel_rounds"]


def test_mixed_fer_sweep_checkpoint_resume(tmp_path):
    """Resuming a checkpointed mixed sweep reproduces the uninterrupted
    run exactly (counted streams; partial runs persist counters)."""
    from ldpcdecoders_tpu.harness import mixed_fer_sweep

    H = lt.parity_check_matrix(120, 6, 3, rng=0)
    ckpt = str(tmp_path / "mixed.json")
    kw = dict(batch=24, seed=7, osd_order=0, max_iters=30)
    # stage 1: half the trials; stage 2: resume to the full count
    mixed_fer_sweep(H, 0.005, [0.08], trials_per_point=48,
                    checkpoint_path=ckpt, **kw)
    resumed = mixed_fer_sweep(H, 0.005, [0.08], trials_per_point=96,
                              checkpoint_path=ckpt, **kw)
    oneshot = mixed_fer_sweep(H, 0.005, [0.08], trials_per_point=96, **kw)
    for key in ("trials", "exact_failure_rate", "syndrome_mismatch_rate",
                "ok_rate", "steps", "mean_peel_rounds"):
        assert resumed[0.08][key] == oneshot[0.08][key], key
    # mismatched config is refused
    with pytest.raises(ValueError, match="different seed"):
        mixed_fer_sweep(H, 0.005, [0.08], trials_per_point=8, batch=24,
                        seed=8, osd_order=0, checkpoint_path=ckpt)
    # a zero time budget returns immediately with nothing accumulated
    out = mixed_fer_sweep(H, 0.005, [0.5], trials_per_point=8,
                          max_seconds=0.0, **kw)
    assert out == {}
