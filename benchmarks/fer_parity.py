"""FER-curve parity artifact: all four reference decoders vs the goldens.

BASELINE.md's accuracy target is *curve-level* agreement with the
reference decoders at each physical error rate.  This script decodes the
SAME error streams with the framework decoders (batched JAX) and the
pure-NumPy goldens (golden/numpy_ref.py, direct transcriptions of the
reference algorithms' semantics) across a per grid, and records both
curves plus their deltas as ``benchmarks/results/fer_parity_r2.json``.
tests/test_fer_parity.py asserts the committed artifact's deltas.

Deterministic decoders (BP, BP+OSD) must match rate-for-rate on shared
streams; the stochastic bit-flip tie-break and BP-OTS float-tie bias
picks may differ per-trial, so their tolerance is statistical
(SURVEY.md §7.3 'Stochastic bit-flip tie-breaking').

Usage: python benchmarks/fer_parity.py [--trials 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

PERS = [0.005, 0.01, 0.02, 0.05, 0.1]


def _rates(H, guesses, errs, syns):
    guesses = np.asarray(guesses)
    exact = (guesses.astype(bool) == errs).all(axis=1)
    synhat = (guesses.astype(np.int64) @ H.T) % 2
    smatch = (synhat == syns).all(axis=1)
    return float(1.0 - exact.mean()), float(smatch.mean())


def run(trials=200, seed=0, out_path=None):
    sys.path.insert(0, ".")
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.golden import (
        bitflip_decode,
        bp_decode,
        bpots_decode,
        osd_postprocess,
    )

    H = lt.parity_check_matrix(120, 6, 3, rng=61)
    n = H.shape[1]
    max_iters = 100

    def g_bp(syn, per, rng):
        err, conv, logp, _ = bp_decode(H, syn, per, max_iters)
        return err.astype(np.int8)

    def g_bposd0(syn, per, rng):
        err, conv, logp, _ = bp_decode(H, syn, per, max_iters)
        return osd_postprocess(H, syn, err, logp, osd_order=0).astype(np.int8)

    def g_bposd2(syn, per, rng):
        err, conv, logp, _ = bp_decode(H, syn, per, max_iters)
        return osd_postprocess(H, syn, err, logp, osd_order=2).astype(np.int8)

    def g_bitflip(syn, per, rng):
        err, conv = bitflip_decode(H, syn, max_iters, rng)
        return err.astype(np.int8)

    def g_bpots(syn, per, rng):
        err, conv = bpots_decode(H, syn, per, max_iters, T=9, C=2.0)
        return err.astype(np.int8)

    cases = {
        "bp": (lambda per: lt.BeliefPropagationDecoder(H, per, max_iters), g_bp),
        "bposd0": (
            lambda per: lt.BeliefPropagationOSDDecoder(H, per, max_iters),
            g_bposd0,
        ),
        "bposd2": (
            lambda per: lt.BeliefPropagationOSDDecoder(H, per, max_iters, osd_order=2),
            g_bposd2,
        ),
        "bitflip": (lambda per: lt.BitFlipDecoder(H, per, max_iters), g_bitflip),
        "bpots": (
            lambda per: lt.BPOTSDecoder(H, per, max_iters, T=9, C=2.0),
            g_bpots,
        ),
    }

    results = {
        "code": "gallager(120,6,3) rng=61",
        "trials_per_point": trials,
        "max_iters": max_iters,
        "pers": PERS,
        "seed": seed,
        "decoders": {},
    }
    t_start = time.time()
    for name, (factory, golden) in cases.items():
        points = []
        for per in PERS:
            rng = np.random.default_rng((seed, int(per * 1e9), 7))
            errs = rng.random((trials, n)) < per
            syns = (errs @ H.T) % 2

            dec = factory(per)
            guesses, _ = dec.batch_decode(syns, seed=seed)
            ler_f, smr_f = _rates(H, guesses, errs, syns)

            g_rng = np.random.default_rng((seed, int(per * 1e9), 11))
            g_guesses = np.stack([golden(syns[t], per, g_rng) for t in range(trials)])
            ler_g, smr_g = _rates(H, g_guesses, errs, syns)

            points.append(
                {
                    "per": per,
                    "ler_framework": ler_f,
                    "ler_golden": ler_g,
                    "ler_delta": abs(ler_f - ler_g),
                    "syndrome_match_framework": smr_f,
                    "syndrome_match_golden": smr_g,
                    "syndrome_match_delta": abs(smr_f - smr_g),
                }
            )
            print(f"{name} per={per}: ler {ler_f:.4f} vs golden {ler_g:.4f}", flush=True)
        results["decoders"][name] = points
    results["wall_seconds"] = round(time.time() - t_start, 1)

    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(__file__), "results", "fer_parity_r2.json"
        )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    run(trials=a.trials, seed=a.seed, out_path=a.out)
