"""Failure-mode characterization for the bb144 staged flagship.

VERDICT r4 item 1's done-bar allows "a measured saturation artifact
with failure-mode characterization (weight histograms of surviving
shots)" where the accuracy ladder flattens.  The pipelined evaluator
samples mechanisms on DEVICE and discards them, so ground truth is
unavailable there; this tool samples on HOST instead, decodes through
the synchronous staged path on identical math, and for every logical
failure records what actually went wrong:

  * true error weight vs decoded correction weight;
  * prior-weighted log-likelihood of truth vs decode (score = sum of
    log((1-p)/p) over asserted mechanisms — LOWER is more likely);
  * whether the decode was MORE likely than the truth (degeneracy
    failure: the decoder found a better-scoring coset representative
    in the WRONG logical class — no amount of BP diversity fixes
    those) or LESS likely (search failure: diversity/OSD missed a
    better solution);
  * which stage produced the verdict (BP-converged vs OSD-repaired).

Usage:
  python tools/analyze_failures.py --p 0.003 --shots 8192 \
      [--members 6] [--relay 3] [--deep 500] [--out fails.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DMEM = (-0.24, 0.66)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=float, default=0.003)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--shots", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--members", type=int, default=6)
    ap.add_argument("--relay", type=int, default=3)
    ap.add_argument("--stage0", type=int, default=96)
    ap.add_argument("--deep", type=int, default=500)
    ap.add_argument("--deep-dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--lam", type=int, default=60)
    ap.add_argument("--lam3", type=int, default=40)
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.circuit_level_bb144_r5 import load_dem
    from ldpcdecoders_tpu.models.staged import StagedDemDecoder

    A, pr, O, _ = load_dem(a.rounds, a.p)
    Ad = A.toarray()
    N = A.shape[1]
    llr0 = np.log((1.0 - pr) / pr)
    gammas = (0.4,) + tuple(DMEM for _ in range(max(0, a.members - 1)))
    dec = StagedDemDecoder(
        A, pr, observables=O, gammas=gammas, stage0_iters=a.stage0,
        deep_iters=a.deep, lam=a.lam, lam3=a.lam3, check_every=8,
        relay_legs=a.relay,
        deep_dtype=jnp.bfloat16 if a.deep_dtype == "bf16" else jnp.float32)

    rng = np.random.default_rng(a.seed)
    fails = []
    trials = 0
    for lo in range(0, a.shots, a.batch):
        b = min(a.batch, a.shots - lo)
        x = (rng.random((b, N)) < pr[None, :]).astype(np.uint8)
        det = (x @ Ad.T % 2).astype(np.uint8)
        obs_t = (x @ O.T % 2).astype(np.uint8)
        xhat, solved = dec.batch_decode(det)
        xhat = np.asarray(xhat).astype(np.uint8)
        pred = (xhat @ O.T) & 1
        bad = np.flatnonzero((pred != obs_t).any(axis=1))
        trials += b
        for i in bad:
            s_true = float(x[i] @ llr0)
            s_dec = float(xhat[i] @ llr0)
            fails.append({
                "true_weight": int(x[i].sum()),
                "decoded_weight": int(xhat[i].sum()),
                "true_score": round(s_true, 3),
                "decoded_score": round(s_dec, 3),
                "decode_more_likely": bool(s_dec < s_true),
                "score_gap": round(s_dec - s_true, 3),
                "bp_solved": bool(np.asarray(solved)[i]),
                "syndrome_consistent": bool(
                    ((xhat[i] @ Ad.T % 2) == det[i]).all()),
                "obs_mismatch_bits": int((pred[i] != obs_t[i]).sum()),
            })
        print(f"{trials}/{a.shots} shots, {len(fails)} fails", flush=True)

    deg = sum(f["decode_more_likely"] for f in fails)
    res = {
        "device": str(jax.devices()[0]),
        "shots": trials,
        "fails": len(fails),
        "ler": len(fails) / trials if trials else 0.0,
        "per_round": 1 - (1 - len(fails) / trials) ** (1 / a.rounds)
        if trials else 0.0,
        "degeneracy_failures": deg,
        "search_failures": len(fails) - deg,
        "note": ("degeneracy failures (decoded correction MORE likely "
                 "than the truth) are information-theoretic under this "
                 "decoder's likelihood model - diversity cannot remove "
                 "them; search failures are the reachable frontier"),
        "config": {"members": a.members, "relay_legs": a.relay,
                   "deep_iters": a.deep, "deep_dtype": a.deep_dtype,
                   "stage0_iters": a.stage0, "lam": a.lam, "lam3": a.lam3,
                   "p": a.p, "rounds": a.rounds, "seed": a.seed},
        "failures": fails,
    }
    print(json.dumps({k: v for k, v in res.items() if k != "failures"}))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
