"""bb144 circuit-level, round 4: the staged production curve runner.

Round 3's flagship config (damped min-sum 1000 + host OSD-CS,
osd_scope=failed) measured 17-30 shots/s and LER 5.2e-2 at p=0.003;
round 4 replaces the evaluation path with StagedDemDecoder (staged
straggler compaction + device-fused disordered-memory ensemble + relay
restarts + full-RREF native OSD-CS with triples).  This script
regenerates any point of circuit_level_bb144_r4.json end to end
(circuit -> exact DEM -> device-sampled pipelined eval).

Usage:
  python benchmarks/circuit_level_bb144_r4.py --p 0.003 --shots 8192 \
      [--members 6] [--relay 3] [--rounds 6] [--out results.jsonl]

Prints one JSON line per point; --out appends (resumable by name).
"""

import argparse
import json
import time

import numpy as np

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.circuit import circuit_dem, css_memory_circuit

DMEM = (-0.24, 0.66)


def build(A, pr, O, members: int, relay: int, stage0: int, deep: int,
          lam: int, lam3: int):
    gammas = (0.4,) + tuple(DMEM for _ in range(max(0, members - 1)))
    return lt.StagedDemDecoder(
        A, pr, observables=O, gammas=gammas, stage0_iters=stage0,
        deep_iters=deep, lam=lam, lam3=lam3, check_every=8,
        relay_legs=relay)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=float, default=0.003)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--shots", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--deep-bucket", type=int, default=128)
    ap.add_argument("--members", type=int, default=6)
    ap.add_argument("--relay", type=int, default=3)
    ap.add_argument("--stage0", type=int, default=96)
    ap.add_argument("--deep", type=int, default=1000)
    ap.add_argument("--lam", type=int, default=60)
    ap.add_argument("--lam3", type=int, default=40)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--max-seconds", type=float, default=None)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    import jax

    Hx, Hz, *_ = lt.named_bicycle_code("bb144")
    t0 = time.time()
    c = css_memory_circuit(Hx, Hz, a.rounds, p=a.p)
    A, pr, O = circuit_dem(c)
    gen_s = time.time() - t0
    dec = build(A, pr, O, a.members, a.relay, a.stage0, a.deep, a.lam,
                a.lam3)
    st = dec.run_eval(a.shots, batch=a.batch, deep_bucket=a.deep_bucket,
                      pipeline=3, seed=a.seed, max_seconds=a.max_seconds)
    st.update({
        "per": a.p, "rounds": a.rounds,
        "per_round_rate": 1 - (1 - st["logical_rate"]) ** (1 / a.rounds),
        "dem_mechanisms": int(A.shape[1]),
        "dem_extraction_seconds": round(gen_s, 1),
        "config": {"members": a.members, "relay_legs": a.relay,
                   "stage0_iters": a.stage0, "deep_iters": a.deep,
                   "lam": a.lam, "lam3": a.lam3,
                   "batch": a.batch, "deep_bucket": a.deep_bucket},
        "device": str(jax.devices()[0]),
    })
    print(json.dumps(st))
    if a.out:
        with open(a.out, "a") as f:
            f.write(json.dumps(st) + "\n")


if __name__ == "__main__":
    main()
