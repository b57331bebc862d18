"""Space-time evaluation-loop throughput (VERDICT r2 item 1).

Round 2's `spacetime_logical_sweep` rebuilt syndromes with per-round
host loops and reduced residuals through the host bit-packed RREF every
batch — 168-207 shots/s on toric d=3 (spacetime_r2.json) on the same
chip whose FER harness pipelines 90k syndromes/s.  Round 3 moves the
whole shot on device (`harness._make_spacetime_pair_step`): sampling,
detector construction, the joint decode of BOTH stabilizer blocks, and
the stabilizer-equivalence verdict via the `css_logical_operators`
matmul form run as ONE jitted program per batch, pipelined 4 deep, with
a single [6] int32 count fetch each.

Usage: python benchmarks/spacetime_throughput.py [--out FILE]
Writes {case: point-summary} JSON; the headline is
throughput_shots_per_s on toric d=3 R=3 (target: >= 10,000).
"""

import argparse
import json
import os
import time

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.harness import spacetime_logical_sweep

CASES = {
    # (Hx, Hz, rounds, per, trials, batch)
    "toric_d3_R3": (lambda: (lt.toric_code_x(3), lt.toric_code_z(3)), 3,
                    0.02, 40960, 1024),
    "toric_d5_R5": (lambda: (lt.toric_code_x(5), lt.toric_code_z(5)), 5,
                    0.02, 16384, 1024),
    "bb144_R6": (lambda: lt.named_bicycle_code("bb144")[:2], 6,
                 0.003, 8192, 1024),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "results", "spacetime_throughput_r3.json"))
    ap.add_argument("--cases", default=",".join(CASES))
    a = ap.parse_args()

    import jax

    results = {"device": str(jax.devices()[0])}
    for name in a.cases.split(","):
        pair, R, per, trials, batch = CASES[name]
        Hx, Hz = pair()
        # compile warmup (separate, so the steady number is honest)
        spacetime_logical_sweep(Hx, Hz, [per], rounds=R,
                                trials_per_point=batch, max_iters=60,
                                batch=batch, seed=0)
        t0 = time.perf_counter()
        out = spacetime_logical_sweep(Hx, Hz, [per], rounds=R,
                                      trials_per_point=trials, max_iters=60,
                                      batch=batch, seed=1)
        wall = time.perf_counter() - t0
        pt = out[per]
        pt["wall_seconds"] = wall
        results[name] = pt
        print(f"{name}: {pt['throughput_shots_per_s']:.0f} shots/s "
              f"(any_logical={pt['any_logical_rate']:.4g}, "
              f"device={pt['device_sampled']})")
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
