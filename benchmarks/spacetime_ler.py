"""Resolved space-time logical-error-rate curves (VERDICT r2 item 2).

Round 2's flagship quantum artifact (bb144 under phenomenological
measurement noise) had ZERO resolved data points: 0 failures in 1024
shots at every noise level — an upper bound, not a curve — because the
host-bound sweep managed ~200 shots/s.  With the round-3 device
pipeline (`harness._make_spacetime_pair_step`, 3-15k shots/s) real
statistics are affordable: this script runs an *adaptive* sweep per
noise point — at least ``--min-shots`` (default 10^5), then keeps
accumulating until >= ``--min-fails`` (default 10) logical failures or
``--point-seconds`` of wall clock, whichever first — and emits Wilson
CIs from the pooled counts.

Cases: bb144 (the [[144,12,12]] bivariate-bicycle code) at R=6 and
R=12 noisy measurement rounds, plus toric d=3/d=5 at R=6 as the
baseline the bb curve is plotted against.  p = q (data error rate =
measurement error rate), the standard phenomenological setting.

Statistical discipline follows the reference's LER oracles
(/root/reference/test/test_bpots.jl:116-137): fixed seeds, pooled
binomial counts, interval-based assertions downstream.

Usage: python benchmarks/spacetime_ler.py [--out FILE] [--quick]
Writes {case: {per: point}} JSON plus a matplotlib PNG beside it.
"""

import argparse
import json
import os
import time

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.harness import spacetime_logical_sweep, wilson_interval

PERS = [0.001, 0.002, 0.003, 0.004, 0.005]

CASES = {
    # name: (pair-thunk, rounds, max_iters, batch)
    "bb144_R6": (lambda: lt.named_bicycle_code("bb144")[:2], 6, 60, 2048),
    "bb144_R12": (lambda: lt.named_bicycle_code("bb144")[:2], 12, 60, 1024),
    "toric_d3_R6": (lambda: (lt.toric_code_x(3), lt.toric_code_z(3)),
                    6, 60, 4096),
    "toric_d5_R6": (lambda: (lt.toric_code_x(5), lt.toric_code_z(5)),
                    6, 60, 2048),
}


def adaptive_point(Hx, Hz, per, rounds, max_iters, batch, *, min_shots,
                   min_fails, point_seconds, seed):
    """Accumulate device-pipelined batches until the failure count
    resolves (>= min_fails) or the time budget runs out; always run at
    least min_shots.  Returns pooled counts + Wilson CIs."""
    t0 = time.perf_counter()
    trials = zf = xf = anyf = zc = xc = 0
    iters_w = 0.0
    chunk_idx = 0
    while True:
        elapsed = time.perf_counter() - t0
        if trials >= min_shots and (
                anyf >= min_fails or elapsed >= point_seconds):
            break
        chunk = max(batch, min(min_shots, 16 * batch))
        out = spacetime_logical_sweep(
            Hx, Hz, [per], rounds=rounds, trials_per_point=chunk,
            max_iters=max_iters, batch=batch, seed=seed + chunk_idx)
        pt = out[per]
        t = pt["trials"]
        trials += t
        zf += round(pt["z_logical_rate"] * t)
        xf += round(pt["x_logical_rate"] * t)
        anyf += round(pt["any_logical_rate"] * t)
        zc += round(pt["z_converged"] * t)
        xc += round(pt["x_converged"] * t)
        iters_w += pt["mean_iters"] * t
        chunk_idx += 1
    dt = time.perf_counter() - t0
    a_lo, a_hi = wilson_interval(anyf, trials)
    z_lo, z_hi = wilson_interval(zf, trials)
    x_lo, x_hi = wilson_interval(xf, trials)
    return {
        "per": per, "meas_error_rate": per, "rounds": rounds,
        "trials": trials, "z_fails": zf, "x_fails": xf, "any_fails": anyf,
        "z_logical_rate": zf / trials, "z_logical_ci95": [z_lo, z_hi],
        "x_logical_rate": xf / trials, "x_logical_ci95": [x_lo, x_hi],
        "any_logical_rate": anyf / trials, "any_logical_ci95": [a_lo, a_hi],
        "resolved": anyf >= min_fails,
        "z_converged": zc / trials, "x_converged": xc / trials,
        "mean_iters": iters_w / trials,
        "throughput_shots_per_s": trials / dt, "wall_seconds": dt,
    }


def plot(results, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 4.4))
    for name, pts in results.items():
        if name in ("device", "config") or not isinstance(pts, dict):
            continue
        xs, ys, lo, hi = [], [], [], []
        for per, pt in sorted(pts.items()):
            xs.append(float(per))
            ys.append(max(pt["any_logical_rate"], 1e-7))
            lo.append(max(pt["any_logical_ci95"][0], 1e-7))
            hi.append(pt["any_logical_ci95"][1])
        ax.errorbar(xs, ys,
                    yerr=[[y - a for y, a in zip(ys, lo)],
                          [b - y for y, b in zip(ys, hi)]],
                    marker="o", capsize=3, label=name)
    ax.set_yscale("log")
    ax.set_xlabel("p = q (data / measurement error rate)")
    ax.set_ylabel("logical error rate (any block)")
    ax.set_title("Space-time decoding: bb144 vs toric (BP+OSD)")
    ax.legend()
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=130)


def main():
    ap = argparse.ArgumentParser()
    here = os.path.dirname(__file__)
    ap.add_argument("--out", default=os.path.join(
        here, "results", "spacetime_r3.json"))
    ap.add_argument("--min-shots", type=int, default=100_000)
    ap.add_argument("--min-fails", type=int, default=10)
    ap.add_argument("--point-seconds", type=float, default=180.0)
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--pers", default=",".join(map(str, PERS)))
    ap.add_argument("--quick", action="store_true",
                    help="tiny budgets (smoke test)")
    a = ap.parse_args()
    if a.quick:
        a.min_shots, a.min_fails, a.point_seconds = 2048, 2, 10.0

    import jax

    results = {"device": str(jax.devices()[0]),
               "config": {"min_shots": a.min_shots, "min_fails": a.min_fails,
                          "point_seconds": a.point_seconds}}
    pers = [float(p) for p in a.pers.split(",")]
    for name in a.cases.split(","):
        pair, R, max_iters, batch = CASES[name]
        Hx, Hz = pair()
        results[name] = {}
        for per in pers:
            pt = adaptive_point(Hx, Hz, per, R, max_iters, batch,
                                min_shots=a.min_shots, min_fails=a.min_fails,
                                point_seconds=a.point_seconds, seed=101)
            results[name][str(per)] = pt
            print(f"{name} p={per}: {pt['any_fails']}/{pt['trials']} "
                  f"any-fails -> LER {pt['any_logical_rate']:.3g} "
                  f"[{pt['any_logical_ci95'][0]:.2g},"
                  f"{pt['any_logical_ci95'][1]:.2g}] "
                  f"{'RESOLVED' if pt['resolved'] else 'upper-bound'} "
                  f"({pt['throughput_shots_per_s']:.0f} shots/s)",
                  flush=True)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", a.out)
    png = os.path.splitext(a.out)[0] + ".png"
    try:
        plot(results, png)
        print("wrote", png)
    except Exception as e:  # plotting is best-effort
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
