"""bb144 circuit-level decoding: the reproducible ladder + curve runner.

The committed artifact circuit_level_bb144_r3.json was produced by the
configurations below; this script re-runs any of them end to end
(circuit -> exact DEM -> circuit-sampled shots -> decode -> observable
compare).  Everything is circuit-sampled — the model-independent
evaluation.

Configs (--config):
  bp            plain sum-product, no OSD       (measured LER 0.874)
  minsum_osd0   minsum-500 + native host OSD-0  (0.374)
  minsum_cs     minsum-500 + host OSD-CS(40)    (0.300)
  layered_cs    layered-60 inner + OSD-CS(40)   (0.175)
  damped        DAMPED minsum + OSD-CS(40)      (0.055 @ p=0.003) [default]

Usage: python benchmarks/circuit_level_bb144.py \\
           [--config damped] [--p 0.003] [--rounds 6] [--shots 4096]
Prints a one-line JSON summary; --out appends it to a JSON-lines file.
"""

import argparse
import json
import time

import numpy as np

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.circuit import (circuit_dem, css_memory_circuit,
                                            sample_circuit)
from ldpcdecoders_tpu.utils.metrics import wilson_interval


def build_decoder(config, Ad, pr, p):
    from ldpcdecoders_tpu.models.layered import LayeredMinSumDecoder
    from ldpcdecoders_tpu.models.minsum import MinSumDecoder

    per0 = float(pr.mean())
    if config == "bp":
        return lt.BeliefPropagationDecoder(Ad, per0, 100)
    if config == "minsum_osd0":
        inner = MinSumDecoder(Ad, p, 500)
        return lt.BeliefPropagationOSDDecoder(
            Ad, per0, 500, inner=inner, osd_scope="failed", osd_impl="host")
    if config == "minsum_cs":
        inner = MinSumDecoder(Ad, p, 500)
    elif config == "layered_cs":
        inner = LayeredMinSumDecoder(Ad, p, 60)
    elif config == "damped":
        inner = MinSumDecoder(Ad, p, 1000, damping=0.4)
    else:
        raise SystemExit(f"unknown config {config!r}")
    return lt.BeliefPropagationOSDDecoder(
        Ad, per0, inner.max_iters, inner=inner, osd_scope="failed",
        osd_impl="host", osd_order=40, osd_method="combination_sweep")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="damped",
                    choices=("bp", "minsum_osd0", "minsum_cs", "layered_cs",
                             "damped"))
    ap.add_argument("--p", type=float, default=0.003)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--shots", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default=None, help="append JSON line here")
    a = ap.parse_args()

    import jax

    Hx, Hz, *_ = lt.named_bicycle_code("bb144")
    t0 = time.time()
    c = css_memory_circuit(Hx, Hz, a.rounds, p=a.p)
    A, pr, O = circuit_dem(c)
    Ad = np.asarray(A.todense())
    gen_s = time.time() - t0
    det, obs = sample_circuit(c, a.shots, seed=a.seed)
    dec = build_decoder(a.config, Ad, pr, a.p)

    t0 = time.time()
    done = fails = 0
    conv_t = 0.0
    while done < a.shots:
        d = det[done: done + a.batch]
        o = obs[done: done + a.batch]
        e_hat, conv = dec.batch_decode(d, seed=5, per=pr)
        pred = (e_hat.astype(np.uint8) @ O.T) & 1
        fails += int((pred != o).any(axis=1).sum())
        conv_t += float(np.asarray(conv).sum())
        done += len(d)
        print(f"{done}/{a.shots}: fails={fails} conv={conv_t / done:.3f}",
              flush=True)
    dt = time.time() - t0
    lo, hi = wilson_interval(fails, done)
    ler = fails / done
    summary = {
        "config": a.config, "per": a.p, "rounds": a.rounds,
        "dem_mechanisms": int(A.shape[1]),
        "dem_extraction_seconds": round(gen_s, 1),
        "shots": done, "fails": fails,
        "any_logical_rate": ler, "logical_ci95": [lo, hi],
        "per_round_rate": 1 - (1 - ler) ** (1 / a.rounds),
        "converged": conv_t / done,
        "throughput_shots_per_s": round(done / dt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(summary))
    if a.out:
        with open(a.out, "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
