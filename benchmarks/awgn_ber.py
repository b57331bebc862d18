"""AWGN waterfall: BER vs Eb/N0 for soft-input decoding (decode_soft).

BPSK over AWGN on the all-zero codeword; per-lane priors from received
LLR magnitudes.  Writes benchmarks/results/awgn_ber_r2.json.

Usage:  python benchmarks/awgn_ber.py [--n 1200] [--batch 4096]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(n=1200, wr=6, wc=3, batch=4096, max_iters=60, snrs=(1.0, 2.0, 3.0, 4.0, 5.0)):
    import jax

    sys.path.insert(0, ".")
    import ldpcdecoders_tpu as lt

    lt.enable_compilation_cache()
    H = lt.parity_check_matrix(n, wr, wc, rng=0)
    rate = 1.0 - H.shape[0] / n  # design rate
    dec = lt.MinSumDecoder(H, 0.02, max_iters)
    rng = np.random.default_rng(0)
    points = {}
    for snr_db in snrs:
        # Eb/N0 -> per-symbol sigma at this code rate
        ebn0 = 10 ** (snr_db / 10)
        sigma = float(1.0 / np.sqrt(2.0 * rate * ebn0))
        y = 1.0 + sigma * rng.standard_normal((batch, n))
        llrs = 2.0 * y / sigma**2
        cw, ok = lt.decode_soft(dec, llrs)
        points[snr_db] = {
            "raw_ber": float((y < 0).mean()),
            "decoded_ber": float(cw.mean()),
            "fer": float(cw.any(axis=1).mean()),
            "converged": float(ok.mean()),
            "sigma": sigma,
        }
        print(snr_db, points[snr_db], file=sys.stderr)
    out = {
        "code": f"({n}, wr={wr}, wc={wc}) Gallager, rate {rate:.3f}",
        "modulation": "BPSK, all-zero codeword",
        "decoder": f"MinSumDecoder(max_iters={max_iters}), decode_soft per-lane priors",
        "batch": batch,
        "points": {str(k): v for k, v in points.items()},
        "device": str(jax.devices()[0]),
    }
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "awgn_ber_r2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=4096)
    a = ap.parse_args()
    run(n=a.n, batch=a.batch)
