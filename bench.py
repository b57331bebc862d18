"""Headline benchmark: BP decoding throughput on the reference's own
benchmark configuration (benchmark/benchmarks.jl: H = (1000, 10, 9)
Gallager code, per = 0.01, max_iters = 100).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no absolute numbers (BASELINE.md), so
``vs_baseline`` is measured against the build target from BASELINE.json:
>= 1e7 BP edge-iterations/s/chip.  The primary value is measured with
early exit disabled (every lane runs all iterations), so it counts real
sustained message-update work, not convergence luck.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.models.bp import make_bp_decode_fn

    H = lt.parity_check_matrix(1000, 10, 9, rng=42)
    graph = lt.TannerGraph.from_pcm(H)
    per, max_iters = 0.01, 100
    B = 1024

    rng = np.random.default_rng(0)
    # random (unsatisfiable-in-few-iters) syndromes: decoding a per=0.5
    # error pattern forces the full max_iters of message passing in nearly
    # every lane -> measures sustained kernel throughput
    hard_errs = rng.random((B, graph.n)) < 0.5
    hard_syns = jnp.asarray((hard_errs @ H.T) % 2, dtype=jnp.uint8)
    # realistic syndromes for the end-to-end decoded-syndromes/s number
    real_errs = rng.random((B, graph.n)) < per
    real_syns = jnp.asarray((real_errs @ H.T) % 2, dtype=jnp.uint8)

    fn = jax.jit(make_bp_decode_fn(graph, per, max_iters))

    # warmup / compile
    out = fn(hard_syns)
    jax.block_until_ready(out)

    # sustained-throughput measurement
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        err, conv, iters, _ = fn(hard_syns)
    jax.block_until_ready(err)
    dt = (time.perf_counter() - t0) / reps
    iters_executed = int(np.max(np.asarray(iters))) or max_iters
    edge_iters_per_s = B * iters_executed * graph.n_edges / dt

    # end-to-end realistic decode rate
    out = fn(real_syns)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    err, conv, iters, _ = fn(real_syns)
    jax.block_until_ready(err)
    dt_real = time.perf_counter() - t0
    syndromes_per_s = B / dt_real

    target = 1e7  # BASELINE.json north-star: edge-iterations/s/chip
    result = {
        "metric": "bp_edge_iterations_per_s_per_chip",
        "value": round(edge_iters_per_s, 1),
        "unit": "edge_iters/s",
        "vs_baseline": round(edge_iters_per_s / target, 3),
        "extra": {
            "decoded_syndromes_per_s_at_per0.01": round(syndromes_per_s, 1),
            "batch": B,
            "iters_executed": iters_executed,
            "edges": graph.n_edges,
            "converged_fraction_real": float(np.asarray(conv).mean()),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
