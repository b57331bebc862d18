"""Large-code throughput benchmark: production-scale Tanner graphs.

A 65k-variable (8,4)-regular Gallager code (262k edges) exercises the
native graph compiler and the decoders at a scale where the naive dense
message matrices of the reference (s x n doubles = 17 GB) could not even
be allocated.  Prints one JSON object.

Usage:  python benchmarks/large_code.py [--n 65536] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run(n=65536, wr=8, wc=4, batch=128, iters=20, dtypes=("f32", "int8")):
    unknown = set(dtypes) - {"f32", "int8"}
    if unknown:
        raise SystemExit(f"unknown --dtypes {sorted(unknown)} (choose from f32,int8)")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import ldpcdecoders_tpu as lt

    lt.enable_compilation_cache()
    from ldpcdecoders_tpu.models.minsum import make_minsum_decode_fn
    from ldpcdecoders_tpu.models.minsum_q import make_minsum_q_decode_fn

    # build the Gallager edge list directly in COO — production-scale codes
    # never materialize H densely (65k vars dense would be 2.1 GB)
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    block = n // wr
    rows = np.concatenate(
        [np.repeat(np.arange(block), wr) + b * block for b in range(wc)]
    )
    cols = np.concatenate([rng.permutation(n) for _ in range(wc)])
    m = block * wc
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter()
    graph = lt.TannerGraph.from_edges(rows, cols, m, n)
    t_compile = time.perf_counter() - t0

    from ldpcdecoders_tpu.utils import syndromes_from_edges

    rng = np.random.default_rng(0)
    hard = rng.random((batch, n)) < 0.5
    syns = jnp.asarray(syndromes_from_edges(hard, rows, cols, m))
    work = batch * iters * graph.n_edges

    results = {
        "code": f"({n},{wr},{wc})",
        "edges": graph.n_edges,
        "batch": batch,
        "iters": iters,
        "host_gen_s": round(t_gen, 2),
        "graph_compile_s": round(t_compile, 2),
    }
    makers = {
        "minsum_f32": lambda: jax.jit(make_minsum_decode_fn(graph, 0.01, iters)),
        "minsum_int8": lambda: jax.jit(make_minsum_q_decode_fn(graph, 0.01, iters)),
    }
    wanted = {f"minsum_{d}" for d in dtypes}
    for name, make in makers.items():
        if name not in wanted:
            continue
        fn = make()
        out = fn(syns)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(syns)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[name + "_edge_iters_per_s"] = round(work / dt, 1)

    # tensor-parallel (check-sharded) entry on the same dense-free graph:
    # all available devices go on the 'model' axis (the large-code story —
    # one psum per iteration); a single device runs the same program with
    # a singleton collective, so the path is always measured
    from ldpcdecoders_tpu.parallel import make_check_sharded_minsum_fn, make_mesh

    if "f32" not in dtypes:  # the TP path is f32; skip when f32 was excluded
        results["device"] = str(jax.devices()[0])
        print(json.dumps(results))
        return results

    d_model = len(jax.devices())
    mesh = make_mesh(d_model, axis_names=("data", "model"), shape=(1, d_model))
    tp_fn = make_check_sharded_minsum_fn(graph, 0.01, iters, mesh)
    out = tp_fn(syns)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = tp_fn(syns)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results["tp_minsum_edge_iters_per_s"] = round(work / dt, 1)
    results["tp_model_devices"] = d_model

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtypes", default="f32,int8",
                    help="comma-separated subset of f32,int8 (int8-only for "
                    "batches whose f32 messages would exceed HBM)")
    a = ap.parse_args()
    run(n=a.n, batch=a.batch, dtypes=tuple(a.dtypes.split(",")))
