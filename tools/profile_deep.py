"""Profile the staged deep path on the real chip (round-5 item 1 recon).

Measures, on the bb144 R=6 circuit DEM:
  * stage-0 cost per shot (batch 1024, 96 iters)
  * one deep-ensemble bucket (Bb x K lanes, deep_iters) wall time
    -> lane-iters/s and edge-iters/s for the deep program
  * the same with bf16 messages
so round 5 knows where the 2.8-5 shots/s flagship wall actually is.

Caches the extracted DEM to benchmarks/results/bb144_r{R}_p{p}.npz:
extraction takes ~2 min and every r5 experiment needs the same matrix.
"""

import argparse
import time

import numpy as np


def load_dem(rounds: int, p: float):
    import os

    import scipy.sparse as sp

    path = f"benchmarks/results/bb144_r{rounds}_p{p}.npz"
    if os.path.exists(path):
        z = np.load(path)
        A = sp.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"]))
        return A, z["priors"], z["obs"]
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.codes.circuit import circuit_dem, css_memory_circuit

    Hx, Hz, *_ = lt.named_bicycle_code("bb144")
    t0 = time.time()
    c = css_memory_circuit(Hx, Hz, rounds, p=p)
    A, pr, O = circuit_dem(c)
    print(f"DEM extraction: {time.time()-t0:.1f}s")
    A = A.tocsr() if hasattr(A, "tocsr") else A
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    np.savez_compressed(
        path, data=A.data, indices=A.indices, indptr=A.indptr,
        shape=np.array(A.shape), priors=np.asarray(pr), obs=np.asarray(O))
    return A, np.asarray(pr), np.asarray(O)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--p", type=float, default=0.003)
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--members", type=int, default=6)
    ap.add_argument("--deep", type=int, default=1000)
    ap.add_argument("--layout", default="var", choices=["var", "check"])
    ap.add_argument("--stage0-only", action="store_true")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import ldpcdecoders_tpu as lt  # noqa: F401
    from ldpcdecoders_tpu.codes.graph import TannerGraph
    from ldpcdecoders_tpu.models.minsum import make_minsum_decode_fn

    A, pr, O = load_dem(a.rounds, a.p)
    D, N = A.shape
    Ad = np.asarray(A.todense())
    g = TannerGraph.from_pcm(Ad)
    edges = int(Ad.sum())
    print(f"DEM: D={D} N={N} edges={edges} max_dc={g.max_dc} "
          f"max_dv={g.max_dv}")

    rng = np.random.default_rng(0)
    x = rng.random((4096, N)) < pr[None, :]
    det = ((x.astype(np.uint8) @ Ad.T) % 2).astype(np.uint8)

    # stage-0: gamma 0.4, 96 iters, check_every 8
    f0 = jax.jit(make_minsum_decode_fn(
        g, float(pr.mean()), 96, alpha=1.0, damping=0.4, check_every=8,
        layout=a.layout))
    L0 = jnp.asarray(np.log((1 - pr) / pr).astype(np.float32))
    B0 = 1024
    d0 = jnp.asarray(det[:B0])
    t = time.time()
    r = f0(d0, L0)
    jax.block_until_ready(r)
    print(f"stage0 compile+run: {time.time()-t:.1f}s")
    t = time.time()
    reps = 3
    for _ in range(reps):
        r = f0(d0, L0)
    jax.block_until_ready(r)
    dt = (time.time() - t) / reps
    conv = float(np.asarray(r[1]).mean())
    ei = B0 * 96 * edges / dt
    print(f"stage0 warm: {dt*1000:.0f}ms/batch{B0} conv={conv:.3f} "
          f"edge-iters/s={ei:.3e} shots/s={B0/dt:.0f}")
    if a.stage0_only:
        return

    # deep ensemble bucket: lane_damping [K*Bb] with dmem rows
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        fd = jax.jit(make_minsum_decode_fn(
            g, float(pr.mean()), a.deep, alpha=1.0, dtype=dtype,
            lane_damping=True, check_every=8, layout=a.layout))
        Bb, K = a.bucket, a.members
        rows = np.empty((K, N), np.float32)
        rows[0] = 0.4
        for k in range(1, K):
            rows[k] = np.random.default_rng(0xD3E + k).uniform(
                -0.24, 0.66, N)
        gam_t = jnp.asarray(np.repeat(rows, Bb, axis=0))
        # hard shots: the non-stage0-converged ones (chunked at B0 so we
        # reuse the compiled stage-0 program instead of recompiling 4x)
        conv0 = np.concatenate([
            np.asarray(f0(jnp.asarray(det[lo:lo+B0]), L0)[1])
            for lo in range(0, det.shape[0], B0)])
        hard = np.flatnonzero(~conv0)[:Bb]
        hard = np.concatenate([hard, np.repeat(hard[:1], Bb - hard.size)])
        syn_t = jnp.asarray(np.tile(det[hard], (K, 1)))
        t = time.time()
        r = fd(syn_t, L0, gam_t)
        jax.block_until_ready(r)
        tc = time.time() - t
        t = time.time()
        r = fd(syn_t, L0, gam_t)
        jax.block_until_ready(r)
        dt = time.time() - t
        convd = np.asarray(r[1]).reshape(K, Bb)
        solved = float(convd.any(axis=0).mean())
        iters = int(np.asarray(r[2]).max())
        lanes = K * Bb
        ei = lanes * iters * edges / dt
        print(f"deep[{tag}] Bb={Bb} K={K} cap={a.deep}: compile+run "
              f"{tc:.1f}s warm {dt:.1f}s iters_max={iters} "
              f"solved={solved:.3f} lane-iters/s={lanes*iters/dt:.3e} "
              f"edge-iters/s={ei:.3e}")


if __name__ == "__main__":
    main()
