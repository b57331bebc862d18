"""Fully VMEM-resident QC-LDPC min-sum decode kernel (Pallas TPU).

The general edge-list decoders (models/minsum.py) are HBM-bandwidth bound:
every iteration's cross-layout gathers round-trip the ``[B, E]`` message
arrays through HBM, and Mosaic has no arbitrary-gather primitive, so the
whole decode cannot be fused into one kernel (measured + documented in
ops/pallas_minsum.py and docs/ROADMAP.md).

Quasi-cyclic codes remove that blocker: with messages laid out
``[base_edge, batch_tile, Z]``, the check<->variable permutation of every
circulant block ``P^s`` is a *static cyclic shift by s along the lane (Z)
axis* — exactly ``pltpu.roll``.  This kernel keeps all messages in VMEM
across every BP iteration; HBM sees only the syndrome read and the final
error/LLR write.  The base matrix is baked in at trace time, so the
per-edge loop is fully unrolled with static shifts.

Semantics match models/minsum.py's normalized/offset min-sum (two-min
exclusive reduction, first-minimum tie-breaking, per-lane early freeze of
the err/LLR outputs, while-loop early exit when every lane in the batch
tile has converged).

Orientation convention (see codes/qc.py): lifted check ``i*Z + r``
connects to lifted variable ``j*Z + (r + s) % Z``.  A var-oriented
``[_, Z]`` vector ``v`` (indexed by the variable's residue) maps to check
orientation as ``roll(v, -s)`` and back with ``roll(., +s)`` since
``np.roll(x, s)[c] == x[(c - s) % Z]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_qc_minsum_pallas_fn", "qc_base_adjacency"]


def qc_base_adjacency(base: np.ndarray):
    """Static per-row / per-column edge lists of a QC base matrix.

    Returns ``(edges, row_edges, col_edges)`` where ``edges`` is a list of
    ``(i, j, shift)`` in row-major order (ascending j within a row — the
    same neighbor order as the lifted graph's ascending-variable-index
    convention), ``row_edges[i]`` / ``col_edges[j]`` hold indices into it.
    """
    base = np.asarray(base, dtype=np.int64)
    mb, nb = base.shape
    edges = []
    row_edges = [[] for _ in range(mb)]
    col_edges = [[] for _ in range(nb)]
    for i in range(mb):
        for j in range(nb):
            s = int(base[i, j])
            if s >= 0:
                row_edges[i].append(len(edges))
                col_edges[j].append(len(edges))
                edges.append((i, j, s))
    for i, r in enumerate(row_edges):
        if not r:
            raise ValueError(f"base row {i} has no edges")
    for j, c in enumerate(col_edges):
        if not c:
            raise ValueError(f"base column {j} has no edges")
    return edges, row_edges, col_edges


def make_qc_minsum_pallas_fn(
    base,
    Z: int,
    L0: float,
    max_iters: int,
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    batch_tile: int = 8,
    interpret: bool = False,
):
    """Build ``syndromes [B, mb*Z] -> (err i8, converged bool, iters i32, llrs f32)``.

    ``B`` must be a multiple of ``batch_tile`` (callers pad).  ``L0`` is
    the scalar channel LLR (baked into the kernel, like the other Pallas
    paths — no per-call prior overrides).  The fast compiled path wants
    ``Z`` a multiple of 128 (full lanes); any ``Z`` works in interpret
    mode and small ``Z`` merely pads lanes when compiled.
    """
    base = np.asarray(base, dtype=np.int64)
    mb, nb = base.shape
    edges, row_edges, col_edges = qc_base_adjacency(base)
    Eb = len(edges)
    L0 = float(L0)
    alpha = float(alpha)
    beta = float(beta)
    BT = int(batch_tile)
    f32 = jnp.float32

    def kernel(syn_ref, err_ref, llr_ref, conv_ref, iters_ref, nu_ref, mu_ref):
        # init: nu = channel prior everywhere (var-oriented == check-oriented
        # for a constant), outputs = iteration-0 state
        prior = jnp.full((BT, Z), L0, f32)
        for e in range(Eb):
            nu_ref[e] = prior
        for j in range(nb):
            err_ref[j] = jnp.zeros((BT, Z), jnp.int32)
            llr_ref[j] = prior

        syn_b = [syn_ref[i] != 0 for i in range(mb)]

        # NOTE: `done` is carried as int32 (1 = converged), not bool —
        # Mosaic cannot legalize i1 vectors in while-loop carries
        # (scf.yield relayout failure, observed on v5e / jax 0.9)
        def cond(carry):
            it, done, _ = carry
            return (it < max_iters) & (jnp.min(done) < 1)

        def body(carry):
            it, done, iters = carry
            # -- check update: two-min + sign parity per base row ---------
            for i in range(mb):
                row = row_edges[i]
                ncs, mags, negs = [], [], []
                for e in row:
                    _, _, s = edges[e]
                    nc = pltpu.roll(nu_ref[e], -s % Z, 1)  # check orientation
                    ncs.append(nc)
                    mags.append(jnp.abs(nc))
                    negs.append(nc < 0.0)
                min1 = mags[0]
                idx1 = jnp.zeros((BT, Z), jnp.int32)
                min2 = jnp.full((BT, Z), jnp.inf, f32)
                parity = negs[0]
                for k in range(1, len(row)):
                    v = mags[k]
                    smaller = v < min1
                    min2 = jnp.where(smaller, min1, jnp.minimum(min2, v))
                    idx1 = jnp.where(smaller, k, idx1)
                    min1 = jnp.where(smaller, v, min1)
                    parity = jnp.logical_xor(parity, negs[k])
                for k, e in enumerate(row):
                    _, _, s = edges[e]
                    excl = jnp.where(idx1 == k, min2, min1)
                    flip = jnp.logical_xor(jnp.logical_xor(parity, negs[k]), syn_b[i])
                    mag_out = jnp.maximum(alpha * excl - beta, 0.0)
                    mu_co = jnp.where(flip, -mag_out, mag_out)
                    mu_ref[e] = pltpu.roll(mu_co, s % Z, 1)  # var orientation

            # -- variable update + frozen outputs -------------------------
            active = done < 1  # [BT, 1] bool (intermediate only)
            for j in range(nb):
                col = col_edges[j]
                total = jnp.full((BT, Z), L0, f32)
                for e in col:
                    total = total + mu_ref[e]
                for e in col:
                    nu_ref[e] = total - mu_ref[e]
                errn = (total < 0.0).astype(jnp.int32)
                err_ref[j] = jnp.where(active, errn, err_ref[j])
                llr_ref[j] = jnp.where(active, total, llr_ref[j])

            # -- syndrome check (check-oriented XOR of decisions) ----------
            ok = jnp.ones((BT, 1), jnp.int32)
            for i in range(mb):
                par = jnp.zeros((BT, Z), jnp.int32)
                for e in row_edges[i]:
                    _, j, s = edges[e]
                    par = jnp.bitwise_xor(par, pltpu.roll(err_ref[j], -s % Z, 1))
                ok = ok & jnp.all((par != 0) == syn_b[i], axis=1, keepdims=True).astype(
                    jnp.int32
                )
            iters = jnp.where((ok > 0) & active, it + 1, iters)
            return it + 1, done | ok, iters

        it0 = jnp.int32(0)
        done0 = jnp.zeros((BT, 1), jnp.int32)
        iters0 = jnp.zeros((BT, 1), jnp.int32)
        it, done, iters = jax.lax.while_loop(cond, body, (it0, done0, iters0))
        conv_ref[:] = done
        iters_ref[:] = jnp.where(done > 0, iters, it)

    grid = lambda B: (B // BT,)  # noqa: E731

    @functools.partial(jax.jit, static_argnames=())
    def decode(syndromes):
        syndromes = jnp.asarray(syndromes)
        B = syndromes.shape[0]
        if B % BT:
            raise ValueError(f"batch ({B}) must be a multiple of batch_tile ({BT})")
        # [B, mb*Z] -> [mb, B, Z]: block index outermost so each kernel
        # slice syn_ref[i] is one contiguous [BT, Z] tile
        syn = syndromes.reshape(B, mb, Z).transpose(1, 0, 2).astype(jnp.int32)
        err_t, llr_t, conv, iters = pl.pallas_call(
            kernel,
            grid=grid(B),
            in_specs=[
                pl.BlockSpec((mb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((nb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, B, Z), jnp.int32),
                jax.ShapeDtypeStruct((nb, B, Z), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((Eb, BT, Z), jnp.float32),
                pltpu.VMEM((Eb, BT, Z), jnp.float32),
            ],
            interpret=interpret,
        )(syn)
        err = err_t.transpose(1, 0, 2).reshape(B, nb * Z).astype(jnp.int8)
        llrs = llr_t.transpose(1, 0, 2).reshape(B, nb * Z)
        return err, conv[:, 0].astype(bool), iters[:, 0], llrs

    return decode
