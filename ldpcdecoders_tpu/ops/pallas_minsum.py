"""Pallas TPU kernels for the min-sum message updates (the hot ops).

XLA compiles the slot-major min-sum iteration to ~6 HBM passes over the
edge arrays (gather, mask/abs, three reductions, broadcast combine).
These kernels fuse everything between the two static gathers into single
VMEM-resident passes:

  * check update: one unrolled sweep over the degree axis computes
    (min1, argmin, min2) and the sign parity simultaneously — no one_hot
    materialization, one read + one write of the edge array;
  * variable update: total sum, leave-one-out subtraction, clip, and the
    hard-decision/LLR outputs in one pass.

The cross-layout gathers stay in XLA (Mosaic has no arbitrary-gather
primitive — probed: `jnp.take` inside a kernel fails to compile), so a
decode iteration is: XLA gather -> check kernel -> XLA gather -> var
kernel.  Kernels are batch-tiled via the grid; the degree axis lives in
sublanes and the node axis in lanes (slot-major contract).

Used by ``make_minsum_decode_fn(..., use_pallas=True)``; numerics are
bit-identical to the jnp path (same reduction order), tested in
interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["check_update_pallas", "var_update_pallas"]


def _check_kernel(ng_ref, syn_ref, mask_ref, mu_ref, *, alpha, beta, big):
    # Boolean state is carried as int8 0/1 (xor arithmetic); i1 vectors
    # appear only as ephemeral comparison results feeding selects —
    # Mosaic cannot truncate i8 vectors to i1, so no bool tensor may be
    # materialized or broadcast.
    x = ng_ref[:]  # [Bt, dc, M]
    mask = mask_ref[:]  # [1, dc, M] int8 0/1
    syn = syn_ref[:]  # [Bt, 1, M] int8 0/1
    dc = x.shape[1]
    alpha = x.dtype.type(alpha)
    beta = x.dtype.type(beta)
    big = x.dtype.type(big)
    one8 = jnp.int8(1)
    zero8 = jnp.int8(0)

    # masked magnitude; sign bit as int8
    masked_x = jnp.where(mask != 0, x, big)  # pads: +big (positive, inert)
    mag = jnp.abs(masked_x)
    neg = jnp.where(masked_x < x.dtype.type(0), one8, zero8)  # [Bt, dc, M]

    # one sweep: running (min1, idx1, min2) + sign parity
    min1 = mag[:, 0:1, :]
    idx1 = jnp.zeros(min1.shape, jnp.int32)
    min2 = jnp.full_like(min1, big)
    parity = neg[:, 0:1, :]
    for k in range(1, dc):
        v = mag[:, k : k + 1, :]
        smaller = v < min1
        min2 = jnp.where(smaller, min1, jnp.minimum(min2, v))
        idx1 = jnp.where(smaller, k, idx1)
        min1 = jnp.where(smaller, v, min1)
        parity = jnp.bitwise_xor(parity, neg[:, k : k + 1, :])

    for k in range(dc):
        excl = jnp.where(idx1 == k, min2, min1)
        flip = jnp.bitwise_xor(jnp.bitwise_xor(parity, neg[:, k : k + 1, :]), syn)
        mag_out = jnp.maximum(alpha * excl - beta, x.dtype.type(0.0))
        mu_ref[:, k : k + 1, :] = jnp.where(flip != 0, -mag_out, mag_out)


def _var_kernel(mg_ref, mask_ref, nu_ref, total_ref, *, L0):
    mg = mg_ref[:]  # [Bt, dv, N]
    mg = jnp.where(mask_ref[:] != 0, mg, jnp.zeros_like(mg))
    total = jnp.float32(L0) + jnp.sum(mg.astype(jnp.float32), axis=1, keepdims=True)
    nu_ref[:] = (total - mg.astype(jnp.float32)).astype(mg.dtype)
    total_ref[:] = total.astype(mg.dtype)


def check_update_pallas(Ng, syn_flip, chk_mask, *, alpha, beta, batch_tile=64, interpret=False):
    """Fused check update: ``Ng [B, dc, m] -> mu [B, dc, m]``.

    Args:
      Ng: gathered var->check messages (slot-major).
      syn_flip: ``[B, m]`` bool syndrome.
      chk_mask: ``[dc, m]`` bool edge-validity mask.
    """
    B, dc, m = Ng.shape
    bt = min(batch_tile, B)
    while B % bt:
        bt //= 2
    kern = functools.partial(
        _check_kernel,
        alpha=float(alpha),
        beta=float(beta),
        big=float(np.finfo(np.float32).max / 4),
    )
    return pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, dc, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dc, m), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, dc, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dc, m), Ng.dtype),
        interpret=interpret,
    )(Ng, syn_flip[:, None, :].astype(jnp.int8), chk_mask[None].astype(jnp.int8))


def var_update_pallas(Mg, var_mask, *, L0, batch_tile=64, interpret=False):
    """Fused var update: ``Mg [B, dv, n] -> (nu [B, dv, n], total [B, n])``."""
    B, dv, n = Mg.shape
    bt = min(batch_tile, B)
    while B % bt:
        bt //= 2
    kern = functools.partial(_var_kernel, L0=float(L0))
    nu, total = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, dv, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, dv, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, dv, n), Mg.dtype),
            jax.ShapeDtypeStruct((B, 1, n), Mg.dtype),
        ),
        interpret=interpret,
    )(Mg, var_mask[None].astype(jnp.int8))
    return nu, total[:, 0, :]
