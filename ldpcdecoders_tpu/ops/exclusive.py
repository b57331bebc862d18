"""Exclusive (leave-one-out) product/sum primitives over padded degree axes.

These replace the reference's serial per-node prefix/suffix accumulation
loops (/root/reference/src/decoders/belief_propagation.jl:135-177) with
vectorized cumulative scans along the (small, static) padded-degree axis,
preserving the exact left-to-right / right-to-left accumulation order —
including its behavior in the presence of zeros and infinities, which a
naive total/element division would destroy.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["exclusive_prods", "guarded_exclusive_prod_scan"]


def exclusive_prods(x):
    """Return (fwd, bwd) exclusive cumulative products along the last axis.

    ``fwd[..., k] = x[..., 0] * ... * x[..., k-1]`` accumulated left-to-right;
    ``bwd[..., k] = x[..., d-1] * ... * x[..., k+1]`` accumulated
    right-to-left.  ``fwd * bwd`` is the leave-one-out product with the same
    association order as two serial passes.
    """
    ones = jnp.ones_like(x[..., :1])
    fwd = jnp.cumprod(jnp.concatenate([ones, x[..., :-1]], axis=-1), axis=-1)
    rev = x[..., ::-1]
    bwd = jnp.cumprod(jnp.concatenate([ones, rev[..., :-1]], axis=-1), axis=-1)[..., ::-1]
    return fwd, bwd


def guarded_exclusive_prod_scan(x, init, *, nan_reset=1.0):
    """Serial exclusive product with the reference's NaN guard.

    Mirrors the variable-node accumulation of
    /root/reference/src/decoders/belief_propagation.jl:152-177: a running
    product that is reset to ``nan_reset`` whenever it becomes NaN.  The
    guard makes the scan non-associative, so it is unrolled over the (small,
    static) last axis.

    Args:
      x: ``[..., d]`` factors.
      init: ``[...]`` initial running product for the forward pass (the
        channel ratio); the backward pass starts from 1.

    Returns:
      (excl, total): ``excl[..., k]`` = guarded product of all factors except
      ``x[..., k]`` (forward prefix times backward suffix, applied in the
      reference's order); ``total`` = guarded product of all factors,
      starting from ``init``.
    """
    d = x.shape[-1]
    one = jnp.ones_like(init)

    fwd = []
    temp = init
    for k in range(d):
        fwd.append(temp)
        temp = temp * x[..., k]
        temp = jnp.where(jnp.isnan(temp), nan_reset, temp)
    total = temp

    out = [None] * d
    temp = one
    for k in range(d - 1, -1, -1):
        out[k] = fwd[k] * temp
        temp = temp * x[..., k]
        temp = jnp.where(jnp.isnan(temp), nan_reset, temp)

    return jnp.stack(out, axis=-1), total
