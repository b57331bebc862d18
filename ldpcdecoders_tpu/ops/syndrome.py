"""Batched GF(2) syndrome computation on the MXU.

The reference computes ``(H * err) .% 2`` with a sparse mat-vec per decode
iteration (/root/reference/src/decoders/belief_propagation.jl:180-184).  On
TPU the same check is a dense ``[B, n] @ [n, m]`` matmul: row weights of
LDPC codes are tiny, so the integer-valued partial sums are exact in
float32 (and even bfloat16), and the MXU makes this essentially free at
batch size >= 128.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["syndrome_of", "syndrome_matches"]


def syndrome_of(err, Ht):
    """``(err @ H^T) mod 2`` for a 0/1 error batch.

    Args:
      err: ``[B, n]`` float 0/1 error estimates.
      Ht: ``[n, m]`` float 0/1 transpose of the parity-check matrix.

    Returns:
      ``[B, m]`` float 0/1 syndromes.
    """
    s = jnp.dot(err, Ht, preferred_element_type=jnp.float32)
    return jnp.mod(s, 2.0)


def syndrome_matches(err, Ht, syndrome):
    """Per-lane ``all((err @ H^T) % 2 == syndrome)`` -> ``[B]`` bool."""
    return jnp.all(syndrome_of(err, Ht) == syndrome, axis=-1)
