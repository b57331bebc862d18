"""Error-pattern sampling and syndrome generation.

The reference samples iid bit-flip errors host-side (`rand(n) .< per`,
test_bp_decoder.jl:8) — we provide the same host-side NumPy path plus a
device-side JAX path for generating benchmark workloads without
host->device transfers.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sample_errors",
    "syndromes_of",
    "syndromes_from_edges",
    "sample_errors_device",
    "sample_mixed_channel",
]


def sample_errors(rng, batch: int, n: int, per: float) -> np.ndarray:
    """Sample ``[batch, n]`` iid Bernoulli(per) error patterns (host)."""
    if isinstance(rng, (int, np.integer)) or rng is None:
        rng = np.random.default_rng(rng)
    return rng.random((batch, n)) < per


def syndromes_of(H, errors: np.ndarray) -> np.ndarray:
    """``[B, m]`` syndromes of a 0/1 error batch (host, exact GF(2)).

    Accepts dense arrays or scipy.sparse matrices; sparse H is used
    directly (no densification), so million-qubit from_edges-scale codes
    stay within memory.
    """
    e = np.asarray(errors).astype(np.int64)
    if hasattr(H, "tocsr"):
        return np.asarray(e @ H.tocsr().astype(np.int64).T) % 2
    return (e @ np.asarray(H).astype(np.int64).T) % 2


def syndromes_from_edges(errors: np.ndarray, rows, cols, m: int) -> np.ndarray:
    """``[B, m]`` syndromes from a COO edge list (host, O(active edges)).

    For codes held only as edge lists (``TannerGraph.from_edges`` scale),
    this runs one masked ``bincount`` per lane — O(E) working memory, no
    dense ``[B, E]`` intermediates (a fused-key variant allocated several
    ``batch * E`` int64 arrays: ~6 GB at million-qubit HGP scale).
    """
    errors = np.asarray(errors, dtype=bool)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    B = errors.shape[0]
    out = np.empty((B, m), np.uint8)
    for b in range(B):
        counts = np.bincount(rows[errors[b, cols]], minlength=m)
        out[b] = (counts & 1).astype(np.uint8)
    return out


def sample_errors_device(key, batch: int, n: int, per: float):
    """Device-side error sampling with a JAX PRNG key."""
    import jax

    return jax.random.bernoulli(key, per, (batch, n))


def sample_mixed_channel(rng, batch: int, n: int, p_flip: float, p_erase: float):
    """Sample the mixed erasure + bit-flip channel (host).

    Returns ``(erasures [batch, n] bool, errors [batch, n] bool)``:
    each bit is independently erased with probability ``p_erase``
    (erased bits take a uniform random value — the decoder knows the
    location, not the value); non-erased bits flip with ``p_flip``.
    """
    if isinstance(rng, (int, np.integer)) or rng is None:
        rng = np.random.default_rng(rng)
    erasures = rng.random((batch, n)) < p_erase
    errors = np.where(
        erasures,
        rng.random((batch, n)) < 0.5,
        rng.random((batch, n)) < p_flip,
    )
    return erasures, errors
