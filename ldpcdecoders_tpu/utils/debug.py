"""Debug validation (SURVEY.md §5 sanitizer plan).

The decoders are jit-pure by construction; this module adds the opt-in
runtime checks a sanitizer tier would provide: input validation and
output invariants (finite soft values, binary estimates, converged lanes
actually reproducing their syndromes).
"""

from __future__ import annotations

import numpy as np

__all__ = ["validate_inputs", "check_decode_invariants"]


def validate_inputs(decoder, syndromes) -> None:
    """Raise ValueError on malformed syndromes (shape, dtype, values)."""
    syndromes = np.asarray(syndromes)
    if syndromes.ndim != 2 or syndromes.shape[1] != decoder.m:
        raise ValueError(
            f"expected syndromes of shape [B, {decoder.m}], got {syndromes.shape}"
        )
    u = np.unique(syndromes)
    if not np.isin(u, (0, 1)).all():
        raise ValueError(f"syndromes must be 0/1; found values {u[:8]}")


def check_decode_invariants(decoder, syndromes, errors, converged, aux=None) -> None:
    """Assert decoder-output invariants; raise AssertionError on violation.

    * error estimates are 0/1;
    * every converged lane's estimate reproduces its syndrome;
    * auxiliary soft outputs contain no NaNs.
    """
    H = decoder.graph.require_H()
    errors = np.asarray(errors)
    syndromes = np.asarray(syndromes)
    converged = np.asarray(converged)
    u = np.unique(errors)
    assert np.isin(u, (0, 1)).all(), f"non-binary error estimate values {u[:8]}"
    if getattr(decoder, "converged_implies_syndrome_match", True):
        synhat = (errors.astype(np.int64) @ H.astype(np.int64).T) % 2
        bad = np.flatnonzero(converged & (synhat != syndromes).any(axis=1))
        assert bad.size == 0, f"lanes {bad[:8]} flagged converged but syndrome mismatches"
    for k, v in (aux or {}).items():
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating):
            assert not np.isnan(v).any(), f"NaN in aux['{k}']"
