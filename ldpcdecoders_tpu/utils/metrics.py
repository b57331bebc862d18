"""Decoding-quality metrics matching the reference test oracles.

The reference measures (a) exact-recovery logical error rate
(test_bp_decoder.jl:19-43) and (b) syndrome-match rate
(test_bpots.jl:41-55).  Both are first-class here, plus converged-fraction
and Wilson confidence intervals for FER sweeps.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "exact_recovery_ler",
    "syndrome_match_rate",
    "wilson_interval",
]


def exact_recovery_ler(guesses: np.ndarray, true_errors: np.ndarray) -> float:
    """Fraction of lanes whose estimate differs from the injected error."""
    exact = (np.asarray(guesses).astype(bool) == np.asarray(true_errors).astype(bool)).all(axis=1)
    return float(1.0 - exact.mean())


def syndrome_match_rate(H: np.ndarray, guesses: np.ndarray, syndromes: np.ndarray) -> float:
    """Fraction of lanes whose estimate reproduces its input syndrome."""
    synhat = (np.asarray(guesses).astype(np.int64) @ np.asarray(H).astype(np.int64).T) % 2
    return float((synhat == np.asarray(syndromes)).all(axis=1).mean())


def wilson_interval(failures: int, trials: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson score interval for a failure-rate estimate.

    Example:
      >>> lo, hi = wilson_interval(5, 100)
      >>> bool(lo < 0.05 < hi)
      True
    """
    if trials == 0:
        return (0.0, 1.0)
    p = failures / trials
    denom = 1.0 + z * z / trials
    center = (p + z * z / (2 * trials)) / denom
    half = z * math.sqrt(p * (1 - p) / trials + z * z / (4 * trials * trials)) / denom
    return (max(0.0, center - half), min(1.0, center + half))
