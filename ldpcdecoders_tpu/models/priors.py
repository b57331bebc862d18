"""Channel-prior helpers shared by the decoder families.

One place validates the scalar-or-per-bit ``per`` argument and converts
it to each decoder's native prior domain (probability ratio, binary LLR,
depolarizing LLR, quantized LLR).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "validate_per",
    "per_to_ratio",
    "per_to_llr",
    "per_to_depolarizing_llr",
    "per_to_quantized_llr",
    "next_pow2",
]


def validate_per(per, n: int):
    """Accept a scalar, an [n] vector, or a per-lane [B, n] matrix in
    (0, 1); return float64 ndarray.

    The [B, n] form carries *per-lane* priors — e.g. a mixed
    erasure+flip channel where each lane's erased bits get p=0.5
    (LLR 0 / ratio 1), or analog soft information per shot.

    Traced values (a jitted sweep step passing the noise rate as an XLA
    argument so one compiled program serves every noise point) pass
    through shape-checked but unconverted — the conversion helpers below
    stay jnp-composable in that case (f32 on device).
    """
    import jax

    if isinstance(per, jax.core.Tracer):
        if per.ndim > 2 or (per.ndim >= 1 and per.shape[-1] != n):
            raise ValueError(
                f"per must be a scalar, an [{n}] vector, or [B, {n}]")
        return per
    per_arr = np.asarray(per, dtype=np.float64)
    if per_arr.ndim > 2 or (per_arr.ndim >= 1 and per_arr.shape[-1] != n):
        raise ValueError(f"per must be a scalar, an [{n}] vector, or [B, {n}]")
    return per_arr


def per_to_ratio(per, n: int) -> np.ndarray:
    """p -> p/(1-p) (sum-product probability-ratio domain)."""
    p = validate_per(per, n)
    return p / (1.0 - p)


def per_to_llr(per, n: int) -> np.ndarray:
    """p -> log((1-p)/p) (binary-symmetric-channel LLR)."""
    import jax

    p = validate_per(per, n)
    if isinstance(p, jax.core.Tracer):
        import jax.numpy as jnp

        return jnp.log((1.0 - p) / p)
    return np.log((1.0 - p) / p)


def per_to_depolarizing_llr(per, n: int) -> np.ndarray:
    """p -> log((1-2p/3)/(2p/3)) (depolarizing prior, bpots_decoder.jl:231)."""
    import jax

    p = validate_per(per, n)
    if isinstance(p, jax.core.Tracer):
        import jax.numpy as jnp

        return jnp.log((1.0 - 2.0 * p / 3.0) / (2.0 * p / 3.0))
    return np.log((1.0 - 2.0 * p / 3.0) / (2.0 * p / 3.0))


def per_to_quantized_llr(per, scale: float) -> int:
    """Scalar p -> round(scale * llr) clipped to int8 range."""
    if np.ndim(per):
        raise ValueError("quantized decoders need a scalar per")
    return int(np.clip(round(float(np.log((1.0 - per) / per) * scale)), -127, 127))


def next_pow2(x: int) -> int:
    b = 1
    while b < x:
        b *= 2
    return b
