"""Bucketed serving wrapper: arbitrary batch sizes, bounded recompiles.

XLA compiles one program per batch shape; a serving workload with
variable request sizes would otherwise trigger unbounded recompilation.
``BucketedDecoder`` wraps any framework decoder and pads each request up
to the next power-of-two bucket (capped at ``max_bucket``, larger
requests are chunked), so at most ``log2(max_bucket)`` programs are ever
compiled per decoder.  Pad lanes decode the all-zero syndrome (converges
immediately — near-zero marginal cost) and are stripped from the output.
"""

from __future__ import annotations

import numpy as np

from .base import Decoder
from .priors import next_pow2 as _next_pow2

__all__ = ["BucketedDecoder"]


class BucketedDecoder(Decoder):
    """Wrap a decoder with power-of-two batch bucketing.

    Args:
      inner: any framework decoder.
      min_bucket: smallest bucket (small requests pad up to this).
      max_bucket: largest single-program batch; bigger requests run in
        ``max_bucket`` chunks.
    """

    def __init__(self, inner: Decoder, *, min_bucket: int = 32, max_bucket: int = 4096):
        self.inner = inner
        self.graph = inner.graph
        self.m, self.n = inner.m, inner.n
        self.converged_implies_syndrome_match = inner.converged_implies_syndrome_match
        self.supports_per_override = inner.supports_per_override
        self.supports_vector_prior = inner.supports_vector_prior
        if min_bucket < 1 or max_bucket < min_bucket:
            raise ValueError("need 1 <= min_bucket <= max_bucket")
        self.min_bucket = _next_pow2(min_bucket)
        self.max_bucket = _next_pow2(max_bucket)

    def _decode_batch(self, syndromes, seed: int = 0, per=None):
        syndromes = np.asarray(syndromes)
        B = syndromes.shape[0]
        errs = np.zeros((B, self.n), np.int8)
        conv = np.zeros((B,), bool)
        iters = np.zeros((B,), np.int32)
        aux_parts: list = []

        start = 0
        chunk_idx = 0
        while start < B:
            remaining = B - start
            size = min(remaining, self.max_bucket)
            bucket = max(self.min_bucket, _next_pow2(size))
            bucket = min(bucket, self.max_bucket)
            chunk = syndromes[start : start + size]
            if bucket > size:
                pad = np.zeros((bucket - size, self.m), dtype=syndromes.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            e, c, it, aux = self.inner._call_decode(chunk, seed + chunk_idx, per)
            errs[start : start + size] = np.asarray(e)[:size]
            conv[start : start + size] = np.asarray(c)[:size]
            iters[start : start + size] = np.asarray(it)[:size]
            aux_parts.append({k: np.asarray(v)[:size] for k, v in aux.items()})
            start += size
            chunk_idx += 1

        merged = {}
        if aux_parts and aux_parts[0]:
            merged = {
                k: np.concatenate([p[k] for p in aux_parts], axis=0)
                for k in aux_parts[0]
            }
        return errs, conv, iters, merged
