"""Quasi-cyclic min-sum decoder: the fully-fused VMEM-resident TPU path.

``QCMinSumDecoder`` decodes codes built by lifting a QC base matrix
(codes/qc.py).  Two backends share one semantics (normalized/offset
min-sum, per-lane early stop):

  * ``backend='pallas'`` — the whole decode (every BP iteration, the
    syndrome check, the early exit) runs as ONE Pallas kernel with all
    messages resident in VMEM (ops/pallas_qc.py).  Cross-layout moves are
    static cyclic rolls, so no HBM round-trips happen between iterations —
    the structural win that arbitrary-graph codes cannot get on today's
    Mosaic (no in-kernel gather; see docs/ROADMAP.md).
  * ``backend='xla'`` — the generic edge-list decoder
    (models/minsum.py) on the lifted Tanner graph; the correctness oracle
    and the portable fallback.

The lifted graph orders each check's neighbors by ascending variable
index, matching the generic decoder's slot order, so the two backends
tie-break identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.graph import TannerGraph
from ..codes.qc import qc_lift_edges
from .base import Decoder
from .minsum import make_minsum_decode_fn
from .priors import per_to_llr

__all__ = ["QCMinSumDecoder"]


class QCMinSumDecoder(Decoder):
    """Normalized/offset min-sum decoder for quasi-cyclic LDPC codes.

    Args:
      base: ``[mb, nb]`` QC base matrix (-1 = zero block, else circulant
        shift in ``[0, Z)``); see codes/qc.py.
      Z: lift (circulant) size.  The compiled Pallas path is fastest with
        ``Z`` a multiple of 128 (full TPU lanes).
      per: physical error rate (sets the scalar channel LLR).
      max_iters: maximum BP iterations.
      alpha, beta: min-sum normalization / offset.
      backend: 'pallas' (fused whole-decode kernel) or 'xla' (generic
        edge-list decoder on the lifted graph).
      batch_tile: Pallas batch-tile size (lanes decoded per kernel
        program); batches are padded up to a multiple of this.  32 is
        the measured sweet spot on v5e (amortizes per-op control
        overhead while keeping per-tile early exit fine-grained).
      interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Example:

    >>> import numpy as np
    >>> from ldpcdecoders_tpu import QCMinSumDecoder, random_qc_base_matrix
    >>> base = random_qc_base_matrix(8, 4, 2, 16, rng=0)
    >>> dec = QCMinSumDecoder(base, 16, 0.05, 20, backend='xla')
    >>> syn = np.zeros(dec.m, np.int8)
    >>> err, converged = dec.decode(syn)
    >>> int(err.sum()), converged
    (0, True)
    """

    supports_vector_prior = False  # the channel prior is one scalar LLR

    def __init__(
        self,
        base,
        Z: int,
        per: float,
        max_iters: int,
        *,
        alpha: float = 1.0,
        beta: float = 0.0,
        backend: str = "pallas",
        batch_tile: int = 32,
        interpret: bool = False,
    ):
        base = np.asarray(base, dtype=np.int64)
        rows, cols, m, n = qc_lift_edges(base, Z)
        H = None
        if m * n <= 4_000_000:  # attach dense H only at debug-tool sizes
            H = np.zeros((m, n), np.uint8)
            H[rows, cols] = 1
        self.graph = TannerGraph.from_edges(rows, cols, m, n, H=H)
        self.base = base
        self.Z = int(Z)
        self.m, self.n = m, n
        self.per = float(per)
        self.max_iters = int(max_iters)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.backend = backend
        self.batch_tile = int(batch_tile)
        if backend == "pallas":
            from ..ops.pallas_qc import make_qc_minsum_pallas_fn

            self.supports_per_override = False  # the kernel bakes the prior
            self._decode_fn = make_qc_minsum_pallas_fn(
                base,
                Z,
                float(per_to_llr(self.per, 1)),
                self.max_iters,
                alpha=self.alpha,
                beta=self.beta,
                batch_tile=self.batch_tile,
                interpret=interpret,
            )
        elif backend == "xla":
            self._decode_fn = jax.jit(
                make_minsum_decode_fn(
                    self.graph, self.per, self.max_iters, alpha=self.alpha, beta=self.beta
                )
            )
        else:
            raise ValueError(f"unknown backend {backend!r} (want 'pallas' or 'xla')")

    def _decode_batch(self, syndromes, seed: int = 0, per=None):
        syndromes = jnp.asarray(syndromes)
        if self.backend == "xla":
            L0 = None
            if per is not None:
                L0 = jnp.asarray(per_to_llr(per, self.n), jnp.float32)
            err, converged, iters, llrs = self._decode_fn(syndromes, L0)
            return err, converged, iters, {"llrs": llrs}
        B = syndromes.shape[0]
        pad = (-B) % self.batch_tile
        if pad:
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((pad, self.m), syndromes.dtype)], axis=0
            )
        err, converged, iters, llrs = self._decode_fn(syndromes)
        if pad:
            err, converged, iters, llrs = (
                err[:B],
                converged[:B],
                iters[:B],
                llrs[:B],
            )
        return err, converged, iters, {"llrs": llrs}
