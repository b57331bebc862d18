"""Quasi-cyclic / group-circulant min-sum decoder: the fused VMEM path.

``QCMinSumDecoder`` decodes codes with circulant block structure.  Two
backends share one semantics (normalized/offset min-sum, per-lane early
stop):

  * ``backend='pallas'`` — the whole decode (every BP iteration, the
    syndrome check, the early exit) runs as ONE Pallas kernel with all
    messages resident in VMEM (ops/pallas_qc.py).  Cross-layout moves
    are static cyclic rolls (plus a select for 2-D group shifts), so no
    HBM round-trips happen between iterations — the structural win that
    arbitrary-graph codes cannot get on today's Mosaic (no in-kernel
    gather; see docs/ROADMAP.md).
  * ``backend='xla'`` — the generic edge-list decoder
    (models/minsum.py) on the lifted Tanner graph; the correctness
    oracle and the portable fallback.

Three construction paths:

  * ``QCMinSumDecoder(base, Z, ...)`` — 1-D quasi-cyclic base matrix
    (codes/qc.py); the lifted graph orders each check's neighbors by
    ascending variable index, matching the generic decoder's slot
    order, so the two backends tie-break identically (bitwise parity).
  * ``QCMinSumDecoder.from_group_terms(terms, mb, nb, group, ...)`` —
    2-D group-circulant edge terms over ``Z_l x Z_m``
    (codes/qc.py::qc_group_lift_edges).
  * ``QCMinSumDecoder.for_bicycle(code, block, ...)`` — one stabilizer
    block (Hx or Hz) of a bivariate bicycle quantum code
    (codes/bicycle.py); transposed blocks use inverse monomials.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.graph import TannerGraph
from ..codes.qc import qc_group_lift_edges, qc_lift_edges
from .base import Decoder
from .minsum import make_minsum_decode_fn
from .priors import per_to_llr

__all__ = ["QCMinSumDecoder"]


class QCMinSumDecoder(Decoder):
    """Normalized/offset min-sum decoder for group-circulant LDPC codes.

    Args:
      base: ``[mb, nb]`` QC base matrix (-1 = zero block, else circulant
        shift in ``[0, Z)``); see codes/qc.py.
      Z: lift (circulant) size.  The compiled Pallas path is fastest with
        ``Z`` a multiple of 128 (full TPU lanes).
      per: physical error rate (sets the scalar channel LLR).
      max_iters: maximum BP iterations (full sweeps for 'layered').
      alpha, beta: min-sum normalization / offset.  alpha=None resolves
        to the schedule default: 1.0 flooding, 0.8 layered (the layered
        schedule amplifies min-sum's magnitude overestimate — see
        models/layered.py for the measurement).
      backend: 'pallas' (fused whole-decode kernel) or 'xla' (generic
        edge-list decoder on the lifted graph).
      schedule: 'flooding' (default) or 'layered' (serial-C over base
        rows — conflict-free layers for single-term blocks, ~2x fewer
        sweeps; the XLA backend uses its own greedy conflict-free
        partition of the lifted graph, so the two backends match only
        behaviorally under 'layered', not bitwise).
      batch_tile: Pallas batch-tile size (lanes decoded per kernel
        program); batches are padded up to a multiple of this.  None
        (default) auto-picks the largest power-of-two <= 32 whose
        estimated VMEM footprint fits the measured budget; 32 is the
        sweet spot on v5e when it fits (amortizes per-op control
        overhead while keeping per-tile early exit fine-grained).
        Explicit values are honored as-is (and raise past the budget).
      dtype: message precision — jnp.float32 (default) or jnp.bfloat16
        (half the VMEM / register traffic; LLR outputs stay float32).
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

    def __init__(
        self,
        base,
        Z: int,
        per: float,
        max_iters: int,
        *,
        alpha: float | None = None,
        beta: float = 0.0,
        backend: str = "pallas",
        schedule: str = "flooding",
        algorithm: str = "minsum",
        batch_tile: int | None = None,
        dtype=jnp.float32,
        interpret: bool = False,
    ):
        base = np.asarray(base, dtype=np.int64)
        rows, cols, m, n = qc_lift_edges(base, Z)
        mb, nb = base.shape
        bi, bj = np.nonzero(base >= 0)
        terms = [(int(i), int(j), int(base[i, j]), 0) for i, j in zip(bi, bj)]
        self.base = base
        self._setup(
            terms, mb, nb, (int(Z), 1), rows, cols, per, max_iters,
            alpha=alpha, beta=beta, backend=backend, schedule=schedule,
            algorithm=algorithm, batch_tile=batch_tile, dtype=dtype,
            interpret=interpret,
        )

    @classmethod
    def from_group_terms(
        cls,
        terms,
        mb: int,
        nb: int,
        group: tuple[int, int],
        per: float,
        max_iters: int,
        *,
        alpha: float | None = None,
        beta: float = 0.0,
        backend: str = "pallas",
        schedule: str = "flooding",
        algorithm: str = "minsum",
        batch_tile: int | None = None,
        dtype=jnp.float32,
        interpret: bool = False,
    ) -> "QCMinSumDecoder":
        """Build from 2-D group-circulant edge terms over ``Z_l x Z_m``.

        ``terms`` is a list of ``(i, j, a, b)``: the monomial ``x^a y^b``
        in block ``(i, j)`` (multiple terms per block allowed).  See
        codes/qc.py::qc_group_lift_edges for the lifting convention.
        """
        gl, gm = (int(x) for x in group)
        terms = [tuple(int(x) for x in t) for t in terms]
        rows, cols, m, n = qc_group_lift_edges(terms, mb, nb, gl, gm)
        self = cls.__new__(cls)
        self.base = None
        self._setup(
            terms, int(mb), int(nb), (gl, gm), rows, cols, per, max_iters,
            alpha=alpha, beta=beta, backend=backend, schedule=schedule,
            algorithm=algorithm, batch_tile=batch_tile, dtype=dtype,
            interpret=interpret,
        )
        return self

    @classmethod
    def for_bicycle(cls, code, block: str, per: float, max_iters: int, **kwargs) -> "QCMinSumDecoder":
        """Decoder for one stabilizer block of a bivariate bicycle code.

        Args:
          code: a registry name ("bb144", ...) or ``(l, m, a_terms,
            b_terms)`` tuple (codes/bicycle.py conventions).
          block: 'x' for ``Hx = [A | B]`` or 'z' for ``Hz = [B^T | A^T]``
            (transposed monomial blocks become inverse monomials).
          **kwargs: forwarded to :meth:`from_group_terms`.

        Example:

        >>> from ldpcdecoders_tpu import QCMinSumDecoder
        >>> dec = QCMinSumDecoder.for_bicycle("bb72", "x", 0.01, 30,
        ...                                   backend='xla')
        >>> dec.m, dec.n
        (36, 72)
        """
        if isinstance(code, str):
            from ..codes.bicycle import BICYCLE_CODES

            if code not in BICYCLE_CODES:
                raise ValueError(
                    f"unknown BB code '{code}' (choose from {sorted(BICYCLE_CODES)})"
                )
            info = BICYCLE_CODES[code]
            l, m, a_terms, b_terms = info["l"], info["m"], info["a_terms"], info["b_terms"]
        else:
            l, m, a_terms, b_terms = code
        l, m = int(l), int(m)

        def fwd(ts):
            return [(int(a) % l, int(b) % m) for a, b in ts]

        def inv(ts):
            return [((l - int(a)) % l, (m - int(b)) % m) for a, b in ts]

        if block == "x":  # Hx = [A | B]
            blocks = (fwd(a_terms), fwd(b_terms))
        elif block == "z":  # Hz = [B^T | A^T]; transpose of x^a y^b is its inverse
            blocks = (inv(b_terms), inv(a_terms))
        else:
            raise ValueError(f"block must be 'x' or 'z', got {block!r}")
        terms = [(0, j, a, b) for j, ts in enumerate(blocks) for a, b in ts]
        return cls.from_group_terms(terms, 1, 2, (l, m), per, max_iters, **kwargs)

    def _setup(
        self, terms, mb, nb, group, rows, cols, per, max_iters,
        *, alpha, beta, backend, schedule, algorithm, batch_tile, dtype,
        interpret,
    ):
        gl, gm = group
        Z = gl * gm
        m, n = mb * Z, nb * Z
        H = None
        if m * n <= 4_000_000:  # attach dense H only at debug-tool sizes
            H = np.zeros((m, n), np.uint8)
            H[rows, cols] = 1
        self.graph = TannerGraph.from_edges(rows, cols, m, n, H=H)
        self.terms = terms
        self.group = (gl, gm)
        self.Z = Z
        self.m, self.n = m, n
        self.per = float(per)
        self.max_iters = int(max_iters)
        if schedule not in ("flooding", "layered"):
            raise ValueError(
                f"unknown schedule {schedule!r} (want 'flooding' or 'layered')"
            )
        self.schedule = schedule
        if algorithm not in ("minsum", "sumproduct"):
            raise ValueError(
                f"unknown algorithm {algorithm!r} (want 'minsum' or 'sumproduct')"
            )
        self.algorithm = algorithm
        if backend == "auto":
            # mirror DecoderConfig's resolution: the fused kernel on TPU,
            # the generic XLA edge-list decoder elsewhere (CPU/GPU cannot
            # lower the Mosaic kernel)
            backend = ("pallas" if jax.devices()[0].platform == "tpu"
                       else "xla")
        self.alpha = float(alpha) if alpha is not None else (
            0.8 if schedule == "layered" and algorithm == "minsum" else 1.0
        )
        self.beta = float(beta)
        self.backend = backend
        self.dtype = jnp.dtype(dtype).type  # scalar type: callable like jnp.float32
        if batch_tile is None:
            # auto: the largest power-of-two tile <= 32 whose estimated
            # VMEM footprint fits the measured budget (explicit values
            # are honored as-is and raise past the budget)
            from ..ops.pallas_qc import VMEM_BUDGET, qc_vmem_estimate

            batch_tile = 32
            while batch_tile > 1 and qc_vmem_estimate(
                len(terms), mb, nb, Z, batch_tile,
                jnp.dtype(dtype).itemsize, schedule == "layered",
            ) > VMEM_BUDGET:
                batch_tile //= 2
        self.batch_tile = int(batch_tile)
        self._mb, self._nb = mb, nb
        self._interpret = bool(interpret)
        if backend == "pallas":
            from ..ops.pallas_qc import make_group_qc_minsum_pallas_fn

            # the default kernel bakes the scalar prior (fastest); the
            # first per= override lazily compiles a second kernel that
            # takes per-bit LLRs as a VMEM input (erasures / punctured
            # bits / sweeps), cached for the decoder's lifetime
            self._prior_decode_fn = None
            self._prior_tile = None
            self._decode_fn = make_group_qc_minsum_pallas_fn(
                terms,
                mb,
                nb,
                (gl, gm),
                float(per_to_llr(self.per, 1)),
                self.max_iters,
                alpha=self.alpha,
                beta=self.beta,
                batch_tile=self.batch_tile,
                schedule=schedule,
                algorithm=algorithm,
                dtype=self.dtype,
                interpret=interpret,
            )
        elif backend == "xla":
            if algorithm == "sumproduct":
                if schedule == "layered":
                    raise ValueError(
                        "layered sum-product is only available on the "
                        "pallas backend (the XLA layered path is min-sum)"
                    )
                from .bp import make_bp_decode_fn

                self._decode_fn = jax.jit(
                    make_bp_decode_fn(self.graph, self.per, self.max_iters)
                )
            elif schedule == "layered":
                from .layered import make_layered_minsum_fn

                self._decode_fn = jax.jit(
                    make_layered_minsum_fn(
                        self.graph, self.per, self.max_iters,
                        alpha=self.alpha, beta=self.beta, dtype=self.dtype,
                    )
                )
            else:
                self._decode_fn = jax.jit(
                    make_minsum_decode_fn(
                        self.graph, self.per, self.max_iters,
                        alpha=self.alpha, beta=self.beta, dtype=self.dtype,
                    )
                )
        else:
            raise ValueError(f"unknown backend {backend!r} (want 'pallas' or 'xla')")

    def _ensure_prior_kernel(self):
        """Lazily build (and cache) the per-bit-prior variant of the fused
        kernel; its batch tile may be smaller (one extra VMEM input)."""
        if self._prior_decode_fn is None:
            from ..ops.pallas_qc import (
                VMEM_BUDGET,
                make_group_qc_minsum_pallas_fn,
                qc_vmem_estimate,
            )

            tile = self.batch_tile
            while tile > 1 and qc_vmem_estimate(
                len(self.terms), self._mb, self._nb, self.Z, tile,
                jnp.dtype(self.dtype).itemsize, self.schedule == "layered",
                prior_input=True,
            ) > VMEM_BUDGET:
                tile //= 2
            self._prior_tile = tile
            self._prior_decode_fn = make_group_qc_minsum_pallas_fn(
                self.terms, self._mb, self._nb, self.group,
                0.0,  # unused in prior-input mode
                self.max_iters,
                alpha=self.alpha, beta=self.beta, batch_tile=tile,
                schedule=self.schedule, algorithm=self.algorithm,
                dtype=self.dtype, interpret=self._interpret,
                prior_input=True,
            )
        return self._prior_decode_fn, self._prior_tile

    def _decode_batch(self, syndromes, seed: int = 0, per=None):
        syndromes = jnp.asarray(syndromes)
        if self.backend == "xla":
            arg = None
            if per is not None:
                if self.algorithm == "sumproduct":
                    # bp decode takes the channel probability ratio p/(1-p);
                    # per_to_ratio handles scalar/[n]/[B, n] uniformly
                    from .priors import per_to_ratio

                    arg = jnp.asarray(per_to_ratio(per, self.n), jnp.float32)
                else:
                    arg = jnp.asarray(per_to_llr(per, self.n), jnp.float32)
            err, converged, iters, soft = self._decode_fn(syndromes, arg)
            key = "log_probabs" if self.algorithm == "sumproduct" else "llrs"
            return err, converged, iters, {key: soft}
        B = syndromes.shape[0]
        if per is not None:
            decode_fn, tile = self._ensure_prior_kernel()
            L0 = np.broadcast_to(
                np.asarray(per_to_llr(per, self.n), np.float32), (B, self.n)
            )
        else:
            decode_fn, tile = self._decode_fn, self.batch_tile
            L0 = None
        pad = (-B) % tile
        if pad:
            syndromes = jnp.concatenate(
                [syndromes, jnp.zeros((pad, self.m), syndromes.dtype)], axis=0
            )
            if L0 is not None:
                # pad lanes decode the zero syndrome; a solidly positive
                # LLR keeps them trivially converged
                L0 = np.concatenate(
                    [L0, np.full((pad, self.n), 10.0, np.float32)], axis=0
                )
        if L0 is not None:
            err, converged, iters, llrs = decode_fn(syndromes, jnp.asarray(L0))
        else:
            err, converged, iters, llrs = decode_fn(syndromes)
        if pad:
            err, converged, iters, llrs = (
                err[:B],
                converged[:B],
                iters[:B],
                llrs[:B],
            )
        return err, converged, iters, {"llrs": llrs}
