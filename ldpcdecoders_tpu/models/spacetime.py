"""Multi-round decoding under measurement noise (phenomenological model).

The reference's decoders assume each syndrome bit is measured perfectly
(/root/reference/src/decoders/belief_propagation.jl:121-188 takes one
exact ``syndrome``).  :class:`SpaceTimeDecoder` drops that assumption:
it decodes ``R`` consecutive noisy measurement rounds jointly over the
space-time detector graph built by ``codes/spacetime.py`` — one sparse
parity-check matrix whose variables are every round's fresh data errors
and every round's readout errors, so the whole thing runs through the
existing batched TPU decoders (BP, min-sum, BP+OSD, ...) as-is, in one
compiled program per batch of shots.

TPU shape notes: the space-time matrix for ``R`` rounds of an ``[m, n]``
block has ``R*m`` checks and ``R*n + (R-1)*m`` variables — still one
static-shape Tanner graph, so the batch axis stays the only axis XLA
parallelizes over and FER sweeps reuse one executable across noise
points (the prior is a traced argument).
"""

from __future__ import annotations

import numpy as np

from ..codes.spacetime import detectors_of, spacetime_pcm, spacetime_prior
from ..config import DecoderConfig

__all__ = ["SpaceTimeDecoder"]


class SpaceTimeDecoder:
    """Joint decoder for ``R`` noisy syndrome-measurement rounds.

    Args:
      H: ``[m, n]`` stabilizer block (dense or scipy.sparse 0/1).
      rounds: number of measurement rounds ``R >= 1``.  The last round
        is assumed noiseless (``perfect_last=True``; the standard closed
        decoding problem — ``rounds=1`` is then exactly single-shot
        decoding on ``H``).
      per: per-round fresh data-error probability (scalar or ``[n]``).
      max_iters: BP iteration cap of the inner decoder.
      meas_error_rate: readout-flip probability per syndrome bit and
        round (scalar or ``[m]``); defaults to ``per`` — the usual
        ``p == q`` phenomenological convention.
      decoder: inner decoder kind (any prior-capable `DecoderConfig`
        kind: bp, bposd, minsum, layered_minsum, bpots, ...).  Default
        "bposd" for syndrome-consistent output.
      perfect_last: see above; ``False`` leaves the final round noisy
        (open boundary for sliding-window use).
      **knobs: extra DecoderConfig fields (osd_order, alpha, ...).

    The primary entry points take either the raw multi-round syndrome
    history (``decode_history``) or a precomputed detector record
    (``batch_decode``); both return the estimated *cumulative* data
    error — the correction to apply after round ``R``.
    """

    def __init__(self, H, rounds: int, per, max_iters: int, *,
                 meas_error_rate=None, decoder: str = "bposd",
                 perfect_last: bool = True, **knobs):
        import scipy.sparse as sp

        Hs = sp.csr_matrix(H).astype(np.uint8)
        self.m, self.n = Hs.shape
        self.rounds = int(rounds)
        self.perfect_last = bool(perfect_last)
        q = per if meas_error_rate is None else meas_error_rate
        self._q_default = q  # kept for rounds=1 prior overrides: the
        # perfect-last single-round prior has no measurement columns to
        # slice the default q back out of (see _prior_vec)
        self._prior = spacetime_prior(self.n, self.m, self.rounds, per, q,
                                      perfect_last=self.perfect_last)
        self.A = spacetime_pcm(Hs, self.rounds, perfect_last=self.perfect_last)
        self.n_meas_rounds = self.rounds - 1 if self.perfect_last else self.rounds
        cfg = DecoderConfig(kind=decoder, per=float(self._prior.mean()),
                            max_iters=max_iters, **knobs)
        # rounds == 1 && perfect_last: A == H exactly — skip the sparse
        # detour so the inner decoder is bit-identical to single-shot
        self.inner = cfg.build(Hs if (self.rounds == 1 and self.perfect_last)
                               else self.A)
        if not (self.inner.supports_per_override
                and self.inner.supports_vector_prior):
            raise ValueError(
                f"decoder kind '{decoder}' cannot honor the mixed "
                "data/measurement prior vector; use a prior-capable kind "
                "(bp, bposd, minsum, layered_minsum, bpots)"
            )

    def _prior_vec(self, per, q):
        if per is None and q is None:
            return self._prior
        p = self._prior[: self.n] if per is None else per
        if q is not None:
            qq = q
        elif self.n_meas_rounds > 0:
            qq = self._prior[self.rounds * self.n:
                             self.rounds * self.n + self.m]
        else:
            # rounds=1 with perfect_last has zero measurement columns, so
            # the stored prior can't be sliced for q — fall back to the
            # constructor's default (it is unused downstream anyway)
            qq = self._q_default
        return spacetime_prior(self.n, self.m, self.rounds, p, qq,
                               perfect_last=self.perfect_last)

    def batch_decode(self, detectors, *, seed: int = 0, per=None, q=None):
        """Decode detector records ``[B, R*m]`` (see ``detectors_of``).

        ``per`` / ``q`` optionally override the data / measurement error
        rates (traced — one compiled program serves a whole sweep).

        Returns ``(errors [B, n] int8, converged [B] bool)`` where
        ``errors`` is the estimated cumulative data error after the last
        round (XOR of every round's fresh-error estimate).
        """
        err, conv, _, _ = self._decode_detailed(detectors, seed, per, q)
        return err, conv

    def batch_decode_detailed(self, detectors, *, seed: int = 0, per=None,
                              q=None):
        """Like :meth:`batch_decode`, also returning the per-round split:
        ``(errors [B, n], converged [B], data_rounds [B, R, n],
        meas [B, R_noisy, m])``."""
        return self._decode_detailed(detectors, seed, per, q)

    def _decode_detailed(self, detectors, seed, per, q):
        detectors = np.asarray(detectors)
        if detectors.ndim != 2 or detectors.shape[1] != self.rounds * self.m:
            raise ValueError(
                f"expected detectors of shape [B, {self.rounds * self.m}] "
                f"(rounds={self.rounds} x m={self.m}), got {detectors.shape}"
            )
        prior = self._prior_vec(per, q)
        x_hat, conv = self.inner.batch_decode(detectors, seed=seed, per=prior)
        x_hat = np.asarray(x_hat)
        B = x_hat.shape[0]
        data = x_hat[:, : self.rounds * self.n].reshape(B, self.rounds, self.n)
        meas = x_hat[:, self.rounds * self.n:].reshape(
            B, self.n_meas_rounds, self.m)
        cum = (data.astype(np.uint8).sum(axis=1) & 1).astype(np.int8)
        return cum, np.asarray(conv), data, meas

    def decode_history(self, syndromes, *, seed: int = 0, per=None, q=None):
        """Decode raw measured syndrome histories ``[B, R, m]`` (or a
        single ``[R, m]`` shot): forms the XOR-difference detector record
        and calls :meth:`batch_decode`."""
        s = np.asarray(syndromes)
        single = s.ndim == 2
        d = detectors_of(s)
        err, conv = self.batch_decode(d[None] if single else d, seed=seed,
                                      per=per, q=q)
        return (err[0], bool(conv[0])) if single else (err, conv)
