"""FER/LER sweep harness with checkpoint/resume.

Elevates the reference tests' ad-hoc LER measurements
(test_bp_decoder.jl:19-43) into a first-class evaluation tool
(SURVEY.md §7.2 step 8): batched decoding per physical-error-rate point,
accumulated trial/failure counts checkpointed to JSON after every batch so
long sweeps survive interruption, and structured per-point statistics
(FER, exact-recovery LER, syndrome-match rate, converged fraction, Wilson
intervals).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Sequence

import numpy as np

from .models.base import Decoder
from .utils.io import atomic_write_json, read_json
from .utils.metrics import wilson_interval
from .utils.noise import sample_errors, syndromes_of

__all__ = ["FERSweep", "SweepPoint"]


@dataclasses.dataclass
class SweepPoint:
    """Accumulated statistics at one physical error rate."""

    per: float
    trials: int = 0
    steps: int = 0  # batches decoded; indexes this point's RNG streams
    exact_failures: int = 0  # estimate != injected error
    syndrome_mismatches: int = 0  # estimate does not reproduce syndrome
    non_converged: int = 0
    total_iters: int = 0
    wall_seconds: float = 0.0

    @property
    def ler(self) -> float:
        return self.exact_failures / self.trials if self.trials else 0.0

    @property
    def syndrome_match_rate(self) -> float:
        return 1.0 - (self.syndrome_mismatches / self.trials) if self.trials else 1.0

    @property
    def converged_fraction(self) -> float:
        return 1.0 - (self.non_converged / self.trials) if self.trials else 1.0

    def summary(self) -> dict:
        lo, hi = wilson_interval(self.exact_failures, self.trials)
        return {
            "per": self.per,
            "trials": self.trials,
            "ler": self.ler,
            "ler_ci95": [lo, hi],
            "syndrome_match_rate": self.syndrome_match_rate,
            "converged_fraction": self.converged_fraction,
            "mean_iters": self.total_iters / self.trials if self.trials else 0.0,
            "throughput_syndromes_per_s": (
                self.trials / self.wall_seconds if self.wall_seconds else 0.0
            ),
        }


class FERSweep:
    """Checkpointable frame-error-rate sweep over physical error rates.

    Args:
      H: parity-check matrix.
      decoder_factory: ``per -> Decoder`` (a fresh decoder per noise point,
        mirroring how the reference constructs decoders with the channel
        prior baked in).
      pers: physical error rates to sweep.
      batch: syndromes decoded per step.
      checkpoint_path: optional JSON path; progress is saved after every
        batch and picked up on restart.
      seed: base seed; each (point, batch) pair derives its own stream, so
        resumed runs reproduce the uninterrupted run exactly.
    """

    def __init__(
        self,
        H,
        decoder_factory: Callable[[float], Decoder],
        pers: Sequence[float],
        *,
        batch: int = 256,
        checkpoint_path: str | None = None,
        seed: int = 0,
    ):
        self.H = np.asarray(H.toarray() if hasattr(H, "toarray") else H)
        self.decoder_factory = decoder_factory
        self.batch = int(batch)
        self.checkpoint_path = checkpoint_path
        self.seed = int(seed)
        self.points = {float(p): SweepPoint(per=float(p)) for p in pers}
        if checkpoint_path and os.path.exists(checkpoint_path):
            self._load_checkpoint()

    # -- checkpointing ----------------------------------------------------

    def _load_checkpoint(self):
        data = read_json(self.checkpoint_path)
        if data.get("seed") != self.seed or data.get("batch") != self.batch:
            raise ValueError(
                "checkpoint was written with a different seed/batch config"
            )
        for rec in data["points"]:
            p = float(rec["per"])
            if p in self.points:
                self.points[p] = SweepPoint(**rec)

    def _save_checkpoint(self):
        if not self.checkpoint_path:
            return
        atomic_write_json(
            self.checkpoint_path,
            {
                "seed": self.seed,
                "batch": self.batch,
                "points": [dataclasses.asdict(pt) for pt in self.points.values()],
            },
        )

    # -- running ----------------------------------------------------------

    def run(self, *, trials_per_point: int, max_seconds: float | None = None):
        """Accumulate until every point has ``trials_per_point`` trials.

        Returns ``{per: summary_dict}``.  Safe to interrupt and re-run.
        """
        t_start = time.perf_counter()
        n = self.H.shape[1]
        shared_decoder = None  # one compiled program reused across noise
        # points when the decoder supports per-call prior overrides
        per_kw_ok = True
        for per, pt in self.points.items():
            decoder = None
            per_kw = {}
            while pt.trials < trials_per_point:
                if max_seconds is not None and time.perf_counter() - t_start > max_seconds:
                    self._save_checkpoint()
                    return self.summaries()
                if decoder is None:
                    if shared_decoder is not None and per_kw_ok:
                        decoder = shared_decoder
                        per_kw = {"per": per}
                    else:
                        decoder = self.decoder_factory(per)
                        if shared_decoder is None and per_kw_ok:
                            shared_decoder = decoder
                            # pass per explicitly from the start so every
                            # noise point shares one traced program
                            per_kw = {"per": per}
                # each batch consumes its own counted stream; tracking the
                # step explicitly (not trials // batch) keeps resumed runs
                # on fresh streams even after a partial final batch
                step = pt.steps
                per_hash = int(per * 1e9) & 0x7FFFFFFF
                rng = np.random.default_rng((self.seed, per_hash, step))
                # decoder RNG stream derives from (seed, point, step) too —
                # a plain seed+step would reuse identical tie-break streams
                # across noise points, correlating stochastic decoders; the
                # salt keeps it disjoint from the noise-sampling stream
                decode_seed = int(
                    np.random.default_rng(
                        (self.seed, per_hash, step, 0xDEC0DE)
                    ).integers(1 << 31)
                )
                b = min(self.batch, trials_per_point - pt.trials)
                errs = sample_errors(rng, b, n, per)
                syns = syndromes_of(self.H, errs)
                t0 = time.perf_counter()
                try:
                    guesses, conv, iters, aux, _ = decoder.batch_decode_detailed(
                        syns, seed=decode_seed, **per_kw
                    )
                except ValueError:
                    if not per_kw:
                        raise
                    # decoder kind doesn't support prior overrides: fall
                    # back to one decoder per noise point
                    per_kw_ok = False
                    per_kw = {}
                    decoder = self.decoder_factory(per)
                    guesses, conv, iters, aux, _ = decoder.batch_decode_detailed(
                        syns, seed=decode_seed
                    )
                dt = time.perf_counter() - t0
                exact = (guesses.astype(bool) == errs).all(axis=1)
                synhat = syndromes_of(self.H, guesses)
                smatch = (synhat == syns).all(axis=1)
                pt.trials += b
                pt.steps += 1
                pt.exact_failures += int(b - exact.sum())
                pt.syndrome_mismatches += int(b - smatch.sum())
                pt.non_converged += int(b - conv.sum())
                pt.total_iters += int(iters.sum())
                pt.wall_seconds += dt
                self._save_checkpoint()
        return self.summaries()

    def summaries(self) -> dict:
        return {pt.per: pt.summary() for pt in self.points.values()}
