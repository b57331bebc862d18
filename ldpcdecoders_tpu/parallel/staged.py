"""Multi-device story for the staged production tier (VERDICT r4 item 3).

``StagedDemDecoder`` (models/staged.py) is three stages with very
different parallel shapes:

  * **Stage 0** (damped min-sum on every shot) carries ~99% of lanes —
    embarrassingly data-parallel, so it runs here as ONE jitted program
    whose batch axis is sharded over the mesh's ``data`` axis.  GSPMD
    partitions the message arrays; the only collective is the
    early-stop all-reduce inside the ``while_loop`` condition.  This is
    also the HBM-pressure relief: per-device stage-0 footprint drops by
    the mesh size (the round-4 guards engaged exactly here).
  * **Stage 1/2** (deep ensemble buckets + relay + native host OSD)
    touch a few percent of shots.  They compact to the controlling
    process and run the identical single-device tail
    (``StagedDemDecoder._post_stage0``) — under a multi-host launcher,
    each process calls this on its OWN local shard ("pool stragglers
    per host, run host OSD per process") and merges statistics with
    :func:`..multihost.allreduce_counts`.

Reference tie: the batch surface of
/root/reference/src/decoders/abstract_decoder.jl:31-48, which this
sharding layer exists to scale.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .mesh import batch_sharding

__all__ = ["sharded_staged_decode", "staged_local_eval"]


def sharded_staged_decode(dec, detectors, mesh: Mesh, *,
                          data_axis: str = "data", per=None):
    """Data-sharded staged decode: mesh-partitioned stage 0, host tail.

    ``detectors`` is ``[B, D]`` with ``B`` divisible by the mesh's
    ``data`` extent.  Returns ``(errors, solved)`` with the exact
    single-device semantics: stage-0/deep/relay BP-converged lanes
    report ``solved=True``; OSD-repaired lanes report ``False`` but are
    still syndrome-consistent whenever the syndrome is in column span.
    """
    from ..cache import ensure_default_cache

    ensure_default_cache()
    syn = np.asarray(detectors, np.uint8)
    B = syn.shape[0]
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a == data_axis]))
    if B % n_dev != 0:
        raise ValueError(
            f"batch {B} must divide the '{data_axis}' mesh size {n_dev}")
    L0, llr0_np, llr0_d = dec._channel(per)
    syn_sharded = jax.device_put(
        jnp.asarray(syn), batch_sharding(mesh, 2, data_axis))
    err0, conv0, it0, _ = dec._stage0_fn(syn_sharded, L0)
    out, solved, _, _ = dec._post_stage0(
        syn, err0, conv0, it0, L0, llr0_np, llr0_d)
    return out, solved


def staged_local_eval(dec, shots: int, mesh: Mesh, *, seed: int = 0,
                      batch: int = 1024, per=None, **eval_kw) -> dict:
    """Per-host staged evaluation with globally-reduced statistics.

    Each process runs the pipelined evaluator on its OWN slice of the
    shot budget (decorrelated by folding the process index into the
    noise seed) — stage 0 on local devices, straggler pools and native
    OSD on the local host — then failure/trial counts all-reduce across
    the process group.  Single-process: identical to ``run_eval`` plus
    the reduced-stats envelope.
    """
    from .multihost import allreduce_counts

    procs = jax.process_count()
    pid = jax.process_index()
    local_shots = -(-shots // procs)
    st = dec.run_eval(local_shots, batch=batch, per=per,
                      seed=(seed * 1000003 + pid), **eval_kw)
    red = allreduce_counts(
        {"shots": st["shots"], "fails": st["fails"],
         "deep_shots": st["profile"]["deep_shots"],
         "osd_shots": st["profile"]["osd_shots"]}, mesh)
    from ..utils.metrics import wilson_interval

    lo, hi = wilson_interval(red["fails"], red["shots"])
    return {
        "shots": red["shots"],
        "fails": red["fails"],
        "logical_rate": red["fails"] / red["shots"] if red["shots"] else 0.0,
        "logical_ci95": [lo, hi],
        "deep_shots": red["deep_shots"],
        "osd_shots": red["osd_shots"],
        "processes": procs,
        "local": st,
    }
