"""Pallas TPU kernel: batched GF(2) Gauss–Jordan elimination for OSD.

This is the elimination stage of OSD-w (ops/gf2.py::gf2_eliminate) moved
into a single VMEM-resident kernel.  The XLA ``while_loop`` form re-reads
the whole ``[B, W, m]`` packed state from HBM on every one of the ~n
serial column trips (~n * 4*W*m bytes per lane — hundreds of GB for the
reference benchmark batch), which makes the elimination bandwidth-bound.
Here each grid program keeps its batch tile's packed matrix in VMEM for
the *entire* n-trip loop: HBM traffic drops to one read + one write of
the state, and the trips run at VMEM bandwidth.

Semantics are identical to ``gf2_eliminate`` (same pivot columns, same
co-transformed syndrome, same row->pivot-column map with sentinel n);
the OSD-w candidate sweep stays in XLA (ops/gf2.py::osdw_sweep).

Mosaic constraints honored (probed on this toolchain, see
ops/pallas_minsum.py): no materialized i1 tensors — boolean state is
carried as uint32 0/1 with comparisons only ever feeding selects — and
no arbitrary gathers — the pivot row is extracted with a masked
lane-reduction, the current column with a dynamic sublane slice.

Reference behavior being re-architected: the swap-based elimination of
/root/reference/src/decoders/belief_propagation_osd.jl:127-172.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gf2_eliminate_pallas", "gf2_osd0_pallas"]


def _elim_kernel(ht_in, s_in, ht_out, s_out, piv_out, *, n, m_pad):
    u1 = jnp.uint32(1)
    u0 = jnp.uint32(0)
    bt = ht_in.shape[0]
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (bt, m_pad), 1)

    ht_out[:] = ht_in[:]
    s_out[:] = s_in[:]
    piv_out[:] = jnp.full((bt, m_pad), n, jnp.int32)

    def trip(j, _):
        w = j >> 5
        bit = (j & 31).astype(jnp.uint32)
        word = ht_out[:, pl.ds(w, 1), :][:, 0, :]  # [bt, m]
        col = (word >> bit) & u1
        pivcol = piv_out[:]
        unused = jnp.where(pivcol == n, u1, u0)
        avail = col * unused  # uint32 0/1
        # first available row: min row index among avail (lane reduction)
        k = jnp.min(jnp.where(avail > u0, iota_m, m_pad), axis=1)  # [bt]
        found = jnp.where(k < m_pad, u1, u0)  # [bt]
        is_k = jnp.where(iota_m == k[:, None], u1, u0)  # [bt, m]

        ht = ht_out[:]  # [bt, W, m]
        s = s_out[:]  # [bt, m]
        # pivot row's packed words + syndrome bit via masked lane-reductions
        # (Mosaic has no unsigned reductions: bitcast to i32, reduce — the
        # mask selects exactly one element so the sum is that element —
        # and bitcast back)
        ht_i = jax.lax.bitcast_convert_type(ht, jnp.int32)
        is_k_i = is_k.astype(jnp.int32)
        pivrow = jax.lax.bitcast_convert_type(
            jnp.sum(ht_i * is_k_i[:, None, :], axis=2), jnp.uint32
        )  # [bt, W]
        pivs = jax.lax.bitcast_convert_type(
            jnp.sum(jax.lax.bitcast_convert_type(s, jnp.int32) * is_k_i, axis=1),
            jnp.uint32,
        )  # [bt]
        elim = col * (u1 - is_k) * found[:, None]  # [bt, m] 0/1
        ht_out[:] = jnp.where(elim[:, None, :] > u0, ht ^ pivrow[:, :, None], ht)
        s_out[:] = jnp.where(elim > u0, s ^ pivs[:, None], s)
        piv_out[:] = jnp.where(
            (is_k * found[:, None]) > u0, j, pivcol
        )
        return 0

    # static fori over all n columns.  A while_loop with early exit at
    # rank exhaustion was measured SLOWER on v5e (osd2 4,202 vs 4,206/s —
    # a wash; osd0 2,467 vs 3,304/s — a clear loss): Mosaic pipelines a
    # static trip count far better than a data-dependent loop, and the
    # per-trip cond reduction costs more than the ~9% of trips it skips.
    jax.lax.fori_loop(0, n, trip, 0)


def _osd0_kernel(ht_in, s_in, bp_ref, ht_out, s_out, piv_out, *, n, m_pad, n_pad):
    """OSD-0 partial elimination (ops/gf2.py::gf2_osd0 semantics).

    Differences from the reference-shaped XLA form: used-row mask instead
    of row swaps and eager above-row elimination instead of lazy
    back-substitution — the pivot columns, stopping point, and final
    pivot assignments (``corr[pivcol[k]] = s[k]``) are identical, so the
    output correction matches bit-for-bit (tested).  The early-stop
    ('residual exhausted below the pivot space') carries per-lane
    ``active`` flags through the column loop.
    """
    u1 = jnp.uint32(1)
    u0 = jnp.uint32(0)
    bt = ht_in.shape[0]
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (bt, m_pad), 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad), 1)

    ht_out[:] = ht_in[:]
    s_out[:] = s_in[:]
    piv_out[:] = jnp.full((bt, m_pad), n, jnp.int32)

    def trip(j, active):  # active [bt] u32
        s = s_out[:]
        pivcol = piv_out[:]
        unused = jnp.where(pivcol == n, u1, u0)
        # residual remaining outside the pivot space? (pre-fold, as in
        # the reference's trip-entry check)
        s_bit = jnp.where(s > u0, u1, u0)
        rem_i = jnp.sum((s_bit * unused).astype(jnp.int32), axis=1)  # [bt]
        active = active * jnp.where(rem_i > 0, u1, u0)

        w = j >> 5
        bit = (j & 31).astype(jnp.uint32)
        word = ht_out[:, pl.ds(w, 1), :][:, 0, :]
        col = (word >> bit) & u1
        avail = col * unused
        k = jnp.min(jnp.where(avail > u0, iota_m, m_pad), axis=1)
        found = jnp.where(k < m_pad, u1, u0)
        do = active * found  # [bt]
        is_k = jnp.where(iota_m == k[:, None], u1, u0)

        # fold bp_err[j] into the residual using the current column
        bp = bp_ref[:]
        bpj = jax.lax.bitcast_convert_type(
            jnp.sum(
                jax.lax.bitcast_convert_type(bp, jnp.int32)
                * jnp.where(iota_n == j, 1, 0),
                axis=1,
            ),
            jnp.uint32,
        )  # [bt]
        s = s ^ (col * (do * bpj)[:, None])

        ht = ht_out[:]
        ht_i = jax.lax.bitcast_convert_type(ht, jnp.int32)
        is_k_i = is_k.astype(jnp.int32)
        pivrow = jax.lax.bitcast_convert_type(
            jnp.sum(ht_i * is_k_i[:, None, :], axis=2), jnp.uint32
        )
        pivs = jax.lax.bitcast_convert_type(
            jnp.sum(jax.lax.bitcast_convert_type(s, jnp.int32) * is_k_i, axis=1),
            jnp.uint32,
        )
        elim = col * (u1 - is_k) * do[:, None]
        ht_out[:] = jnp.where(elim[:, None, :] > u0, ht ^ pivrow[:, :, None], ht)
        s_out[:] = jnp.where(elim > u0, s ^ pivs[:, None], s)
        piv_out[:] = jnp.where((is_k * do[:, None]) > u0, j, pivcol)
        return active

    # static fori: the per-lane `active` flags make exhausted lanes
    # no-ops, and a tile-level while_loop early exit measured 25% SLOWER
    # (2,467 vs 3,304 syndromes/s at per=0.2) — see _elim_kernel's note.
    jax.lax.fori_loop(0, n, trip, jnp.full((bt,), 1, jnp.uint32))


def gf2_osd0_pallas(Ht, resid, bp_err, n, *, batch_tile=8, interpret=False):
    """Batched OSD-0 elimination; returns the ``[B, n]`` correction.

    Args:
      Ht: ``[B, W, m]`` uint32 transposed packed rows (sorted columns).
      resid: ``[B, m]`` uint32 0/1 residual syndrome of ``bp_err``.
      bp_err: ``[B, n]`` uint32 0/1 BP hard decisions (sorted order).
      n: static column count.
    """
    B, W, m = Ht.shape
    m_pad = ((m + 127) // 128) * 128
    n_pad = ((n + 127) // 128) * 128
    if m_pad != m:
        Ht = jnp.pad(Ht, ((0, 0), (0, 0), (0, m_pad - m)))
        resid = jnp.pad(resid, ((0, 0), (0, m_pad - m)))
    bp_pad = bp_err.astype(jnp.uint32)
    if n_pad != n:
        bp_pad = jnp.pad(bp_pad, ((0, 0), (0, n_pad - n)))
    bt = min(batch_tile, B)
    while B % bt:
        bt //= 2

    kern = functools.partial(
        _osd0_kernel, n=int(n), m_pad=int(m_pad), n_pad=int(n_pad)
    )
    _, s_fin, piv = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, m_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.int32),
        ),
        interpret=interpret,
    )(Ht.astype(jnp.uint32), resid.astype(jnp.uint32), bp_pad)
    # corr = bp_err with pivot columns reassigned from the residual
    # (sentinel n indices are dropped by the scatter mode)
    corr = bp_err.astype(jnp.uint32)
    return jax.vmap(lambda c, p, sv: c.at[p].set(sv, mode="drop"))(
        corr, piv[:, :m], s_fin[:, :m]
    )


def gf2_eliminate_pallas(Ht, s, n, *, batch_tile=8, interpret=False):
    """Batched Gauss–Jordan RREF of packed columns.

    Args:
      Ht: ``[B, W, m]`` uint32 — per-lane transposed packed rows (word w
        of row i at ``[b, w, i]``; see ops/gf2.py::gf2_eliminate).
      s: ``[B, m]`` uint32 0/1 syndromes, co-transformed.
      n: static column count.
      batch_tile: lanes per grid program (their n-trip loops share one
        instruction stream, amortizing loop overhead).

    Returns ``(Ht' [B, W, m], s' [B, m], pivcol [B, m] int32)`` with
    ``pivcol[b, i]`` = row i's pivot column or the sentinel ``n``.
    """
    B, W, m = Ht.shape
    m_pad = ((m + 127) // 128) * 128
    if m_pad != m:
        # zero rows can never be chosen as pivots (their column bit is 0)
        Ht = jnp.pad(Ht, ((0, 0), (0, 0), (0, m_pad - m)))
        s = jnp.pad(s, ((0, 0), (0, m_pad - m)))
    bt = min(batch_tile, B)
    while B % bt:
        bt //= 2

    kern = functools.partial(_elim_kernel, n=int(n), m_pad=int(m_pad))
    ht2, s2, piv = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, W, m_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.int32),
        ),
        interpret=interpret,
    )(Ht.astype(jnp.uint32), s.astype(jnp.uint32))
    return ht2[:, :, :m], s2[:, :m], piv[:, :m]
