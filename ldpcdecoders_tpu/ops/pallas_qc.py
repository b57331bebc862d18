"""Fully VMEM-resident group-circulant LDPC min-sum decode kernel (Pallas TPU).

The general edge-list decoders (models/minsum.py) are HBM-bandwidth bound:
every iteration's cross-layout gathers round-trip the ``[B, E]`` message
arrays through HBM, and Mosaic has no arbitrary-gather primitive, so the
whole decode cannot be fused into one kernel (measured + documented in
ops/pallas_minsum.py and docs/ROADMAP.md).

Group-structured codes remove that blocker.  With messages laid out
``[base_edge, batch_tile, Z]`` where the lane axis flattens a finite
abelian group ``Z_l x Z_m`` (``Z = l*m``), the check<->variable
permutation of every monomial block ``x^a y^b`` is *static*:

  * the ``x^a`` part is a global cyclic shift by ``a*m`` lanes
    (``pltpu.roll``), because ``((u+a)%l)*m + v == (w + a*m) mod Z``;
  * the ``y^b`` part is a blockwise shift, expressible as a select
    between two global rolls (offset ``b`` vs ``b - m``) keyed on the
    static mask ``v < m - b`` of each lane's minor coordinate.

Plain quasi-cyclic codes (codes/qc.py) are the ``m == 1`` special case
(one roll, no select); bivariate bicycle quantum codes (codes/bicycle.py)
use the full 2-D form for each stabilizer block.  The kernel keeps all
messages in VMEM across every BP iteration; HBM sees only the syndrome
read and the final error/LLR write.  Edge terms are baked in at trace
time, so the per-edge loop is fully unrolled with static shifts.

Semantics match models/minsum.py's normalized/offset min-sum (two-min
exclusive reduction, per-lane early freeze of the err/LLR outputs,
while-loop early exit when every lane in the batch tile has converged).
Caveat vs the lifted-graph XLA oracle: the two-min exclusive reduction
is order-independent, but the variable update's float *summation order*
follows base-term order rather than ascending lifted check index, so
for multi-term blocks outputs can differ from the oracle in the last
ulp (single-term-per-block 1-D codes match bitwise; tests pin both).

Orientation convention (see codes/qc.py): lifted check ``i*Z + w`` with
``(u, v) = divmod(w, m)`` connects to lifted variable
``j*Z + sigma(w)`` where ``sigma(w) = ((u+a)%l)*m + (v+b)%m``.  A
var-oriented ``[_, Z]`` vector maps to check orientation by gathering at
``sigma`` (roll/select above) and back with the inverse shift
``((l-a)%l, (m-b)%m)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_qc_minsum_pallas_fn",
    "make_group_qc_minsum_pallas_fn",
    "qc_term_adjacency",
    "qc_vmem_estimate",
    "VMEM_BUDGET",
]

#: measured compile boundary on v5e (see make_group_qc_minsum_pallas_fn)
VMEM_BUDGET = 14 * 2**20


def qc_vmem_estimate(Eb: int, mb: int, nb: int, Z: int, batch_tile: int,
                     itemsize: int, layered: bool,
                     prior_input: bool = False) -> int:
    """Approximate VMEM footprint (bytes) of the fused kernel: message
    scratch + double-buffered in/out blocks."""
    scratch = (Eb + (nb if layered else Eb)) * batch_tile * Z * itemsize
    io = 2 * (nb * 4 + nb * 4 + mb * 4) * batch_tile * Z  # err+llr+syn
    if prior_input:
        io += 2 * nb * 4 * batch_tile * Z  # per-bit channel LLR input
    return scratch + io


def qc_term_adjacency(terms, mb: int, nb: int):
    """Static per-block-row / per-block-column edge lists.

    ``terms`` is an iterable of ``(i, j, a, b)``; returns
    ``(edges, row_edges, col_edges)`` where ``edges`` is the sorted term
    list (block-row-major, ascending block column then shift — the same
    deterministic order codes/qc.py::qc_group_lift_edges emits) and
    ``row_edges[i]`` / ``col_edges[j]`` hold indices into it.
    """
    edges = sorted((int(i), int(j), int(a), int(b)) for i, j, a, b in terms)
    if len(set(edges)) != len(edges):
        raise ValueError("duplicate edge terms (cancel over GF(2))")
    row_edges = [[] for _ in range(mb)]
    col_edges = [[] for _ in range(nb)]
    for e, (i, j, _, _) in enumerate(edges):
        row_edges[i].append(e)
        col_edges[j].append(e)
    for i, r in enumerate(row_edges):
        if not r:
            raise ValueError(f"base row {i} has no edges")
    for j, c in enumerate(col_edges):
        if not c:
            raise ValueError(f"base column {j} has no edges")
    return edges, row_edges, col_edges


def make_group_qc_minsum_pallas_fn(
    terms,
    mb: int,
    nb: int,
    group: tuple[int, int],
    L0: float,
    max_iters: int,
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    batch_tile: int = 32,
    schedule: str = "flooding",
    algorithm: str = "minsum",
    dtype=jnp.float32,
    interpret: bool = False,
    prior_input: bool = False,
):
    """Build ``syndromes [B, mb*Z] -> (err i8, converged bool, iters i32, llrs f32)``.

    With ``prior_input=True`` the returned function takes a second
    argument — per-bit channel LLRs ``[B, nb*Z]`` float32 (per-lane) —
    instead of baking the scalar ``L0``: erased/punctured bits get
    LLR 0, rate-matched or per-shot soft priors ride along per lane,
    and one compiled kernel serves every noise point of a sweep.  Costs
    one extra double-buffered VMEM input block per batch tile.

    ``algorithm='minsum'`` (default) is the normalized/offset min-sum
    check rule; ``'sumproduct'`` is exact LLR-domain belief propagation
    — ``mu = (-1)^s * 2 atanh(prod tanh(nu/2))`` with the reference's
    stability clamps (ops/clamps.py), algebraically the same algorithm
    as the flagship probability-ratio decoder (models/bp.py: the ratio
    delta (p0-p1)/(p0+p1) IS tanh(LLR/2)).  Exclusive products run as
    unrolled prefix/suffix passes; atanh is evaluated as
    ``0.5 log((1+x)/(1-x))``.  alpha/beta only apply to min-sum.

    ``dtype`` selects the in-kernel message *storage* precision: float32
    (default) or bfloat16 (half the VMEM — double the code size that
    fits per batch tile).  Arithmetic always runs in f32: Mosaic's
    dynamic_rotate is 32-bit-only and bf16 comparisons trip its i1
    relayout bug, so narrow values upcast on read and downcast on
    write; min-sum is magnitude-comparison based, so the rounding costs
    essentially no accuracy.  The LLR output is always float32.

    ``B`` must be a multiple of ``batch_tile`` (callers pad).  ``L0`` is
    the scalar channel LLR (baked into the kernel, like the other Pallas
    paths — no per-call prior overrides).  ``group = (l, m)`` with
    ``Z = l*m``; the fast compiled path wants ``Z`` a multiple of 128
    (full lanes); any ``Z`` works in interpret mode and small ``Z``
    merely pads lanes when compiled.

    ``schedule='flooding'`` updates every message from the previous
    iteration's state.  ``schedule='layered'`` is the serial-C
    block-layered schedule: base rows are processed in order, each
    reading the LLR totals already updated by the rows before it
    (within a row, all reads happen before any update — grouped
    semantics).  For single-term-per-block codes a base row is a
    conflict-free layer (lifted checks of one row touch disjoint
    variables), the classic ~2x-fewer-sweeps schedule; multi-term
    blocks get the same grouped-delta update, still well-defined.
    ``max_iters`` counts full sweeps.
    """
    gl, gm = (int(x) for x in group)
    if gl < 1 or gm < 1:
        raise ValueError(f"group sizes must be >= 1, got {group}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r} (want 'flooding' or 'layered')")
    if algorithm not in ("minsum", "sumproduct"):
        raise ValueError(
            f"unknown algorithm {algorithm!r} (want 'minsum' or 'sumproduct')"
        )
    Z = gl * gm
    edges, row_edges, col_edges = qc_term_adjacency(terms, mb, nb)
    Eb = len(edges)
    L0 = float(L0)
    alpha = float(alpha)
    beta = float(beta)
    BT = int(batch_tile)
    sumprod = algorithm == "sumproduct"
    layered = schedule == "layered"
    f32 = jnp.dtype(dtype)
    if f32 not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"dtype must be float32 or bfloat16, got {dtype}")

    # everything must fit in VMEM (~16 MiB/core on v5e) at once: message
    # scratch + (double-buffered) in/out blocks.  Measured boundary: a
    # (6,3)-regular nb=24 code compiles at Z=384 f32 BT=32 (~10.6 MiB by
    # this estimate) and fails at Z=768 (~21 MiB), so refuse past ~14 MiB
    # with actionable guidance instead of an opaque remote-compile error.
    est = qc_vmem_estimate(Eb, mb, nb, Z, BT, f32.itemsize, layered,
                           prior_input=prior_input)
    if est > VMEM_BUDGET and not interpret:
        raise ValueError(
            f"estimated VMEM footprint {est / 2**20:.1f} MiB exceeds the ~14 MiB "
            f"budget (Eb={Eb}, nb={nb}, Z={Z}, batch_tile={BT}, {f32.name}): "
            "reduce batch_tile, use dtype=jnp.bfloat16, or fall back to "
            "backend='xla' (HBM-resident) for codes this large"
        )

    def kernel(syn_ref, *refs):
        if prior_input:
            p_ref, err_ref, llr_ref, conv_ref, iters_ref, s1_ref, s2_ref = refs

            def p32(j):
                return p_ref[j]  # [BT, Z] float32 per-bit channel LLR
        else:
            err_ref, llr_ref, conv_ref, iters_ref, s1_ref, s2_ref = refs
            _const_p32 = jnp.full((BT, Z), L0, jnp.float32)

            def p32(j):
                return _const_p32
        # scratch aliases: flooding carries per-edge nu and mu; layered
        # carries per-edge mu plus per-block-column LLR totals
        if layered:
            mu_ref, tot_ref = s1_ref, s2_ref
        else:
            nu_ref, mu_ref = s1_ref, s2_ref

        # lane minor coordinate v (for the blockwise y-shift select);
        # built once, reused by every masked shift
        vmask_cache: dict[int, jax.Array] = {}

        def vmask(b):
            if b not in vmask_cache:
                lane_v = jax.lax.broadcasted_iota(jnp.int32, (BT, Z), 1) % gm
                vmask_cache[b] = lane_v < (gm - b)
            return vmask_cache[b]

        def apply_shift(x, a, b):
            """out[w] = x[sigma_{(a,b)}(w)] — gather at the monomial shift.

            Float inputs come back as float32: Mosaic's tpu.dynamic_rotate
            only supports 32-bit element types, and bf16 comparisons hit
            the i1 relayout compiler bug, so bf16 here is a *storage*
            precision — values upcast (losslessly) on read and arithmetic
            runs in f32; callers downcast when writing back to refs.
            """
            if x.dtype.itemsize < 4:
                x = x.astype(jnp.float32)
            c1 = (a * gm + b) % Z
            if b == 0:
                return pltpu.roll(x, (-c1) % Z, 1) if c1 else x
            c2 = (a * gm + b - gm) % Z
            return jnp.where(
                vmask(b),
                pltpu.roll(x, (-c1) % Z, 1),
                pltpu.roll(x, (-c2) % Z, 1),
            )

        def inv(a, b):
            return (gl - a) % gl, (gm - b) % gm

        def sumproduct_mu(ncs, syn_i):
            """Exact tanh-rule check update: exclusive products of
            tanh(nu/2) via unrolled prefix/suffix passes, then
            2 atanh = log((1+x)/(1-x)), with the reference clamps."""
            from ..ops.clamps import MSG_CLAMP, TANH_CLAMP

            k = len(ncs)
            ts = [
                jnp.clip(jnp.tanh(nc * 0.5), -TANH_CLAMP, TANH_CLAMP)
                for nc in ncs
            ]
            one = jnp.ones((BT, Z), jnp.float32)
            fwd = [one]
            for i in range(k - 1):
                fwd.append(fwd[-1] * ts[i])
            bwd = [one]
            for i in range(k - 1, 0, -1):
                bwd.append(bwd[-1] * ts[i])
            bwd.reverse()
            outs = []
            for i in range(k):
                excl = jnp.clip(fwd[i] * bwd[i], -TANH_CLAMP, TANH_CLAMP)
                mu = jnp.log1p(excl) - jnp.log1p(-excl)  # = 2 atanh(excl)
                mu = jnp.clip(mu, -MSG_CLAMP, MSG_CLAMP)
                outs.append(jnp.where(syn_i, -mu, mu))
            return outs

        def two_min_mu(ncs, syn_i):
            """Two-min exclusive reduction over a base row's check-oriented
            inputs; returns the per-edge check-oriented output messages."""
            mags = [jnp.abs(nc) for nc in ncs]
            negs = [nc < 0.0 for nc in ncs]
            min1 = mags[0]
            idx1 = jnp.zeros((BT, Z), jnp.int32)
            # finite sentinel (not inf): a weight-1 base row's exclusive
            # min is this value, and inf would propagate NaN through the
            # variable totals; 1e30 matches the XLA path's `big`
            min2 = jnp.full((BT, Z), 1e30, jnp.float32)
            parity = negs[0]
            for k in range(1, len(ncs)):
                v = mags[k]
                smaller = v < min1
                min2 = jnp.where(smaller, min1, jnp.minimum(min2, v))
                idx1 = jnp.where(smaller, k, idx1)
                min1 = jnp.where(smaller, v, min1)
                parity = jnp.logical_xor(parity, negs[k])
            outs = []
            for k in range(len(ncs)):
                excl = jnp.where(idx1 == k, min2, min1)
                flip = jnp.logical_xor(jnp.logical_xor(parity, negs[k]), syn_i)
                mag_out = jnp.maximum(alpha * excl - beta, 0.0)
                outs.append(jnp.where(flip, -mag_out, mag_out))
            return outs

        check_mu = sumproduct_mu if sumprod else two_min_mu

        # init: outputs = iteration-0 state; flooding seeds nu with the
        # channel prior (var-oriented: a lane's prior needs no shift —
        # every check-side read applies the edge shift itself), layered
        # seeds zero messages and prior totals
        if layered:
            for e in range(Eb):
                mu_ref[e] = jnp.zeros((BT, Z), f32)
            for j in range(nb):
                tot_ref[j] = p32(j).astype(f32)
        else:
            for e in range(Eb):
                nu_ref[e] = p32(edges[e][1]).astype(f32)
        for j in range(nb):
            err_ref[j] = jnp.zeros((BT, Z), jnp.int32)
            llr_ref[j] = p32(j)

        syn_b = [syn_ref[i] != 0 for i in range(mb)]

        # NOTE: `done` is carried as int32 (1 = converged), not bool —
        # Mosaic cannot legalize i1 vectors in while-loop carries
        # (scf.yield relayout failure, observed on v5e / jax 0.9)
        def cond(carry):
            it, done, _ = carry
            return (it < max_iters) & (jnp.min(done) < 1)

        def flooding_sweep(active):
            # -- check update: two-min + sign parity per base row ---------
            for i in range(mb):
                row = row_edges[i]
                ncs = []
                for e in row:
                    _, _, a, b = edges[e]
                    ncs.append(apply_shift(nu_ref[e], a, b))  # check orientation
                outs = check_mu(ncs, syn_b[i])
                for k, e in enumerate(row):
                    _, _, a, b = edges[e]
                    mu_ref[e] = apply_shift(outs[k], *inv(a, b)).astype(f32)
            # -- variable update + frozen outputs --------------------------
            for j in range(nb):
                col = col_edges[j]
                total = p32(j)
                mus = [mu_ref[e].astype(jnp.float32) for e in col]
                for mu in mus:
                    total = total + mu
                for e, mu in zip(col, mus):
                    nu_ref[e] = (total - mu).astype(f32)
                errn = (total < 0.0).astype(jnp.int32)
                err_ref[j] = jnp.where(active, errn, err_ref[j])
                llr_ref[j] = jnp.where(active, total, llr_ref[j])

        def layered_sweep(active):
            # serial-C: each base row reads totals already updated by the
            # rows before it; within a row all reads precede all updates
            for i in range(mb):
                row = row_edges[i]
                ncs, olds = [], []
                for e in row:
                    _, j, a, b = edges[e]
                    old = mu_ref[e].astype(jnp.float32)
                    nu_vo = tot_ref[j].astype(jnp.float32) - old
                    olds.append(old)
                    ncs.append(apply_shift(nu_vo, a, b))
                outs = check_mu(ncs, syn_b[i])
                for k, e in enumerate(row):
                    _, j, a, b = edges[e]
                    mu_new = apply_shift(outs[k], *inv(a, b))
                    tot_ref[j] = (
                        tot_ref[j].astype(jnp.float32) + (mu_new - olds[k])
                    ).astype(f32)
                    mu_ref[e] = mu_new.astype(f32)
            for j in range(nb):
                total = tot_ref[j].astype(jnp.float32)
                errn = (total < 0.0).astype(jnp.int32)
                err_ref[j] = jnp.where(active, errn, err_ref[j])
                llr_ref[j] = jnp.where(active, total, llr_ref[j])

        def body(carry):
            it, done, iters = carry
            active = done < 1  # [BT, 1] bool (intermediate only)
            if layered:
                layered_sweep(active)
            else:
                flooding_sweep(active)

            # -- syndrome check (check-oriented XOR of decisions) ----------
            ok = jnp.ones((BT, 1), jnp.int32)
            for i in range(mb):
                par = jnp.zeros((BT, Z), jnp.int32)
                for e in row_edges[i]:
                    _, j, a, b = edges[e]
                    par = jnp.bitwise_xor(par, apply_shift(err_ref[j], a, b))
                ok = ok & jnp.all((par != 0) == syn_b[i], axis=1, keepdims=True).astype(
                    jnp.int32
                )
            iters = jnp.where((ok > 0) & active, it + 1, iters)
            return it + 1, done | ok, iters

        it0 = jnp.int32(0)
        done0 = jnp.zeros((BT, 1), jnp.int32)
        iters0 = jnp.zeros((BT, 1), jnp.int32)
        it, done, iters = jax.lax.while_loop(cond, body, (it0, done0, iters0))
        conv_ref[:] = done
        iters_ref[:] = jnp.where(done > 0, iters, it)

    grid = lambda B: (B // BT,)  # noqa: E731

    @functools.partial(jax.jit, static_argnames=())
    def decode(syndromes, priors=None):
        syndromes = jnp.asarray(syndromes)
        B = syndromes.shape[0]
        if B % BT:
            raise ValueError(f"batch ({B}) must be a multiple of batch_tile ({BT})")
        # [B, mb*Z] -> [mb, B, Z]: block index outermost so each kernel
        # slice syn_ref[i] is one contiguous [BT, Z] tile
        syn = syndromes.reshape(B, mb, Z).transpose(1, 0, 2).astype(jnp.int32)
        in_specs = [
            pl.BlockSpec((mb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        ]
        inputs = [syn]
        if prior_input:
            if priors is None:
                raise ValueError("prior_input kernel needs per-bit LLRs")
            priors = jnp.broadcast_to(
                jnp.asarray(priors, jnp.float32), (B, nb * Z)
            )
            inputs.append(priors.reshape(B, nb, Z).transpose(1, 0, 2))
            in_specs.append(
                pl.BlockSpec((nb, BT, Z), lambda b: (0, b, 0),
                             memory_space=pltpu.VMEM)
            )
        elif priors is not None:
            raise ValueError("this kernel bakes the scalar prior; rebuild "
                             "with prior_input=True for per-bit LLRs")
        err_t, llr_t, conv, iters = pl.pallas_call(
            kernel,
            grid=grid(B),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((nb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, BT, Z), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, B, Z), jnp.int32),
                jax.ShapeDtypeStruct((nb, B, Z), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((Eb, BT, Z), f32),
                pltpu.VMEM((nb if layered else Eb, BT, Z), f32),
            ],
            interpret=interpret,
        )(*inputs)
        err = err_t.transpose(1, 0, 2).reshape(B, nb * Z).astype(jnp.int8)
        llrs = llr_t.transpose(1, 0, 2).reshape(B, nb * Z)
        return err, conv[:, 0].astype(bool), iters[:, 0], llrs

    return decode


def make_qc_minsum_pallas_fn(
    base,
    Z: int,
    L0: float,
    max_iters: int,
    *,
    alpha: float = 1.0,
    beta: float = 0.0,
    batch_tile: int = 32,
    interpret: bool = False,
):
    """1-D quasi-cyclic wrapper: base-matrix shifts over the cyclic group
    ``Z_Z`` (group ``(Z, 1)`` — every shift is a single global roll)."""
    base = np.asarray(base, dtype=np.int64)
    mb, nb = base.shape
    bi, bj = np.nonzero(base >= 0)
    terms = [(int(i), int(j), int(base[i, j]), 0) for i, j in zip(bi, bj)]
    return make_group_qc_minsum_pallas_fn(
        terms, mb, nb, (int(Z), 1), L0, max_iters,
        alpha=alpha, beta=beta, batch_tile=batch_tile, interpret=interpret,
    )
