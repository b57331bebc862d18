"""Bit-packed batched GF(2) Gaussian elimination for OSD post-processing.

The reference's OSD runs data-dependent Gaussian elimination over a dense
BitMatrix (/root/reference/src/decoders/belief_propagation_osd.jl:63-209).
On TPU we re-architect it as fixed-trip-count ``fori_loop`` passes over
rows bit-packed into uint32 words (32 columns per lane word):

  * every row operation (swap / XOR-eliminate) is a masked vectorized
    update over the whole ``[m, W]`` packed matrix;
  * pivot search is a masked argmax (first available row);
  * the reference's early-exit conditions become carried ``active`` flags
    (once false they stay false, reproducing the break);
  * the OSD-w candidate sweep evaluates pivot completions with
    popcount-parity dot products on the packed rows.

All functions here are single-lane and designed for ``jax.vmap`` over a
syndrome batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_bits", "gf2_osd0", "gf2_osdw", "gf2_eliminate", "osdw_sweep"]


def pack_bits(bits):
    """Pack a 0/1 array ``[..., n]`` into uint32 words ``[..., ceil(n/32)]``.

    Bit k of word w holds column ``32*w + k`` (little-endian within words).
    """
    n = bits.shape[-1]
    W = (n + 31) // 32
    pad = W * 32 - n
    b = bits.astype(jnp.uint32)
    if pad:
        b = jnp.pad(b, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = b.reshape(bits.shape[:-1] + (W, 32))
    shifts = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * shifts, axis=-1, dtype=jnp.uint32)


def _col(Hp, j):
    """Extract 0/1 column ``j`` (traced scalar) from packed rows [m, W]."""
    word = jax.lax.dynamic_index_in_dim(Hp, j >> 5, axis=1, keepdims=False)
    return (word >> (j & 31).astype(jnp.uint32)) & jnp.uint32(1)


def _swap_rows(Hp, s, r, k):
    """Swap rows r and k of packed matrix Hp [m, W] and vector s [m]."""
    rows = jnp.arange(Hp.shape[0])
    hr = jnp.take(Hp, r, axis=0)
    hk = jnp.take(Hp, k, axis=0)
    is_r = (rows == r)[:, None]
    is_k = (rows == k)[:, None]
    Hp = jnp.where(is_r, hk[None, :], jnp.where(is_k, hr[None, :], Hp))
    sr = jnp.take(s, r)
    sk = jnp.take(s, k)
    s = jnp.where(rows == r, sk, jnp.where(rows == k, sr, s))
    return Hp, s


def gf2_osd0(Hp, bp_err, resid, n):
    """OSD-0: partial elimination + back-substitution (single lane).

    Faithful to the reference fast path
    (belief_propagation_osd.jl:63-125, Algorithm 2 of Roffe et al.):
    columns are assumed pre-sorted most-reliable-first.

    Args:
      Hp: ``[m, W]`` uint32 packed rows of the reliability-sorted H.
      bp_err: ``[n]`` uint32 0/1 BP hard decisions (sorted order).
      resid: ``[m]`` uint32 0/1 residual syndrome of bp_err
        (syndrome XOR H @ bp_err).
      n: number of columns (static).

    Returns:
      ``[n]`` uint32 0/1 correction in sorted column order; always
      syndrome-consistent when H has full row-relevance for the residual.
    """
    m, W = Hp.shape
    rows = jnp.arange(m)
    skip_all = ~jnp.any(resid != 0)

    def body(j, st):
        Hp, s, r, piv, active = st
        remaining = jnp.any((s != 0) & (rows >= r))
        active = active & (r < m) & remaining
        col = _col(Hp, j)
        avail = (col == 1) & (rows >= r)
        do = active & jnp.any(avail)
        # fold bp_err[j] into the residual using the *current* (partially
        # eliminated, pre-swap) column — reference order, osd fast path
        bpj = jnp.take(bp_err, j) == 1
        s = jnp.where(do & bpj, s ^ col, s)
        k = jnp.argmax(avail)
        Hp2, s2 = _swap_rows(Hp, s, r, k)
        col2 = _col(Hp2, j)
        elim = (col2 == 1) & (rows > r)
        pivrow = jnp.take(Hp2, r, axis=0)
        pivs = jnp.take(s2, r)
        Hp2 = jnp.where(elim[:, None], Hp2 ^ pivrow[None, :], Hp2)
        s2 = jnp.where(elim, s2 ^ pivs, s2)
        Hp = jnp.where(do, Hp2, Hp)
        s = jnp.where(do, s2, s)
        piv = jnp.where(do, piv.at[r].set(j), piv)
        r = r + do.astype(r.dtype)
        return Hp, s, r, piv, active

    piv0 = jnp.full((m,), n, jnp.int32)  # n == out-of-range sentinel
    Hp, s, r, piv, _ = jax.lax.fori_loop(
        0, n, body, (Hp, resid.astype(jnp.uint32), jnp.int32(0), piv0, jnp.bool_(True))
    )

    # back-substitution over pivots in reverse order
    def bs_body(idx, st):
        corr, s = st
        rr = r - 1 - idx
        valid = rr >= 0
        rr_c = jnp.maximum(rr, 0)
        c = jnp.take(piv, rr_c)
        colc = _col(Hp, c)
        val = jnp.take(s, rr_c)
        corr = jnp.where(valid, corr.at[c].set(val), corr)
        fold = valid & (val == 1)
        s = jnp.where(fold & (rows < rr_c), s ^ colc, s)
        return corr, s

    corr, _ = jax.lax.fori_loop(0, m, bs_body, (bp_err.astype(jnp.uint32), s))
    return jnp.where(skip_all, bp_err.astype(jnp.uint32), corr)


def gf2_osdw(Hp, bp_err, syndrome, osd_order, n):
    """OSD-w: Gauss–Jordan RREF + 2^w candidate sweep (single lane).

    Behaviorally faithful to belief_propagation_osd.jl:127-209 (full
    elimination with syndrome co-transform, then exhaustive assignment of
    the first ``osd_order`` most-reliable non-pivot columns, keeping the
    minimum-Hamming-weight completion), but re-architected for the TPU:

      * single-pass Gauss–Jordan with a *used-row mask* instead of row
        swaps — pivot columns (and therefore the solution, which depends
        only on them) are identical to the reference's swap-based
        forward-elimination + backward-diagonalization, while saving the
        whole m-trip diagonalization loop and two masked passes per trip;
      * the packed matrix lives transposed ``[W, m]`` so the large row
        axis m occupies the TPU lane dimension (full 128-lane VPU use;
        the natural ``[m, W]`` layout keeps only 32 of 128 lanes busy);
      * the column loop is a ``while_loop`` that exits as soon as the
        rank is exhausted (all m pivots found) rather than always running
        n trips.

    Args:
      Hp: ``[m, W]`` uint32 packed rows (reliability-sorted columns).
      bp_err: ``[n]`` uint32 0/1 BP hard decisions (sorted order).
      syndrome: ``[m]`` uint32 0/1.
      osd_order: static sweep order w (2^w candidates).
      n: static column count.
    """
    Ht, s, pivcol, r = gf2_eliminate(Hp.T, syndrome.astype(jnp.uint32), n)
    return osdw_sweep(Ht, s, pivcol, r, bp_err, osd_order, n)


def gf2_eliminate(Ht, s, n):
    """Gauss–Jordan RREF of packed columns (single lane, XLA path).

    Args:
      Ht: ``[W, m]`` uint32 — transposed packed rows (row axis in TPU
        lanes; word w of row i at ``Ht[w, i]`` holds columns 32w..32w+31).
      s: ``[m]`` uint32 0/1 syndrome, co-transformed in place.
      n: static column count.

    Returns ``(Ht, s, pivcol [m] int32, r)`` where ``pivcol[i]`` is row
    i's pivot column (sentinel ``n`` = row unused) and ``r`` is the rank.
    """
    W, m = Ht.shape
    rows = jnp.arange(m)

    def cond(st):
        _, _, _, r, j = st
        return (j < n) & (r < m)

    def body(st):
        Ht, s, pivcol, r, j = st
        word = jax.lax.dynamic_index_in_dim(Ht, j >> 5, axis=0, keepdims=False)
        col = (word >> (j & 31).astype(jnp.uint32)) & jnp.uint32(1)  # [m]
        unused = pivcol == n
        avail = (col == 1) & unused
        found = jnp.any(avail)
        k = jnp.argmax(avail)
        is_k = rows == k
        # pivot row k's packed words, extracted as a masked lane-reduction
        # (gather-free: plays well inside fused loop bodies)
        pivrow = jnp.sum(jnp.where(is_k[None, :], Ht, jnp.uint32(0)), axis=1)  # [W]
        pivs = jnp.sum(jnp.where(is_k, s, jnp.uint32(0)))
        elim = (col == 1) & ~is_k & found
        Ht = jnp.where(elim[None, :], Ht ^ pivrow[:, None], Ht)
        s = jnp.where(elim, s ^ pivs, s)
        pivcol = jnp.where(found & is_k, j, pivcol)
        return Ht, s, pivcol, r + found.astype(r.dtype), j + 1

    pivcol0 = jnp.full((m,), n, jnp.int32)  # n == 'row unused' sentinel
    Ht, s, pivcol, r, _ = jax.lax.while_loop(
        cond, body, (Ht, s, pivcol0, jnp.int32(0), jnp.int32(0))
    )
    return Ht, s, pivcol, r


def osdw_sweep(Ht, s, pivcol, r, bp_err, osd_order, n):
    """2^w most-reliable-column sweep over an RREF system (single lane)."""
    # most-reliable (non-pivot) columns, ascending index; the reference
    # clamps osd_order to n - rank — we mask invalid trial bits instead,
    # which yields the same minimum over a sweep with duplicates
    is_piv = jnp.zeros((n,), bool).at[pivcol].set(True, mode="drop")
    mr_order = jnp.argsort(is_piv, stable=True)
    mr_cols = mr_order[:osd_order] if osd_order > 0 else mr_order[:0]
    n_mr = n - r
    mr_mask = pack_bits(~is_piv)

    def completion(err):
        """Fill pivot columns from the transformed syndrome + MR parity."""
        err_mr = pack_bits(err) & mr_mask
        parity = (
            jnp.sum(jax.lax.population_count(Ht & err_mr[:, None]), axis=0)
            & jnp.uint32(1)
        ).astype(jnp.uint32)
        vals = s ^ parity  # [m], indexed by row
        return err.at[pivcol].set(vals, mode="drop")

    def cand(x, st):
        best_err, min_w, err = st
        for b in range(osd_order):
            bit = ((x >> b) & 1).astype(jnp.uint32)
            use = (x != 0) & (b < n_mr)
            err = jnp.where(use, err.at[mr_cols[b]].set(bit), err)
        err = completion(err)
        w = jnp.sum(err)
        better = w < min_w
        best_err = jnp.where(better, err, best_err)
        min_w = jnp.where(better, w, min_w)
        return best_err, min_w, err

    err0 = bp_err.astype(jnp.uint32)
    best0 = err0
    best_err, _, _ = jax.lax.fori_loop(
        0, 2**osd_order, cand, (best0, jnp.uint32(n + 1), err0)
    )
    return best_err
