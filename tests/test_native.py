"""Native (C++) graph-compiler tier tests: build, exact parity with the
pure-Python compiler, and scale."""

import time

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.graph import TannerGraph
from ldpcdecoders_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def _graphs_equal(a: TannerGraph, b: TannerGraph) -> bool:
    return all(
        np.array_equal(getattr(a, f), getattr(b, f))
        for f in (
            "chk_vars",
            "chk_mask",
            "var_chks",
            "var_mask",
            "c2v_gather",
            "v2c_gather",
        )
    )


def test_native_matches_python_regular():
    H = lt.parity_check_matrix(240, 8, 4, rng=41)
    py = TannerGraph.from_pcm(H, use_native=False)
    nat = TannerGraph.from_pcm(H, use_native=True)
    assert _graphs_equal(py, nat)


def test_native_matches_python_irregular():
    H = lt.toric_code_x(4)
    py = TannerGraph.from_pcm(H, use_native=False, degree_multiple=8)
    nat = TannerGraph.from_pcm(H, use_native=True, degree_multiple=8)
    assert _graphs_equal(py, nat)


def test_native_is_fast_at_scale():
    H = lt.parity_check_matrix(20000, 10, 5, rng=43)
    t0 = time.perf_counter()
    g = TannerGraph.from_pcm(H, use_native=True)
    dt = time.perf_counter() - t0
    assert g.n_edges == 100000
    # generous bound: includes the one-time g++ build of the .so when the
    # cache is cold; the compile itself is ~0.15s
    assert dt < 15.0, f"native compile too slow: {dt}s"


def test_auto_dispatch_uses_native_for_large():
    # >100k entries triggers native automatically; results must be identical
    H = lt.parity_check_matrix(1000, 10, 9, rng=42)
    auto = TannerGraph.from_pcm(H)
    py = TannerGraph.from_pcm(H, use_native=False)
    assert _graphs_equal(auto, py)


# -- bit-packed GF(2) host kernels (gf2_host.cpp) -------------------------


def test_gf2_pack_and_syndromes_match_int64():
    from ldpcdecoders_tpu.native import gf2_syndromes_packed, pack_gf2_rows

    rng = np.random.default_rng(7)
    # odd n exercises the partial final word
    for m, n, B in [(90, 130, 33), (900, 1000, 64), (3, 64, 1)]:
        H = (rng.random((m, n)) < 0.05).astype(np.uint8)
        E = (rng.random((B, n)) < 0.1).astype(np.uint8)
        got = gf2_syndromes_packed(pack_gf2_rows(H), pack_gf2_rows(E), m)
        ref = (E.astype(np.int64) @ H.astype(np.int64).T) % 2
        assert (got == ref).all()


def test_gf2_verify_matches_reference_semantics():
    from ldpcdecoders_tpu.utils.noise import syndromes_of, verify_decodes

    rng = np.random.default_rng(8)
    H = lt.parity_check_matrix(200, 10, 5, rng=9)
    B, n = 47, H.shape[1]
    errs = rng.random((B, n)) < 0.05
    guesses = errs.astype(np.int8).copy()
    # corrupt a third of the lanes with single-bit flips, and replace a
    # third with a different error having the SAME syndrome (degenerate:
    # exact=False but smatch=True requires a kernel element; flipping two
    # bits of one check's support is not generally in the kernel, so just
    # verify agreement with the definition)
    for b in range(0, B, 3):
        guesses[b, rng.integers(n)] ^= 1
    syns = syndromes_of(H, errs)
    exact, smatch = verify_decodes(H, errs, guesses, syns)
    assert (exact == (guesses.astype(bool) == errs).all(axis=1)).all()
    assert (smatch == (syndromes_of(H, guesses) == syns).all(axis=1)).all()


def test_syndromes_of_blas_fallback_matches(monkeypatch):
    # force the no-native path: syndromes_of must fall through to BLAS f32
    from ldpcdecoders_tpu.utils import noise

    monkeypatch.setattr(noise, "_packed_of", lambda H: None)
    rng = np.random.default_rng(10)
    H = lt.parity_check_matrix(500, 10, 4, rng=11)
    E = rng.random((29, 500)) < 0.07
    ref = (E.astype(np.int64) @ H.astype(np.int64).T) % 2
    assert (noise.syndromes_of(H, E) == ref).all()
    exact, smatch = noise.verify_decodes(H, E, E.astype(np.int8), ref)
    assert exact.all() and smatch.all()


# ------------------------------------------------------ host OSD-0 (r3)


def test_gf2_osd0_host_golden_vs_device():
    """The threaded C++ column-reduction OSD-0 (native/gf2_osd.cpp) is
    bit-identical to ops/gf2.py::gf2_osd0 given the same column order —
    including the reference's residual-exhaustion stopping rule, which
    decides WHICH low-reliability columns keep their BP values."""
    import jax.numpy as jnp

    from ldpcdecoders_tpu.native import (gf2_osd0_host, gf2_pack_cols,
                                         native_available)
    from ldpcdecoders_tpu.ops.gf2 import gf2_osd0, pack_bits

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for _ in range(15):
        m = int(rng.integers(5, 40))
        n = int(rng.integers(m, 90))
        H = (rng.random((m, n)) < 0.3).astype(np.uint8)
        x = (rng.random(n) < 0.15).astype(np.uint8)
        syn = (H @ x) & 1
        bp = (rng.random(n) < 0.15).astype(np.uint8)
        perm = rng.permutation(n).astype(np.int32)
        Hp = np.asarray(pack_bits(jnp.asarray(H[:, perm])))
        resid = (syn ^ ((H @ bp) & 1)).astype(np.uint32)
        corr_sorted = np.asarray(gf2_osd0(
            jnp.asarray(Hp), jnp.asarray(bp[perm], jnp.uint32),
            jnp.asarray(resid), n))
        dev = np.zeros(n, np.uint8)
        dev[perm] = corr_sorted.astype(np.uint8)
        out, cons = gf2_osd0_host(gf2_pack_cols(H), m, perm[None, :],
                                  bp[None, :], syn[None, :])
        assert cons[0]
        np.testing.assert_array_equal(dev, out[0])


def test_osd_impl_host_decoder_parity():
    """Decoder-level: osd_impl='host' output equals the device path on
    real BP soft outputs, for both scopes."""
    from ldpcdecoders_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    H = lt.toric_code_x(3)
    rng = np.random.default_rng(3)
    x = (rng.random((128, H.shape[1])) < 0.06).astype(np.uint8)
    syn = (x @ H.T) & 1
    for scope in ("all", "failed"):
        dev = lt.BeliefPropagationOSDDecoder(H, 0.06, 40, osd_scope=scope)
        host = lt.BeliefPropagationOSDDecoder(H, 0.06, 40, osd_scope=scope,
                                              osd_impl="host")
        ed, cd = dev.batch_decode(syn, seed=1)
        eh, ch = host.batch_decode(syn, seed=1)
        np.testing.assert_array_equal(cd, ch)
        np.testing.assert_array_equal(ed, eh)


def test_osd_impl_host_validation():
    H = lt.toric_code_x(3)
    with pytest.raises(ValueError, match="osd_order=0"):
        lt.BeliefPropagationOSDDecoder(H, 0.05, 20, osd_order=2,
                                       osd_impl="host")
    with pytest.raises(ValueError, match="fused"):
        lt.BeliefPropagationOSDDecoder(H, 0.05, 20, fused=True,
                                       osd_impl="host")
    with pytest.raises(ValueError, match="osd_impl"):
        lt.BeliefPropagationOSDDecoder(H, 0.05, 20, osd_impl="gpu")
    # config round-trip carries the knob
    cfg = lt.DecoderConfig(kind="bposd", per=0.05, max_iters=20,
                           osd_impl="host")
    assert lt.DecoderConfig.from_json(cfg.to_json()).osd_impl == "host"


def test_gf2_osd_cs_host_golden_vs_device():
    """Host OSD-CS (combination sweep) equals ops/gf2.py::osd_cs_sweep
    bit for bit: same candidate set, same tie order, same application."""
    import jax.numpy as jnp

    from ldpcdecoders_tpu.native import (gf2_osd_cs_host, gf2_pack_cols,
                                         native_available)
    from ldpcdecoders_tpu.ops.gf2 import gf2_osd_cs, pack_bits

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    for _ in range(15):
        m = int(rng.integers(5, 30))
        n = int(rng.integers(m + 2, 80))
        lam = int(rng.integers(2, 12))
        H = (rng.random((m, n)) < 0.3).astype(np.uint8)
        x = (rng.random(n) < 0.15).astype(np.uint8)
        syn = (H @ x) & 1
        bp = (rng.random(n) < 0.15).astype(np.uint8)
        perm = rng.permutation(n).astype(np.int32)
        Hp = np.asarray(pack_bits(jnp.asarray(H[:, perm])))
        corr = np.asarray(gf2_osd_cs(
            jnp.asarray(Hp), jnp.asarray(bp[perm], jnp.uint32),
            jnp.asarray(syn, jnp.uint32), lam, n))
        dev = np.zeros(n, np.uint8)
        dev[perm] = corr.astype(np.uint8)
        out, cons = gf2_osd_cs_host(gf2_pack_cols(H), m, lam,
                                    perm[None, :], bp[None, :],
                                    syn[None, :])
        assert cons[0]
        np.testing.assert_array_equal(dev, out[0])


def test_osd_impl_host_cs_decoder_parity():
    from ldpcdecoders_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    H = lt.toric_code_x(3)
    rng = np.random.default_rng(5)
    x = (rng.random((64, H.shape[1])) < 0.06).astype(np.uint8)
    syn = (x @ H.T) & 1
    kw = dict(osd_order=8, osd_method="combination_sweep", osd_scope="all")
    ed, _ = lt.BeliefPropagationOSDDecoder(H, 0.06, 40, **kw).batch_decode(
        syn, seed=1)
    eh, _ = lt.BeliefPropagationOSDDecoder(
        H, 0.06, 40, osd_impl="host", **kw).batch_decode(syn, seed=1)
    np.testing.assert_array_equal(ed, eh)
    # exhaustive OSD-w>0 on host is still rejected
    with pytest.raises(ValueError, match="combination_sweep"):
        lt.BeliefPropagationOSDDecoder(H, 0.06, 40, osd_order=2,
                                       osd_impl="host")


def test_config_inner_minsum_roundtrip():
    cfg = lt.DecoderConfig(kind="bposd", per=0.05, max_iters=30,
                           inner="minsum")
    assert lt.DecoderConfig.from_json(cfg.to_json()).inner == "minsum"
    d = cfg.build(lt.toric_code_x(3))
    syn = np.zeros((4, 9), np.uint8)
    _, conv = d.batch_decode(syn)
    assert conv.all()


def test_osd_impl_host_cs_actually_dispatches_host(monkeypatch):
    """Regression: osd_order>0 + combination_sweep + osd_scope='all' +
    osd_impl='host' must run the NATIVE eliminator, not the device
    OSD-w branch (the whole point of the host impl is models too wide
    for the device elimination)."""
    from ldpcdecoders_tpu.models import bposd as bposd_mod
    from ldpcdecoders_tpu.native import gf2_osd_cs_host, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    calls = []

    def spy(*a, **kw):
        calls.append(1)
        return gf2_osd_cs_host(*a, **kw)

    import ldpcdecoders_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "gf2_osd_cs_host", spy)
    H = lt.toric_code_x(3)
    dec = lt.BeliefPropagationOSDDecoder(
        H, 0.06, 30, osd_order=6, osd_method="combination_sweep",
        osd_scope="all", osd_impl="host")
    syn = np.zeros((8, H.shape[0]), np.uint8)
    syn[1, 3] = 1
    dec.batch_decode(syn, seed=1)
    assert calls, "native OSD-CS was never invoked"


def _rref_oracle(H, order, bp, syn, lam, lam3):
    """Pure-Python reference for the native OSD-CS lane (int bitmasks):
    full-RREF column elimination + base/single/pair/triple sweep with
    the native precedence and lexicographic tie rules."""
    m, n = H.shape
    colbits = [int.from_bytes(
        np.packbits(H[:, c], bitorder="little").tobytes(), "little")
        for c in range(n)]
    rhs = int.from_bytes(
        np.packbits(syn, bitorder="little").tobytes(), "little")
    for c in range(n):
        if bp[c]:
            rhs ^= colbits[c]
    basis = []  # (red, combo, prow, pivcol)
    acc = 0
    np_combos, np_cols = [], []
    for col in order:
        cand, cw = colbits[col], 0
        for bi, (red, combo, prow, _) in enumerate(basis):
            if (cand >> prow) & 1:
                cand ^= red
                cw ^= combo
        if cand:
            rank = len(basis)
            cw ^= 1 << rank
            prow = (cand & -cand).bit_length() - 1
            # keep full RREF: clear prow from existing basis columns
            basis = [(r ^ (cand if (r >> prow) & 1 else 0),
                      c ^ (cw if (r >> prow) & 1 else 0), p, pc)
                     for (r, c, p, pc) in basis]
            if bp[col]:
                acc ^= 1 << rank
            if (rhs >> prow) & 1:
                rhs ^= cand
                acc ^= cw
            basis.append((cand, cw, prow, col))
        else:
            np_combos.append(cw)
            np_cols.append(col)
    out = np.array(bp, np.uint8).copy()
    for b, (_, _, _, pc) in enumerate(basis):
        out[pc] = (acc >> b) & 1

    def weight(extra_flips):
        o = out.copy()
        for k in extra_flips:
            o[np_cols[k]] ^= 1
            for b in range(len(basis)):
                o[basis[b][3]] ^= (np_combos[k] >> b) & 1
        return int(o.sum()), o

    w0, _ = weight(())
    best1, j1 = 1 << 40, None
    for k in range(len(np_cols)):
        w, _ = weight((k,))
        if w - w0 < best1:
            best1, j1 = w - w0, (k,)
    L = min(lam, len(np_cols))
    best2, j2 = 1 << 40, None
    for i in range(L):
        for j in range(i + 1, L):
            w, _ = weight((i, j))
            if w - w0 < best2:
                best2, j2 = w - w0, (i, j)
    L3 = min(lam3, len(np_cols))
    best3, j3 = 1 << 40, None
    for i in range(L3):
        for j in range(i + 1, L3):
            for k in range(j + 1, L3):
                w, _ = weight((i, j, k))
                if w - w0 < best3:
                    best3, j3 = w - w0, (i, j, k)
    if best3 < 0 and best3 < best2 and best3 < best1:
        return weight(j3)[1], rhs == 0
    if best2 < 0 and best2 < best1:
        return weight(j2)[1], rhs == 0
    if best1 < 0:
        return weight(j1)[1], rhs == 0
    return out, rhs == 0


def test_gf2_osd_cs_triples_matches_oracle():
    """The order-3 (lam3) host sweep — a superset of the device pair
    sweep — must match a brute-force pure-Python full-RREF oracle
    exactly, including precedence and lexicographic tie-breaking."""
    from ldpcdecoders_tpu.native import (gf2_osd_cs_host, gf2_pack_cols,
                                         native_available)

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    m, n, B = 22, 56, 24
    H = (rng.random((m, n)) < 0.2).astype(np.uint8)
    H[:, H.sum(axis=0) == 0] = 1
    Hcols = gf2_pack_cols(H)
    x = (rng.random((B, n)) < 0.1).astype(np.uint8)
    syn = (x @ H.T % 2).astype(np.uint8)
    bp = (rng.random((B, n)) < 0.08).astype(np.uint8)
    rel = rng.random((B, n)).astype(np.float32)
    order = np.argsort(-rel, axis=1, kind="stable").astype(np.int32)
    for lam, lam3 in ((10, 8), (14, 0), (0, 6)):
        out, cons = gf2_osd_cs_host(Hcols, m, lam, order, bp, syn,
                                    lam3=lam3)
        for b in range(B):
            exp, c = _rref_oracle(H, order[b], bp[b], syn[b], lam, lam3)
            np.testing.assert_array_equal(out[b], exp,
                                          err_msg=f"lane {b} lam={lam}")
            assert bool(cons[b]) == c
