"""Pallas kernel tests (interpreter mode on CPU): the fused min-sum
updates must match the jnp reference path exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.models.minsum import make_minsum_decode_fn


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(240, 8, 4, rng=37)


def test_pallas_minsum_matches_jnp_path(code):
    graph = lt.TannerGraph.from_pcm(code)
    rng = np.random.default_rng(1)
    B = 16
    errs = rng.random((B, graph.n)) < 0.02
    syns = (errs @ code.T) % 2

    ref_fn = jax.jit(make_minsum_decode_fn(graph, 0.02, 30))
    pl_fn = jax.jit(
        make_minsum_decode_fn(graph, 0.02, 30, use_pallas=True, pallas_interpret=True)
    )
    r_err, r_conv, r_it, r_llr = ref_fn(jnp.asarray(syns))
    p_err, p_conv, p_it, p_llr = pl_fn(jnp.asarray(syns))
    assert np.array_equal(np.asarray(r_err), np.asarray(p_err))
    assert np.array_equal(np.asarray(r_conv), np.asarray(p_conv))
    assert np.array_equal(np.asarray(r_it), np.asarray(p_it))
    np.testing.assert_allclose(np.asarray(r_llr), np.asarray(p_llr), rtol=1e-5)


def test_pallas_minsum_irregular_graph():
    H = lt.toric_code_x(3)
    graph = lt.TannerGraph.from_pcm(H)
    rng = np.random.default_rng(2)
    B = 8
    errs = rng.random((B, graph.n)) < 0.03
    syns = (errs @ H.T) % 2
    ref_fn = jax.jit(make_minsum_decode_fn(graph, 0.03, 30))
    pl_fn = jax.jit(
        make_minsum_decode_fn(graph, 0.03, 30, use_pallas=True, pallas_interpret=True)
    )
    r = ref_fn(jnp.asarray(syns))
    p = pl_fn(jnp.asarray(syns))
    assert np.array_equal(np.asarray(r[0]), np.asarray(p[0]))
    assert np.array_equal(np.asarray(r[1]), np.asarray(p[1]))


def test_pallas_gf2_eliminate_matches_xla(code):
    """VMEM-resident Gauss–Jordan kernel vs ops/gf2.py::gf2_eliminate:
    bitwise-identical eliminated matrix, syndrome, and pivot map."""
    from ldpcdecoders_tpu.ops.gf2 import gf2_eliminate, pack_bits
    from ldpcdecoders_tpu.ops.pallas_gf2 import gf2_eliminate_pallas

    rng = np.random.default_rng(4)
    for B, m, n, dens in ((4, 60, 80, 0.3), (2, 96, 240, 0.05), (3, 31, 33, 0.5)):
        H = (rng.random((B, m, n)) < dens).astype(np.uint32)
        s = (rng.random((B, m)) < 0.5).astype(np.uint32)
        Ht = jnp.transpose(jax.vmap(pack_bits)(jnp.asarray(H)), (0, 2, 1))
        ref = jax.vmap(lambda ht, sv: gf2_eliminate(ht, sv, n))(Ht, jnp.asarray(s))
        out = gf2_eliminate_pallas(Ht, jnp.asarray(s), n, interpret=True)
        for name, a, b in zip(("Ht", "s", "piv"), ref[:3], out):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (name, B, m, n)


def test_pallas_osd0_eliminate_matches_xla(code):
    """OSD-0 Pallas kernel vs ops/gf2.py::gf2_osd0: identical corrections
    (incl. an inconsistent-residual lane)."""
    from ldpcdecoders_tpu.ops.gf2 import gf2_osd0, pack_bits
    from ldpcdecoders_tpu.ops.pallas_gf2 import gf2_osd0_pallas

    rng = np.random.default_rng(6)
    for B, m, n, dens in ((4, 60, 80, 0.3), (2, 31, 33, 0.5)):
        H = (rng.random((B, m, n)) < dens).astype(np.uint32)
        bp = (rng.random((B, n)) < 0.2).astype(np.uint32)
        extra = (rng.random((B, n)) < 0.1).astype(np.uint32)
        resid = (np.einsum("bmn,bn->bm", H, extra) % 2).astype(np.uint32)
        resid[0] = rng.random(m) < 0.5  # possibly outside the row space
        Hp = jax.vmap(pack_bits)(jnp.asarray(H))
        Ht = jnp.transpose(Hp, (0, 2, 1))
        ref = jax.vmap(lambda hp, b, r: gf2_osd0(hp, b, r, n))(
            Hp, jnp.asarray(bp), jnp.asarray(resid)
        )
        out = gf2_osd0_pallas(Ht, jnp.asarray(resid), jnp.asarray(bp), n, interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(out)), (B, m, n)


def test_pallas_osd_decoder_matches_xla(code):
    """Full BP+OSD decodes (orders 0 and 2) through the Pallas kernels
    (interpreter) must equal the default XLA path bit-for-bit."""
    from ldpcdecoders_tpu.models.bposd import make_osd_fns
    import ldpcdecoders_tpu.ops.pallas_gf2 as pg

    H = lt.parity_check_matrix(120, 6, 3, rng=51)
    rng = np.random.default_rng(5)
    B = 8
    # high noise so several lanes fail BP and the OSD-0 path does real work
    errs = rng.random((B, H.shape[1])) < 0.06
    syns = (errs @ H.T) % 2

    orig_w, orig_0 = pg.gf2_eliminate_pallas, pg.gf2_osd0_pallas
    pg.gf2_eliminate_pallas = lambda *a, **k: orig_w(*a, **{**k, "interpret": True})
    pg.gf2_osd0_pallas = lambda *a, **k: orig_0(*a, **{**k, "interpret": True})
    try:
        for order in (0, 2):
            ref = lt.BeliefPropagationOSDDecoder(
                H, 0.06, 30, osd_order=order, use_pallas=False
            )
            e_ref, c_ref = ref.batch_decode(syns)
            osd0, osdw = make_osd_fns(ref.graph, order, use_pallas=True)
            bp_err, conv, iters, logp = ref._bp_fn(jnp.asarray(syns), None)
            if order == 0:
                need = np.flatnonzero(~np.asarray(conv))
                assert need.size > 0, "test needs BP-failing lanes"
                e_pl = np.asarray(bp_err).copy()
                sub = np.asarray(osd0(jnp.asarray(syns[need]), bp_err[need], logp[need]))
                e_pl[need] = sub.astype(np.int8)
            else:
                e_pl = np.asarray(osdw(jnp.asarray(syns), bp_err, logp))
            assert np.array_equal(e_ref, e_pl.astype(np.int8)), f"order {order}"
    finally:
        pg.gf2_eliminate_pallas, pg.gf2_osd0_pallas = orig_w, orig_0


def test_pallas_normalized_offset_variants(code):
    graph = lt.TannerGraph.from_pcm(code)
    rng = np.random.default_rng(3)
    B = 8
    errs = rng.random((B, graph.n)) < 0.02
    syns = (errs @ code.T) % 2
    for alpha, beta in ((0.8, 0.0), (1.0, 0.15)):
        ref_fn = jax.jit(make_minsum_decode_fn(graph, 0.02, 20, alpha=alpha, beta=beta))
        pl_fn = jax.jit(
            make_minsum_decode_fn(
                graph, 0.02, 20, alpha=alpha, beta=beta,
                use_pallas=True, pallas_interpret=True,
            )
        )
        r = ref_fn(jnp.asarray(syns))
        p = pl_fn(jnp.asarray(syns))
        assert np.array_equal(np.asarray(r[0]), np.asarray(p[0])), (alpha, beta)
