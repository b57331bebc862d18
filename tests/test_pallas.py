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


def test_pallas_osdw_decoder_matches_xla(code):
    """Full BP+OSD-2 decode through the Pallas elimination (interpreter)
    must equal the default XLA path bit-for-bit."""
    H = lt.parity_check_matrix(120, 6, 3, rng=51)
    rng = np.random.default_rng(5)
    B = 8
    errs = rng.random((B, H.shape[1])) < 0.06
    syns = (errs @ H.T) % 2

    ref = lt.BeliefPropagationOSDDecoder(H, 0.06, 30, osd_order=2, use_pallas=False)
    e_ref, c_ref = ref.batch_decode(syns)

    # interpreter-mode pallas: patch the kernel call like the minsum tests
    from ldpcdecoders_tpu.models.bposd import make_osd_fns
    import ldpcdecoders_tpu.ops.pallas_gf2 as pg

    orig = pg.gf2_eliminate_pallas
    pg.gf2_eliminate_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        _, osdw = make_osd_fns(ref.graph, 2, use_pallas=True)
        bp_err, conv, iters, logp = ref._bp_fn(jnp.asarray(syns), None)
        e_pl = np.asarray(osdw(jnp.asarray(syns), bp_err, logp))
    finally:
        pg.gf2_eliminate_pallas = orig
    assert np.array_equal(e_ref, e_pl.astype(np.int8))


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
