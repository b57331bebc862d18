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
