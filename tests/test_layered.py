"""Layered-schedule min-sum tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.models.layered import build_layers


@pytest.fixture(scope="module")
def code():
    return lt.parity_check_matrix(240, 8, 4, rng=53)


def test_layers_are_conflict_free(code):
    g = lt.TannerGraph.from_pcm(code)
    layer_of, L = build_layers(g)
    assert L >= 1
    for li in range(L):
        seen = set()
        for i in np.flatnonzero(layer_of == li):
            nbrs = set(g.chk_vars[i, g.chk_mask[i]].tolist())
            assert not (seen & nbrs), f"layer {li} has a variable conflict"
            seen |= nbrs


def test_gallager_code_has_wc_layers(code):
    # Gallager construction: each of the wc stacked blocks touches every
    # variable exactly once -> a natural wc-layer conflict-free partition
    g = lt.TannerGraph.from_pcm(code)
    _, L = build_layers(g)
    assert L == 4  # wc


def test_layered_recovers_errors(code):
    H = code
    rng = np.random.default_rng(1)
    errs = rng.random((64, H.shape[1])) < 0.01
    syns = (errs @ H.T) % 2
    dec = lt.LayeredMinSumDecoder(H, 0.01, 50)
    guesses, conv = dec.batch_decode(syns)
    assert conv.all()
    assert (guesses.astype(bool) == errs).all()


def test_layered_converges_faster_than_flooding(code):
    H = code
    rng = np.random.default_rng(2)
    errs = rng.random((64, H.shape[1])) < 0.03
    syns = (errs @ H.T) % 2
    flood = lt.MinSumDecoder(H, 0.03, 100, alpha=0.8)
    lay = lt.LayeredMinSumDecoder(H, 0.03, 100, alpha=0.8)
    _, cf, itf, _, _ = flood.batch_decode_detailed(syns)
    _, cl, itl, _, _ = lay.batch_decode_detailed(syns)
    assert cl.mean() >= cf.mean() - 0.05
    both = cf & cl
    assert itl[both].mean() < itf[both].mean(), "layered should need fewer sweeps"


def test_layered_irregular_graph():
    H = lt.toric_code_x(3)
    rng = np.random.default_rng(3)
    errs = rng.random((32, H.shape[1])) < 0.02
    syns = (errs @ H.T) % 2
    dec = lt.LayeredMinSumDecoder(H, 0.02, 50)
    guesses, conv = dec.batch_decode(syns)
    synhat = (guesses.astype(int) @ H.T) % 2
    for b in np.flatnonzero(conv):
        assert np.array_equal(synhat[b], syns[b])


def test_layered_damping_knob():
    H = lt.parity_check_matrix(240, 6, 3, rng=5)
    rng = np.random.default_rng(0)
    errs = rng.random((32, 240)) < 0.02
    syn = (errs @ H.T % 2).astype(np.uint8)
    base = lt.LayeredMinSumDecoder(H, 0.02, 30)
    d0 = lt.LayeredMinSumDecoder(H, 0.02, 30, damping=0.0)
    e0, _ = base.batch_decode(syn)
    e1, _ = d0.batch_decode(syn)
    np.testing.assert_array_equal(e0, e1)  # damping=0 is the plain decoder
    d = lt.LayeredMinSumDecoder(H, 0.02, 30, damping=0.3)
    ed, cd = d.batch_decode(syn)
    assert (ed[cd].astype(np.uint8) @ H.T % 2 == syn[cd]).all()
    with pytest.raises(ValueError, match="damping"):
        lt.LayeredMinSumDecoder(H, 0.02, 10, damping=1.5)
    cfg = lt.DecoderConfig(kind="layered_minsum", per=0.02, max_iters=20,
                           damping=0.25)
    assert cfg.build(H).damping == 0.25
