"""Bivariate bicycle quantum codes: construction invariants and CSS decode.

The k values of every registry entry are re-derived from GF(2) ranks, so
a transcription error in the published-table constants cannot survive.
"""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.bicycle import (
    BICYCLE_CODES,
    bb_poly_matrix,
    bivariate_bicycle_code,
    css_code_k,
    named_bicycle_code,
)


def test_poly_matrix_monomials_and_cancellation():
    # x over Z_3 (m=1): shift by one
    X = bb_poly_matrix(3, 1, [(1, 0)])
    assert np.array_equal(X, np.roll(np.eye(3, dtype=np.uint8), 1, axis=1))
    # identity term
    I = bb_poly_matrix(2, 2, [(0, 0)])
    assert np.array_equal(I, np.eye(4, dtype=np.uint8))
    # duplicate terms cancel over GF(2)
    Z = bb_poly_matrix(2, 2, [(1, 1), (1, 1)])
    assert Z.sum() == 0
    with pytest.raises(ValueError, match=">= 1"):
        bb_poly_matrix(0, 2, [(0, 0)])


@pytest.mark.parametrize("name", sorted(BICYCLE_CODES))
def test_named_codes_parameters(name):
    Hx, Hz, info = named_bicycle_code(name)
    n = info["n"]
    assert Hx.shape == Hz.shape == (n // 2, n)
    # CSS condition (holds by commutativity, but verify the build)
    assert not ((Hx.astype(np.int64) @ Hz.T) % 2).any()
    # every BB code here is (6, 3)-regular
    assert set(Hx.sum(axis=1)) == {6} and set(Hx.sum(axis=0)) == {3}
    # k re-derived from ranks must match the published value
    assert css_code_k(Hx, Hz) == info["k"]


def test_named_code_unknown():
    with pytest.raises(ValueError, match="unknown BB code"):
        named_bicycle_code("bb1")


def test_custom_construction_matches_named():
    info = BICYCLE_CODES["bb72"]
    Hx, Hz = bivariate_bicycle_code(
        info["l"], info["m"], info["a_terms"], info["b_terms"]
    )
    Hx2, Hz2, _ = named_bicycle_code("bb72")
    assert np.array_equal(Hx, Hx2) and np.array_equal(Hz, Hz2)


def test_gross_code_css_decode_and_logicals():
    """Decode the [[144,12,12]] gross code with BP+OSD at low noise:
    syndrome-consistent always, logically correct almost always."""
    Hx, Hz, _ = named_bicycle_code("bb144")
    dec = lt.CSSDecoder(Hx, Hz, per=0.005, max_iters=60, decoder="bposd")
    rng = np.random.default_rng(0)
    B, n = 64, Hx.shape[1]
    z_true = (rng.random((B, n)) < 0.005).astype(np.uint8)
    x_true = (rng.random((B, n)) < 0.005).astype(np.uint8)
    syn_x = (z_true @ Hx.T) % 2
    syn_z = (x_true @ Hz.T) % 2
    z_hat, x_hat, _, _ = dec.batch_decode(syn_x, syn_z)
    # OSD output always reproduces the syndromes
    assert (((z_hat.astype(np.int64) @ Hx.T) % 2) == syn_x).all()
    assert (((x_hat.astype(np.int64) @ Hz.T) % 2) == syn_z).all()
    # degeneracy-aware logical failure: residuals are stabilizers in
    # nearly every lane at this noise
    zf, xf = dec.logical_failures(z_true, z_hat, x_true, x_hat)
    assert zf.mean() < 0.05 and xf.mean() < 0.05


def test_cli_sweep_bicycle(capsys):
    import json

    from ldpcdecoders_tpu.cli import main

    rc = main(
        [
            "sweep",
            "--code", "bicycle:bb72",
            "--decoder", "bposd",
            "--pers", "0.01",
            "--trials", "32",
            "--batch", "32",
            "--max-iters", "30",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["0.01"]["trials"] == 32


def test_css_logical_sweep_reproducible():
    from ldpcdecoders_tpu.harness import css_logical_sweep

    Hx, Hz, _ = named_bicycle_code("bb72")
    kw = dict(trials_per_point=64, max_iters=30, batch=32, seed=3)
    out1 = css_logical_sweep(Hx, Hz, [0.002, 0.02], **kw)
    out2 = css_logical_sweep(Hx, Hz, [0.002, 0.02], **kw)
    for per in (0.002, 0.02):
        assert out1[per]["trials"] == 64
        for k in ("z_logical_rate", "x_logical_rate", "any_logical_rate"):
            assert out1[per][k] == out2[per][k]  # counted-RNG reproducibility
            assert 0.0 <= out1[per][k] <= 1.0
        lo, hi = out1[per]["any_logical_ci95"]
        assert lo <= out1[per]["any_logical_rate"] <= hi
    # low noise should not fail more often than high noise
    assert out1[0.002]["any_logical_rate"] <= out1[0.02]["any_logical_rate"]
