"""CSS-pair decoder + TannerGraph persistence tests."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes.graph import TannerGraph
from ldpcdecoders_tpu.utils import save_graph_npz, load_graph_npz


def test_css_decoder_toric():
    d = 3
    Hx, Hz = lt.toric_code_x(d), lt.toric_code_z(d)
    rng = np.random.default_rng(1)
    B = 32
    z_err_true = rng.random((B, Hx.shape[1])) < 0.03  # detected by Hx
    x_err_true = rng.random((B, Hz.shape[1])) < 0.03  # detected by Hz
    syn_x = (z_err_true @ Hx.T) % 2
    syn_z = (x_err_true @ Hz.T) % 2

    dec = lt.CSSDecoder(Hx, Hz, per=0.03, max_iters=50, decoder="bposd")
    z_err, x_err, z_conv, x_conv = dec.batch_decode(syn_x, syn_z)
    assert (((z_err.astype(int) @ Hx.T) % 2) == syn_x).all()
    assert (((x_err.astype(int) @ Hz.T) % 2) == syn_z).all()


def test_css_decoder_single_and_bpots():
    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    rng = np.random.default_rng(2)
    ze = rng.random(Hx.shape[1]) < 0.03
    xe = rng.random(Hz.shape[1]) < 0.03
    dec = lt.CSSDecoder(Hx, Hz, per=0.03, max_iters=50, decoder="bpots", C=3.0)
    z, x, okz, okx = dec.decode((Hx @ ze) % 2, (Hz @ xe) % 2)
    assert np.array_equal((Hx @ z.astype(int)) % 2, (Hx @ ze) % 2)
    assert np.array_equal((Hz @ x.astype(int)) % 2, (Hz @ xe) % 2)


def test_css_decoder_rejects_non_css_pair():
    H1 = lt.parity_check_matrix(24, 6, 3, rng=1)
    with pytest.raises(ValueError, match="CSS condition"):
        lt.CSSDecoder(H1, H1, per=0.01, max_iters=10)
    with pytest.raises(ValueError, match="same qubits"):
        lt.CSSDecoder(lt.toric_code_x(2), lt.toric_code_z(3), per=0.01, max_iters=10)


def test_css_decoder_hgp_with_vector_prior():
    H1 = lt.parity_check_matrix(12, 4, 2, rng=4)
    Hx, Hz = lt.hypergraph_product(H1, H1)
    n = Hx.shape[1]
    prior = np.full(n, 0.02)
    dec = lt.CSSDecoder(Hx, Hz, per=prior, max_iters=50, decoder="bp")
    rng = np.random.default_rng(5)
    ze = rng.random((8, n)) < 0.02
    xe = rng.random((8, n)) < 0.02
    z, x, zc, xc = dec.batch_decode((ze @ Hx.T) % 2, (xe @ Hz.T) % 2)
    synx = (z.astype(int) @ Hx.T) % 2
    for b in np.flatnonzero(zc):
        assert np.array_equal(synx[b], (ze[b] @ Hx.T) % 2)


def test_graph_npz_roundtrip(tmp_path):
    H = lt.parity_check_matrix(120, 6, 3, rng=6)
    # dense graph
    g = TannerGraph.from_pcm(H)
    p = str(tmp_path / "g.npz")
    save_graph_npz(p, g)
    g2 = load_graph_npz(p)
    for f in ("chk_vars", "chk_mask", "var_chks", "var_mask", "c2v_gather", "v2c_gather", "H"):
        assert np.array_equal(getattr(g, f), getattr(g2, f)), f
    # dense-free graph round-trips with H=None and still decodes
    rows, cols = np.nonzero(H)
    gs = TannerGraph.from_edges(rows, cols, *H.shape)
    p2 = str(tmp_path / "gs.npz")
    save_graph_npz(p2, gs)
    gs2 = load_graph_npz(p2)
    assert gs2.H is None
    dec = lt.MinSumDecoder(gs2, 0.01, 30)
    e, c = dec.decode(np.zeros(H.shape[0], np.uint8))
    assert c and not e.any()


def test_logical_failure_rate_degeneracy_aware():
    """On the toric code, a residual that is a stabilizer (row of the
    opposite block) is NOT a logical failure even though exact recovery
    failed; a residual that is a logical operator IS."""
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.utils import logical_failure_rate, gf2_rowspan_reducer

    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    n = Hx.shape[1]
    rng = np.random.default_rng(0)
    true_err = (rng.random((4, n)) < 0.05).astype(np.uint8)

    # residual = one Z-stabilizer (a row of Hz): harmless
    guess = true_err.copy()
    guess[0] ^= Hz[0].astype(np.uint8)
    # residual = sum of two stabilizers: still harmless
    guess[1] ^= (Hz[1] ^ Hz[2]).astype(np.uint8)
    # lanes 2,3: exact recovery
    assert logical_failure_rate(Hz, true_err, guess) == 0.0
    # exact-recovery LER would report 50% failures here
    assert (guess != true_err).any()

    # a logical operator: in ker(Hx) but outside rowspan(Hz) -> genuine
    # failure.  The toric code has 2 logical qubits, so such a kernel
    # basis vector must exist (deterministic construction).
    from ldpcdecoders_tpu.utils import gf2_kernel_basis

    in_span = gf2_rowspan_reducer(Hz)
    kernel = gf2_kernel_basis(Hx)
    logicals = kernel[~in_span(kernel)]
    assert len(logicals) >= 2  # toric: 2 logical qubits in this basis
    guess2 = true_err.copy()
    guess2[0] ^= logicals[0]
    assert logical_failure_rate(Hz, true_err, guess2) > 0.0


def test_gf2_rowspan_reducer_basics():
    from ldpcdecoders_tpu.utils import gf2_rowspan_reducer

    H = np.array([[1, 1, 0, 0], [0, 1, 1, 0]], np.uint8)
    f = gf2_rowspan_reducer(H)
    assert f(np.array([1, 0, 1, 0]))[0]          # row1 ^ row2
    assert f(np.zeros(4, np.uint8))[0]           # zero vector
    assert not f(np.array([0, 0, 0, 1]))[0]      # outside span
    # batch form
    got = f(np.array([[1, 1, 0, 0], [1, 1, 1, 1]], np.uint8))
    assert got.tolist() == [True, False]


def test_gf2_kernel_basis_properties():
    import ldpcdecoders_tpu as lt
    from ldpcdecoders_tpu.utils import gf2_kernel_basis

    H = lt.parity_check_matrix(48, 6, 3, rng=11)
    K = gf2_kernel_basis(H)
    # every basis vector is in the kernel
    assert ((K.astype(int) @ H.T.astype(int)) % 2 == 0).all()
    # dimension = n - rank, and the basis has full rank (unit free part)
    from ldpcdecoders_tpu.models.bposd import _gf2_rank

    assert len(K) == H.shape[1] - _gf2_rank(H)


def test_css_decoder_logical_failures():
    """End-to-end: decode toric syndromes and account failures modulo
    stabilizers — logical failures <= exact-recovery mismatches."""
    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    rng = np.random.default_rng(8)
    B = 64
    ze = (rng.random((B, Hx.shape[1])) < 0.05).astype(np.uint8)
    xe = (rng.random((B, Hz.shape[1])) < 0.05).astype(np.uint8)
    dec = lt.CSSDecoder(Hx, Hz, per=0.05, max_iters=50)
    z, x, zc, xc = dec.batch_decode((ze @ Hx.T) % 2, (xe @ Hz.T) % 2)
    zf, xf = dec.logical_failures(ze, z, xe, x)
    z_mismatch = (z.astype(np.uint8) != ze).any(axis=1)
    x_mismatch = (x.astype(np.uint8) != xe).any(axis=1)
    assert (~z_mismatch | zf | True).all()  # shapes line up
    # logical failure implies exact mismatch; degeneracy means the
    # converse need not hold
    assert not (zf & ~z_mismatch).any()
    assert not (xf & ~x_mismatch).any()
    assert zf.sum() <= z_mismatch.sum()
    assert xf.sum() <= x_mismatch.sum()


def test_css_heralded_loss_beats_blind_decoding():
    """erasures=: lost qubits get prior 0.5 in both blocks; knowing the
    loss locations must sharply beat blind decoding of the same shots."""
    Hx, Hz = lt.toric_code_x(4), lt.toric_code_z(4)
    dec = lt.CSSDecoder(Hx, Hz, per=0.01, max_iters=60)
    rng = np.random.default_rng(7)
    n, b = Hx.shape[1], 128
    eps = rng.random((b, n)) < 0.15
    z_true = np.where(eps, rng.random((b, n)) < 0.5, rng.random((b, n)) < 0.01)
    x_true = np.where(eps, rng.random((b, n)) < 0.5, rng.random((b, n)) < 0.01)
    syn_x = (z_true @ np.asarray(Hx).T) % 2
    syn_z = (x_true @ np.asarray(Hz).T) % 2
    zh, xh, _, _ = dec.batch_decode(syn_x, syn_z, erasures=eps)
    zf, xf = dec.logical_failures(z_true, zh, x_true, xh)
    aware = (zf | xf).mean()
    zh2, xh2, _, _ = dec.batch_decode(syn_x, syn_z, per=0.08)
    zf2, xf2 = dec.logical_failures(z_true, zh2, x_true, xh2)
    blind = (zf2 | xf2).mean()
    assert aware < blind / 3
    assert aware < 0.15


def test_css_erasures_validation():
    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    dec = lt.CSSDecoder(Hx, Hz, per=0.01, max_iters=10)
    sx = np.zeros((4, Hx.shape[0]), np.int8)
    sz = np.zeros((4, Hz.shape[0]), np.int8)
    with pytest.raises(ValueError, match="erasures of shape"):
        dec.batch_decode(sx, sz, erasures=np.zeros((4, 7), bool))
    dec_bf = lt.CSSDecoder(Hx, Hz, per=0.01, max_iters=10, decoder="bitflip")
    with pytest.raises(ValueError, match="erasure priors"):
        dec_bf.batch_decode(sx, sz, erasures=np.zeros((4, Hx.shape[1]), bool))


def test_css_logical_sweep_with_loss():
    """loss_rate: reproducible, and erasure-aware decoding keeps the
    logical rate far below the loss rate itself."""
    from ldpcdecoders_tpu.harness import css_logical_sweep

    Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
    a = css_logical_sweep(Hx, Hz, [0.01], trials_per_point=96, batch=48,
                          seed=5, loss_rate=0.10, max_iters=50)
    b = css_logical_sweep(Hx, Hz, [0.01], trials_per_point=96, batch=48,
                          seed=5, loss_rate=0.10, max_iters=50)
    assert a[0.01]["any_logical_rate"] == b[0.01]["any_logical_rate"]
    with pytest.raises(ValueError, match="prior-capable"):
        css_logical_sweep(Hx, Hz, [0.01], trials_per_point=8,
                          decoder="bitflip", loss_rate=0.1)
