"""Neural (trainable) min-sum: the learned (alpha, beta) schedule must
recover a real chunk of the min-sum -> sum-product gap at equal decode
cost (Lugosch & Gross 2017-style training, models/neural.py)."""

import numpy as np
import pytest

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.models.neural import NeuralMinSumDecoder


@pytest.fixture(scope="module")
def trained():
    H = lt.parity_check_matrix(240, 6, 3, rng=0)
    dec = NeuralMinSumDecoder(H, 0.06, 8)
    hist = dec.train(steps=100, batch=192, lr=2e-2, seed=0)
    return H, dec, hist


def test_training_reduces_loss_and_moves_params(trained):
    _, dec, hist = trained
    losses = hist["losses"]
    assert losses[-1] < losses[0] * 0.5
    assert not np.allclose(dec.alpha, 1.0)
    assert (dec.alpha > 0).all() and (dec.beta >= 0).all()


def test_trained_beats_plain_minsum(trained):
    """Held-out FER: the trained schedule must clearly beat plain
    min-sum and at least match a hand-tuned alpha=0.8 at this config."""
    H, dec, _ = trained
    per, T = 0.06, 8
    rng = np.random.default_rng(99)
    B = 1024
    e = rng.random((B, 240)) < per
    syn = ((e @ H.T) % 2).astype(np.int8)

    def fer(d):
        out, _ = d.batch_decode(syn)
        return 1.0 - (out.astype(bool) == e).all(axis=1).mean()

    f_plain = fer(lt.MinSumDecoder(H, per, T))
    f_hand = fer(lt.MinSumDecoder(H, per, T, alpha=0.8))
    f_neural = fer(dec)
    assert f_neural < f_plain - 0.2
    assert f_neural <= f_hand + 0.02


def test_decode_matches_minsum_with_same_schedule(trained):
    """The trained decoder IS MinSumDecoder with the schedule baked in."""
    H, dec, _ = trained
    twin = lt.MinSumDecoder(H, 0.06, 8, alpha=dec.alpha, beta=dec.beta)
    rng = np.random.default_rng(5)
    e = rng.random((64, 240)) < 0.06
    syn = ((e @ H.T) % 2).astype(np.int8)
    a, ca = dec.batch_decode(syn)
    b, cb = twin.batch_decode(syn)
    assert np.array_equal(a, b)
    assert np.array_equal(ca, cb)
    # per-call prior override works on the trained decoder too
    c, _ = dec.batch_decode(syn, per=0.03)
    assert c.shape == a.shape


def test_learn_scope_freezes_parameters():
    H = lt.parity_check_matrix(120, 6, 3, rng=1)
    d_a = NeuralMinSumDecoder(H, 0.05, 4, learn="alpha")
    d_a.train(steps=10, batch=32, seed=1)
    assert np.allclose(d_a.beta, 0.0)
    assert not np.allclose(d_a.alpha, 1.0)
    d_b = NeuralMinSumDecoder(H, 0.05, 4, learn="beta")
    d_b.train(steps=10, batch=32, seed=1)
    assert np.allclose(d_b.alpha, 1.0)
    assert not np.allclose(d_b.beta, 0.0)
    with pytest.raises(ValueError, match="learn must be"):
        NeuralMinSumDecoder(H, 0.05, 4, learn="nope")


def test_range_training_is_robust_across_rates():
    """A per_range-trained schedule must beat plain min-sum at BOTH ends
    of its operating region (single-rate schedules can overfit)."""
    H = lt.parity_check_matrix(240, 6, 3, rng=0)
    T = 8
    dec = NeuralMinSumDecoder(H, 0.05, T)
    dec.train(steps=100, batch=192, lr=2e-2, seed=2, per_range=(0.03, 0.07))
    rng = np.random.default_rng(11)
    for per in (0.03, 0.07):
        e = rng.random((512, 240)) < per
        syn = ((e @ H.T) % 2).astype(np.int8)
        out_n, _ = dec.batch_decode(syn, per=per)
        out_p, _ = lt.MinSumDecoder(H, per, T).batch_decode(syn)
        fer_n = 1 - (out_n.astype(bool) == e).all(axis=1).mean()
        fer_p = 1 - (out_p.astype(bool) == e).all(axis=1).mean()
        assert fer_n < fer_p
    with pytest.raises(ValueError, match="per_range"):
        dec.train(steps=1, per_range=(0.0, 0.6))


def test_schedule_save_load_roundtrip(tmp_path, trained):
    H, dec, _ = trained
    path = str(tmp_path / "sched.npz")
    dec.save_schedule(path)
    fresh = NeuralMinSumDecoder(H, 0.06, 8).load_schedule(path)
    assert np.array_equal(fresh.alpha, dec.alpha)
    assert np.array_equal(fresh.beta, dec.beta)
    rng = np.random.default_rng(3)
    e = rng.random((32, 240)) < 0.06
    syn = ((e @ H.T) % 2).astype(np.int8)
    a, _ = dec.batch_decode(syn)
    b, _ = fresh.batch_decode(syn)
    assert np.array_equal(a, b)
    # mismatched config refused
    other = NeuralMinSumDecoder(H, 0.06, 6)
    with pytest.raises(ValueError, match="trained for max_iters=8"):
        other.load_schedule(path)


def test_per_edge_weights_beat_uniform_bp_on_toric():
    """Per-edge weights (param_scope='edge') break toric-code trapping-set
    symmetries that no uniform schedule can: syndrome-match rate must beat
    plain min-sum by a clear margin."""
    Hx = lt.toric_code_x(4)
    per, T = 0.04, 12
    rng = np.random.default_rng(5)
    B = 512
    e = rng.random((B, Hx.shape[1])) < per
    syn = ((e @ Hx.T) % 2).astype(np.int8)

    def smatch(d):
        out, _ = d.batch_decode(syn)
        sh = (out.astype(np.int64) @ Hx.T) % 2
        return float((sh == syn).all(axis=1).mean())

    dec = NeuralMinSumDecoder(Hx, per, T, param_scope="edge")
    hist = dec.train(steps=100, batch=192, seed=0)
    assert hist["losses"][-1] < hist["losses"][0]
    assert dec.w is not None and not np.allclose(dec.w, 1.0)
    s_neural = smatch(dec)
    s_plain = smatch(lt.MinSumDecoder(Hx, per, T))
    assert s_neural > s_plain + 0.02

    # persistence round-trips the weights; scope mismatch is refused
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "sched.npz")
        dec.save_schedule(p)
        fresh = NeuralMinSumDecoder(Hx, per, T, param_scope="edge").load_schedule(p)
        assert np.array_equal(fresh.w, dec.w)
        a, _ = dec.batch_decode(syn)
        b, _ = fresh.batch_decode(syn)
        assert np.array_equal(a, b)
        plain = NeuralMinSumDecoder(Hx, per, T)
        plain.save_schedule(os.path.join(td, "now.npz"))
        with pytest.raises(ValueError, match="per-edge"):
            NeuralMinSumDecoder(Hx, per, T, param_scope="edge").load_schedule(
                os.path.join(td, "now.npz")
            )
    with pytest.raises(ValueError, match="param_scope"):
        NeuralMinSumDecoder(Hx, per, T, param_scope="nope")
