"""Neural (trainable) min-sum decoding: learn the check-update scaling.

Plain min-sum overestimates check-to-variable message magnitudes; the
classic fixes are a normalization factor alpha (Chen & Fossorier 2002)
or an offset beta, usually hand-tuned as one global constant.  The
neural variants (Nachmani et al. 2016; Lugosch & Gross 2017, "Neural
Offset Min-Sum Decoding" — see PAPERS.md) instead *learn* these by
gradient descent through the unrolled decoder.  That is a natural fit
here: the decoder is already a pure JAX function, so the whole training
loop is `jax.value_and_grad` + optax on device — a capability the
CPU-bound reference package has no analog of.

This module trains one ``(alpha_t, beta_t)`` pair **per iteration**
(the parameter-tying of Lugosch & Gross's offset network, extended with
the normalization term) — 2*T scalars, enough to recover most of the
min-sum -> sum-product gap while adding zero decode-time cost: the
trained decoder is exactly ``MinSumDecoder`` with per-iteration
alpha/beta arrays baked in (models/minsum.py supports them natively).

Training objective: per-iteration sigmoid binary cross-entropy between
the soft LLR outputs and the injected error pattern (the "multiloss" of
Nachmani et al., which supplies gradient signal to early iterations),
averaged over a batch of channel samples drawn fresh each step.

No reference analog; validated by FER-improvement tests
(tests/test_neural.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.graph import TannerGraph
from ..ops.syndrome import make_syndrome_fn
from .base import Decoder
from .minsum import make_minsum_decode_fn
from .priors import per_to_llr

__all__ = ["NeuralMinSumDecoder", "make_soft_minsum_fn"]


def make_soft_minsum_fn(graph: TannerGraph, max_iters: int, dtype=jnp.float32):
    """Build the differentiable unrolled forward pass.

    Returns ``fn(params, syndromes [B, m], L0) -> llrs [T, B, n]`` where
    ``params = {"alpha": [T], "beta": [T]}`` plus optionally
    ``"w": [T, max_dv, n]`` per-edge variable-update weights (the full
    Nachmani parameterization).  A fixed-trip ``lax.scan`` (no early
    exit, soft outputs every iteration) — the training-time counterpart
    of models/minsum.py's production decode; the two share the
    slot-major layout and the two-min exclusive reduction, so a trained
    schedule transfers exactly.
    """
    m, n = graph.m, graph.n
    max_dc, max_dv = graph.max_dc, graph.max_dv
    c2v_t, v2c_t, chk_mask_t, var_mask_t = graph.slot_major()
    c2v = jnp.asarray(c2v_t)
    v2c = jnp.asarray(v2c_t)
    chk_mask = jnp.asarray(chk_mask_t)  # [max_dc, m]
    var_mask = jnp.asarray(var_mask_t)  # [max_dv, n]
    big = dtype(1e30)

    def check_update(nu, syn_flip, alpha, beta):
        B = nu.shape[0]
        Ng = jnp.take(nu.reshape(B, max_dv * n), c2v, axis=1).reshape(B, max_dc, m)
        masked = jnp.where(chk_mask, Ng, big)
        mag = jnp.abs(masked)
        neg = masked < dtype(0.0)
        min1 = mag[:, 0:1, :]
        idx1 = jnp.zeros((B, 1, m), jnp.int32)
        min2 = jnp.full_like(min1, big)
        parity = neg[:, 0:1, :]
        for k in range(1, max_dc):
            v = mag[:, k : k + 1, :]
            smaller = v < min1
            min2 = jnp.where(smaller, min1, jnp.minimum(min2, v))
            idx1 = jnp.where(smaller, k, idx1)
            min1 = jnp.where(smaller, v, min1)
            parity = jnp.logical_xor(parity, neg[:, k : k + 1, :])
        syn = syn_flip[:, None, :]
        outs = []
        for k in range(max_dc):
            excl = jnp.where(idx1 == k, min2, min1)
            flip = jnp.logical_xor(
                jnp.logical_xor(parity, neg[:, k : k + 1, :]), syn
            )
            mag_out = jnp.maximum(alpha * excl - beta, dtype(0.0))
            outs.append(jnp.where(flip, -mag_out, mag_out))
        return jnp.concatenate(outs, axis=1)

    def fn(params, syndromes, L0=None):
        syndromes = jnp.asarray(syndromes)
        B = syndromes.shape[0]
        if L0 is None:
            raise ValueError("pass the channel LLR L0 explicitly")
        L0 = jnp.broadcast_to(jnp.asarray(L0, dtype), (B, n))
        syn_flip = syndromes.astype(bool)
        nu0 = jnp.broadcast_to(L0[:, None, :], (B, max_dv, n)).astype(dtype)
        ab = jnp.stack(
            [jnp.asarray(params["alpha"], dtype), jnp.asarray(params["beta"], dtype)],
            axis=1,
        )  # [T, 2]
        w = params.get("w")
        xs = (ab, jnp.asarray(w, dtype)) if w is not None else (ab,)

        def step(nu, xs_t):
            ab_t = xs_t[0]
            mu = check_update(nu, syn_flip, ab_t[0], ab_t[1])
            Mg = jnp.take(mu.reshape(B, max_dc * m), v2c, axis=1).reshape(
                B, max_dv, n
            )
            Mg = jnp.where(var_mask, Mg, dtype(0.0))
            if len(xs_t) > 1:
                Mg = Mg * xs_t[1][None]
            total = L0 + jnp.sum(Mg, axis=1)
            return total[:, None, :] - Mg, total

        _, llrs = jax.lax.scan(step, nu0, xs)
        return llrs  # [T, B, n]

    return fn


class NeuralMinSumDecoder(Decoder):
    """Min-sum decoder with learned per-iteration normalization/offset.

    Construct, ``train()``, then decode — the trained schedule is baked
    into a standard production decode (early exit, per-lane masks), so
    decode cost is identical to :class:`MinSumDecoder`.

    Args:
      H: parity-check matrix (dense, scipy.sparse, or ``TannerGraph``).
      per: physical error rate (training samples are drawn at this rate
        unless ``train(per=...)`` overrides it).
      max_iters: decode iterations == number of trained (alpha, beta)
        pairs.
      learn: "both" (default), "alpha" (normalized min-sum), or "beta"
        (offset min-sum) — which schedule parameters receive gradients.
      param_scope: "iteration" (default — 2*T scalars) or "edge" (adds
        Nachmani-style per-edge variable-update weights, T*max_dv*n
        parameters — helps most on structured/quantum codes whose
        trapping sets a uniform schedule cannot break).

    Example:

    >>> import numpy as np
    >>> from ldpcdecoders_tpu import NeuralMinSumDecoder, parity_check_matrix
    >>> H = parity_check_matrix(120, 6, 3, rng=0)
    >>> dec = NeuralMinSumDecoder(H, 0.05, 8)
    >>> _ = dec.train(steps=40, batch=64, seed=0)
    >>> float(dec.alpha.mean()) != 1.0   # parameters moved
    True
    """

    def __init__(self, H, per: float, max_iters: int, *, learn: str = "both",
                 param_scope: str = "iteration", dtype=jnp.float32):
        if learn not in ("both", "alpha", "beta"):
            raise ValueError(f"learn must be 'both', 'alpha', or 'beta', got {learn!r}")
        if param_scope not in ("iteration", "edge"):
            raise ValueError(
                f"param_scope must be 'iteration' or 'edge', got {param_scope!r}"
            )
        if isinstance(H, TannerGraph):
            self.graph = H
        elif hasattr(H, "tocoo"):
            coo = H.tocoo()
            self.graph = TannerGraph.from_edges(coo.row, coo.col, *H.shape)
        else:
            self.graph = TannerGraph.from_pcm(np.asarray(H))
        self.m, self.n = self.graph.m, self.graph.n
        self.per = float(per)
        self.max_iters = int(max_iters)
        self.learn = learn
        self.param_scope = param_scope
        self.dtype = dtype
        self.alpha = np.ones(self.max_iters, np.float32)
        self.beta = np.zeros(self.max_iters, np.float32)
        self.w = (
            np.ones((self.max_iters, self.graph.max_dv, self.n), np.float32)
            if param_scope == "edge" else None
        )
        self._soft_fn = make_soft_minsum_fn(self.graph, self.max_iters, dtype)
        self._syndrome_fn = make_syndrome_fn(self.graph)
        self._rebuild()

    def _rebuild(self):
        self._decode_fn = jax.jit(
            make_minsum_decode_fn(
                self.graph, self.per, self.max_iters,
                alpha=self.alpha, beta=self.beta, dtype=self.dtype,
                edge_weights=self.w,
            )
        )

    def train(self, *, steps: int = 300, batch: int = 256, lr: float = 2e-2,
              seed: int = 0, per: float | None = None,
              per_range: tuple[float, float] | None = None) -> dict:
        """Fit the (alpha, beta) schedule by Adam on fresh channel samples.

        Each step draws ``batch`` iid error patterns at ``per`` on
        device, unrolls the soft decoder, and minimizes the summed
        per-iteration sigmoid cross-entropy between the output LLRs and
        the injected errors.  Returns ``{"losses": [steps]}`` and bakes
        the trained schedule into the production decode.

        ``per_range=(lo, hi)`` trains a *robust* schedule instead: each
        lane draws its own noise level uniformly from the range (and the
        matching channel LLR), so one schedule serves a whole operating
        region — pair with ``batch_decode(per=...)`` at deploy time.
        """
        import optax

        n = self.n
        soft = self._soft_fn
        syndrome_from = self._syndrome_fn
        learn = self.learn
        if per_range is not None:
            lo, hi = (float(x) for x in per_range)
            if not 0.0 < lo <= hi < 0.5:
                raise ValueError(f"per_range must satisfy 0 < lo <= hi < 0.5, got {per_range}")
        else:
            per_t = self.per if per is None else float(per)
            L0_const = float(per_to_llr(per_t, 1))

        def loss_fn(params, key):
            if per_range is not None:
                k1, k2 = jax.random.split(key)
                p_lane = jax.random.uniform(
                    k1, (batch, 1), minval=lo, maxval=hi
                )
                e = (jax.random.uniform(k2, (batch, n)) < p_lane).astype(
                    jnp.float32
                )
                L0 = jnp.log((1.0 - p_lane) / p_lane) * jnp.ones((1, n))
            else:
                e = (jax.random.uniform(key, (batch, n)) < per_t).astype(
                    jnp.float32
                )
                L0 = L0_const
            syn = syndrome_from(e)
            llrs = soft(params, syn, L0)  # [T, B, n]
            # P(e_j = 1) = sigmoid(-llr); optax's sigmoid BCE takes logits
            logits = -llrs
            bce = optax.sigmoid_binary_cross_entropy(
                logits, jnp.broadcast_to(e, llrs.shape)
            )
            return jnp.mean(bce)

        params = {
            "alpha": jnp.asarray(self.alpha),
            "beta": jnp.asarray(self.beta),
        }
        if self.w is not None:
            params["w"] = jnp.asarray(self.w)
        tx = optax.adam(lr)
        opt_state = tx.init(params)
        frozen = {"both": (), "alpha": ("beta",), "beta": ("alpha",)}[learn]

        @jax.jit
        def step_fn(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            for name in frozen:
                grads[name] = jnp.zeros_like(grads[name])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # keep the schedule in the numerically sane region: alpha > 0,
            # beta >= 0 (a negative offset would *amplify* magnitudes)
            params["alpha"] = jnp.clip(params["alpha"], 1e-2, 2.0)
            params["beta"] = jnp.clip(params["beta"], 0.0, 5.0)
            if "w" in params:
                params["w"] = jnp.clip(params["w"], 0.0, 2.0)
            return params, opt_state, loss

        key = jax.random.PRNGKey(seed)
        losses = []
        for _ in range(int(steps)):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, sub)
            losses.append(float(loss))
        self.alpha = np.asarray(params["alpha"], np.float32)
        self.beta = np.asarray(params["beta"], np.float32)
        if "w" in params:
            self.w = np.asarray(params["w"], np.float32)
        self._rebuild()
        return {"losses": losses}

    def save_schedule(self, path: str) -> None:
        """Persist the trained (alpha, beta) schedule to npz — train once,
        deploy many (the schedule is code- and iteration-count-specific)."""
        extra = {"w": self.w} if self.w is not None else {}
        np.savez(
            path, alpha=self.alpha, beta=self.beta,
            max_iters=np.int64(self.max_iters),
            m=np.int64(self.m), n=np.int64(self.n), **extra,
        )

    def load_schedule(self, path: str) -> "NeuralMinSumDecoder":
        """Load a schedule saved by :meth:`save_schedule` into this decoder
        (shapes are validated against the code and iteration count)."""
        with np.load(path if path.endswith(".npz") else path + ".npz") as d:
            if (int(d["max_iters"]), int(d["m"]), int(d["n"])) != (
                self.max_iters, self.m, self.n
            ):
                raise ValueError(
                    f"schedule was trained for max_iters={int(d['max_iters'])} on an "
                    f"[{int(d['m'])}, {int(d['n'])}] code; this decoder is "
                    f"max_iters={self.max_iters} on [{self.m}, {self.n}]"
                )
            self.alpha = np.asarray(d["alpha"], np.float32)
            self.beta = np.asarray(d["beta"], np.float32)
            if "w" in d.files:
                self.w = np.asarray(d["w"], np.float32)
            elif self.w is not None:
                raise ValueError(
                    "schedule has no per-edge weights but this decoder was "
                    "built with param_scope='edge'"
                )
        self._rebuild()
        return self

    def _decode_batch(self, syndromes, seed: int = 0, per=None):
        arg = None
        if per is not None:
            arg = jnp.asarray(per_to_llr(per, self.n), jnp.float32)
        err, converged, iters, llrs = self._decode_fn(syndromes, arg)
        return err, converged, iters, {"llrs": llrs}
