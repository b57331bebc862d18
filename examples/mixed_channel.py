"""Decode a mixed erasure + bit-flip channel (heralded loss + noise).

Run:  python examples/mixed_channel.py
"""

import numpy as np

import ldpcdecoders_tpu as lt

H = lt.parity_check_matrix(1200, 6, 3, rng=0)
n = H.shape[1]
rng = np.random.default_rng(1)

B = 512
p_erase, p_flip = 0.10, 0.01
erasures = rng.random((B, n)) < p_erase          # known locations (heralded)
errors = np.where(
    erasures,
    rng.random((B, n)) < 0.5,                    # erased bits: unknown value
    rng.random((B, n)) < p_flip,                 # the rest: ordinary flips
)
syndromes = (errors @ H.T) % 2

# one compiled program: peel -> cond-gated prior-BP -> cond-gated OSD
dec = lt.MixedChannelDecoder(H, p_flip, max_iters=60, osd_order=0)
err, ok, peel_rounds, bp_iters = dec.batch_decode_detailed(syndromes, erasures)
exact = (err.astype(bool) == errors).all(axis=1)
print(
    f"mixed channel (eps={p_erase}, p={p_flip}): ok {ok.mean():.1%}, "
    f"exact {exact.mean():.1%}, peel depth {peel_rounds.max()}, "
    f"BP iters {bp_iters}"
)

# erasure-only batch: peeling closes everything, the BP branch never runs
erasures2 = rng.random((B, n)) < 0.05
errors2 = np.where(erasures2, rng.random((B, n)) < 0.5, False)
syndromes2 = (errors2 @ H.T) % 2
err2, ok2, _, bp_iters2 = dec.batch_decode_detailed(syndromes2, erasures2)
print(
    f"erasure-only (eps=0.05): ok {ok2.mean():.1%}, BP iters {bp_iters2} "
    f"(0 = the cond-gated BP stage was skipped)"
)
