"""Decoding under measurement noise: space-time + streaming windows.

Real experiments measure the stabilizers repeatedly, and each readout
can itself be wrong.  This example simulates R noisy measurement
rounds of the toric code (phenomenological model: fresh data errors at
rate ``per`` per round, readout flips at rate ``q``), then decodes the
same histories three ways:

  1. measurement-blind — pretend the last noisy round is perfect
     (what the single-shot decoders can do);
  2. joint space-time — `SpaceTimeDecoder`, the full-history optimum;
  3. streaming — `SlidingWindowDecoder`, the real-time variant that
     commits corrections window by window without waiting for the end.

Run:  python examples/spacetime_streaming.py
"""

import numpy as np

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.utils.metrics import gf2_rowspan_reducer
from ldpcdecoders_tpu.utils.noise import sample_errors, syndromes_of

Hx, Hz = lt.toric_code_x(3), lt.toric_code_z(3)
m, n = Hx.shape
R, per, B = 9, 0.015, 512
rng = np.random.default_rng(0)

# simulate: fresh errors accumulate; each round's readout is noisy,
# the final round is read out perfectly (closes the decoding problem)
e = sample_errors(rng, B * R, n, per).reshape(B, R, n)
cum = (np.cumsum(e, axis=1) & 1).astype(np.uint8)
syn = np.stack([syndromes_of(Hx, cum[:, r]) for r in range(R)], axis=1)
u = sample_errors(rng, B * R, m, per).reshape(B, R, m)
u[:, -1] = 0
syn = (syn ^ u.astype(np.uint8)).astype(np.uint8)
e_final = cum[:, -1]

span = gf2_rowspan_reducer(Hz)  # degeneracy-aware failure accounting


def logical_failures(e_hat):
    return int((~span(e_final ^ np.asarray(e_hat, np.uint8))).sum())


blind = lt.BeliefPropagationOSDDecoder(Hx, per, 60)
e_blind, _ = blind.batch_decode(syn[:, -2])  # last *noisy* round

full = lt.SpaceTimeDecoder(Hx, R, per, max_iters=60)
e_full, conv = full.decode_history(syn)

stream = lt.SlidingWindowDecoder(Hx, per, max_iters=60, window=4, commit=2)
e_stream, info = stream.decode_stream(syn)

print(f"shots={B}  rounds={R}  per=q={per}")
print(f"measurement-blind logical failures: {logical_failures(e_blind)}")
print(f"space-time (full history):          {logical_failures(e_full)}")
print(f"sliding window (W=4, C=2):          {logical_failures(e_stream)} "
      f"({info['windows']} window decodes)")
