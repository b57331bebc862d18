"""Decode toric-code syndromes with BP-OTS and BP+OSD.

Run:  python examples/decode_toric_code.py
"""

import numpy as np

import ldpcdecoders_tpu as lt

d = 5
Hx = lt.toric_code_x(d)
print(f"toric d={d}: {Hx.shape[1]} qubits, {Hx.shape[0]} X-stabilizers")

rng = np.random.default_rng(0)
B = 512
per = 0.03
errors = rng.random((B, Hx.shape[1])) < per
syndromes = (errors @ Hx.T) % 2

for name, dec in {
    "BP-OTS": lt.BPOTSDecoder(Hx, per, 50, T=9, C=3.0),
    "BP+OSD": lt.BeliefPropagationOSDDecoder(Hx, per, 50),
}.items():
    guesses, converged = dec.batch_decode(syndromes)
    synhat = (guesses.astype(int) @ Hx.T) % 2
    match = (synhat == syndromes).all(axis=1).mean()
    print(f"{name}: converged {converged.mean():.1%}, syndrome-match {match:.1%}")
