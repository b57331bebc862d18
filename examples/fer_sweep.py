"""Checkpointed FER sweep over physical error rates.

Run:  python examples/fer_sweep.py
Interrupt and re-run: it resumes from fer_sweep_ck.json and reproduces
the uninterrupted trial stream exactly.
"""

import json

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.harness import FERSweep

H = lt.parity_check_matrix(1000, 10, 9, rng=42)
sweep = FERSweep(
    H,
    lambda per: lt.BeliefPropagationOSDDecoder(H, per, 100),
    pers=[0.005, 0.01, 0.02, 0.04],
    batch=1024,
    checkpoint_path="fer_sweep_ck.json",
    seed=0,
)
results = sweep.run(trials_per_point=4096)
print(json.dumps({str(k): v for k, v in results.items()}, indent=2))
