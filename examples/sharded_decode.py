"""Data-parallel decoding over every visible device.

Run on a multi-chip host (or simulate):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/sharded_decode.py
"""

import numpy as np
import jax

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.parallel import make_mesh, decode_with_stats

print("devices:", jax.devices())
H = lt.parity_check_matrix(1000, 10, 9, rng=42)
rng = np.random.default_rng(0)
B = 1024 - 1024 % len(jax.devices())
errors = rng.random((B, 1000)) < 0.01
syndromes = (errors @ H.T) % 2

dec = lt.MinSumDecoder(H, 0.01, 100)
mesh = make_mesh()
guesses, converged, stats = decode_with_stats(dec, syndromes, mesh)
print("global stats:", stats)
print("exact recovery:", (guesses.astype(bool) == errors).all(axis=1).mean())
