"""Tensor-parallel decoding of a large sparse hypergraph-product code.

The check axis of the Tanner graph is sharded over the 'model' mesh axis
(one psum per BP iteration); the graph is compiled from COO edge lists
and never materializes a dense parity-check matrix.

Run (simulated 8-device mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/tensor_parallel_hgp.py
"""

import numpy as np
import jax

import ldpcdecoders_tpu as lt
from ldpcdecoders_tpu.codes import hypergraph_product_edges
from ldpcdecoders_tpu.parallel import make_mesh, make_check_sharded_minsum_fn
import scipy.sparse as sp

print("devices:", jax.devices())

# ~112k-qubit quantum LDPC code from a (150, 300) classical seed
H1 = lt.parity_check_matrix(300, 6, 3, rng=7)
hx, _ = hypergraph_product_edges(H1, H1)
rows, cols, m, n = hx
graph = lt.TannerGraph.from_edges(rows, cols, m, n)
print(f"HGP code: {n:,} qubits, {m:,} X-checks, {graph.n_edges:,} edges "
      f"(dense H would be {m * n / 1e9:.1f} GB; graph.H is {graph.H})")

# sparse only for syndrome generation in this demo
Hx = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(m, n)).tocsr()
rng = np.random.default_rng(0)
B = 8
errors = np.zeros((B, n), np.int8)
for b in range(B):
    errors[b, rng.choice(n, size=6, replace=False)] = 1
syndromes = np.asarray((Hx @ errors.T).T % 2, np.int8)

n_dev = len(jax.devices())
mesh = make_mesh(n_dev, axis_names=("data", "model"), shape=(1, n_dev))
decode = make_check_sharded_minsum_fn(graph, 0.001, 30, mesh)
err, conv, iters = (np.asarray(x) for x in decode(syndromes))
synhat = np.asarray((Hx @ err.astype(np.int8).T).T % 2)
print(f"converged {conv.mean():.0%}, mean iters {iters.mean():.1f}, "
      f"syndrome-match {(synhat == syndromes).all(axis=1).mean():.0%}")
