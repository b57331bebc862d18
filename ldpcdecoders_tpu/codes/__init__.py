from .gallager import parity_check_matrix, save_pcm, load_pcm
from .graph import TannerGraph
from .css import (
    toric_code_x,
    toric_code_z,
    surface_code_x,
    surface_code_z,
    repetition_code,
    cycle_matrix,
    hamming_code,
    hypergraph_product,
    hypergraph_product_edges,
)

__all__ = [
    "parity_check_matrix",
    "save_pcm",
    "load_pcm",
    "TannerGraph",
    "toric_code_x",
    "toric_code_z",
    "surface_code_x",
    "surface_code_z",
    "repetition_code",
    "cycle_matrix",
    "hamming_code",
    "hypergraph_product",
    "hypergraph_product_edges",
]
