from .gallager import parity_check_matrix, save_pcm, load_pcm
from .graph import TannerGraph
from .qc import (
    qc_lift,
    qc_lift_edges,
    random_qc_base_matrix,
    save_base_matrix,
    load_base_matrix,
)
from .bicycle import (
    bb_poly_matrix,
    bivariate_bicycle_code,
    css_code_k,
    named_bicycle_code,
    BICYCLE_CODES,
)
from .spacetime import spacetime_pcm, spacetime_prior, detectors_of
from .circuit import (
    StabilizerCircuit,
    css_memory_circuit,
    circuit_dem,
    dem_text,
    sample_circuit,
)
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
    "qc_lift",
    "qc_lift_edges",
    "random_qc_base_matrix",
    "save_base_matrix",
    "load_base_matrix",
    "bb_poly_matrix",
    "bivariate_bicycle_code",
    "css_code_k",
    "named_bicycle_code",
    "BICYCLE_CODES",
    "toric_code_x",
    "toric_code_z",
    "surface_code_x",
    "surface_code_z",
    "repetition_code",
    "cycle_matrix",
    "hamming_code",
    "StabilizerCircuit",
    "css_memory_circuit",
    "circuit_dem",
    "dem_text",
    "sample_circuit",
    "spacetime_pcm",
    "spacetime_prior",
    "detectors_of",
    "hypergraph_product",
    "hypergraph_product_edges",
]
