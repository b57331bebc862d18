from .noise import (
    sample_errors,
    syndromes_of,
    syndromes_from_edges,
    sample_errors_device,
    sample_mixed_channel,
)
from .metrics import (
    exact_recovery_ler,
    syndrome_match_rate,
    wilson_interval,
    gf2_rowspan_reducer,
    gf2_kernel_basis,
    logical_failure_rate,
)
from .io import (
    save_code_npz,
    load_code_npz,
    save_graph_npz,
    load_graph_npz,
    atomic_write_json,
    read_json,
)
from .debug import validate_inputs, check_decode_invariants
from .profiling import trace, annotate

__all__ = [
    "sample_errors",
    "syndromes_of",
    "syndromes_from_edges",
    "sample_errors_device",
    "exact_recovery_ler",
    "syndrome_match_rate",
    "wilson_interval",
    "gf2_rowspan_reducer",
    "gf2_kernel_basis",
    "logical_failure_rate",
    "save_code_npz",
    "load_code_npz",
    "save_graph_npz",
    "load_graph_npz",
    "atomic_write_json",
    "read_json",
    "validate_inputs",
    "check_decode_invariants",
    "trace",
    "annotate",
]
