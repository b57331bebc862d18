"""Tracing / profiling helpers (SURVEY.md §5 tracing plan).

Thin wrappers over ``jax.profiler`` so harness code can annotate decode
phases and capture Perfetto traces without importing profiler internals
everywhere.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a device trace to ``log_dir`` (viewable in Perfetto /
    TensorBoard).  ``None`` disables tracing (no-op)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Context manager labeling a host-side region in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
