"""Persistent XLA compilation cache helper.

Over the remote-compile TPU tunnel a single decoder program costs minutes
to compile; the persistent cache amortizes this across processes.  Not
enabled implicitly — call :func:`enable_compilation_cache` early (before
the first jit), as bench.py and the CLI do.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Defaults to ``$LDPC_JAX_CACHE`` or ``~/.cache/ldpcdecoders_tpu/xla``.
    Returns the directory used, or None if configuration failed (older
    JAX, read-only filesystem, ...).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "LDPC_JAX_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "ldpcdecoders_tpu",
                "xla",
            ),
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
