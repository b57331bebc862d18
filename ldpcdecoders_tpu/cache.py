"""Persistent XLA compilation cache helper.

Over the remote-compile TPU tunnel a single decoder program costs minutes
to compile; the persistent cache amortizes this across processes.
The first decode through the base API or the parallel helpers enables it
automatically (opt out with ``LDPC_JAX_CACHE=off``);
:func:`enable_compilation_cache` remains the explicit entry point for a
custom directory.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_configured = False


def _machine_signature() -> str:
    """Short host signature folded into the default cache directory.

    XLA's persistent-cache key does not cover host CPU features, so an
    XLA:CPU AOT executable compiled on a machine with e.g.
    ``+prefer-no-gather`` can be loaded on one without it — XLA warns
    "could lead to SIGILL" (observed in the round-2 multichip dryrun
    tail).  Keying the directory on (jaxlib version, arch, CPU-flags
    hash) makes each machine type use its own cache, eliminating the
    cross-host load entirely.
    """
    import hashlib
    import platform

    try:
        import jaxlib

        ver = getattr(jaxlib, "__version__", "unknown")
    except Exception:
        ver = "unknown"
    feats = ""
    try:  # Linux: the CPU feature flags line is the authoritative list
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    h = hashlib.sha256(feats.encode()).hexdigest()[:12]
    return f"{ver}-{platform.machine()}-{h}"


def ensure_default_cache() -> None:
    """Idempotently enable the persistent cache with default settings.

    Called from ``Decoder._call_decode`` (the first decode through the
    base API) and the ``parallel`` entry points, so every user benefits
    from cached TPU compiles without extra setup.  Skipped when
    ``LDPC_JAX_CACHE`` is ``0``/``off``/``none`` or when the application
    already configured ``jax_compilation_cache_dir`` itself.
    """
    global _configured
    if _configured:
        return
    _configured = True
    env = os.environ.get("LDPC_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # respect an application-level configuration
        if not env and jax.default_backend() == "cpu":
            # CPU compiles are seconds, and XLA:CPU's AOT loader warns
            # ("could lead to SIGILL") whenever it reloads a cached
            # executable, because compile-side tuning flags like
            # +prefer-no-gather are never listed as host features —
            # even on the very machine that compiled it.  The cache
            # only pays for itself over the remote TPU tunnel, so the
            # auto-enable path skips CPU; set LDPC_JAX_CACHE to a
            # directory to force it.
            return
    except Exception:
        return
    enable_compilation_cache()


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Defaults to ``$LDPC_JAX_CACHE`` or
    ``~/.cache/ldpcdecoders_tpu/xla/<machine-signature>`` — the per-host
    leaf (see :func:`_machine_signature`) keeps AOT executables from
    crossing machine types.  An explicit ``cache_dir`` is used verbatim.
    The opt-out sentinels ``LDPC_JAX_CACHE=0|off|none`` disable caching
    here too (so CLI/bench entry points honor them) and return None.
    Returns the directory used, or None if disabled or configuration
    failed (older JAX, read-only filesystem, ...).
    """
    import jax

    if cache_dir is None:
        env = os.environ.get("LDPC_JAX_CACHE")
        if env is not None and env.lower() in ("", "0", "off", "none"):
            return None  # explicit opt-out beats the explicit entry point
        cache_dir = env or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ldpcdecoders_tpu",
            "xla",
            _machine_signature(),
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
