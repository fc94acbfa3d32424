"""Persistent XLA compilation cache.

First compiles through the remote-TPU tunnel cost minutes; enabling JAX's
persistent cache makes every later process reuse them from disk.  Called by
bench.py and the app entry points; the cache lives inside the repo by
default so driver re-runs stay warm.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default: <repo>/.jax_cache).

    TPU/axon only: on this environment CPU executables can be AOT-compiled
    on the remote compile service whose host has different CPU features
    (AMX/prefer-no-gather); loading such a cached CPU executable on the
    local 2-core host SIGILLs/segfaults (observed killing the test suite
    mid-run).  CPU compiles are cheap anyway, so the persistent cache is
    reserved for the backend that needs it.

    NOTE: when the platform is ambiguous this falls through to
    ``jax.default_backend()``, which force-initializes the JAX backend —
    in multi-process setups call this AFTER ``jax.distributed.initialize``
    (all current call sites do).  When JAX_PLATFORMS / the jax_platforms
    config already names a CPU-only platform the function returns without
    touching the backend (ADVICE r4)."""
    import jax

    # Non-initializing early exit: if the platform is already pinned to CPU
    # there is nothing to do, and we must not force backend init (which
    # would break a later jax.distributed.initialize).
    platforms = (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
    ).lower()
    if platforms and not ({"tpu", "axon"} & set(platforms.split(","))):
        return ""

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend not in ("tpu", "axon"):
        return ""

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
