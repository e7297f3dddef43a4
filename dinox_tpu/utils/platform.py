"""Backend selection helper.

The session's sitecustomize registers the TPU ("axon") plugin at interpreter
start and forces it as the default platform, which silently overrides a
``JAX_PLATFORMS=cpu`` environment variable. Every CLI entry point calls
:func:`respect_jax_platforms_env` first so the conventional env-var contract
works (needed by the integration canary's CPU subprocess runs and by tests).
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backends already initialized; leave as-is


def enable_compilation_cache(path: str = "~/.cache/dinox_jax") -> None:
    """Persistent XLA compilation cache: the full train step takes minutes to
    compile (remote-compiled on this TPU setup); caching makes restarts and
    resume cheap. Safe no-op when unsupported."""
    import jax

    try:
        cache_dir = os.path.expanduser(os.environ.get("DINOX_JAX_CACHE", path))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
