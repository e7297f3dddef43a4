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
        # Namespace by host-CPU fingerprint: the home directory (and so this
        # cache) survives VM migrations across heterogeneous hosts, and
        # XLA:CPU AOT entries compiled for another machine's ISA extensions
        # load with "could lead to SIGILL" warnings and wildly asymmetric
        # validate/recompile times — which desynchronized a 2-process run
        # past the 30 s Gloo rendezvous deadline (Connect timeout at the
        # first train-step dispatch). Per-fingerprint subdirs make foreign
        # entries invisible instead of slow-and-dangerous.
        cache_dir = os.path.join(cache_dir, _host_fingerprint())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def _host_fingerprint() -> str:
    """Short stable hash of the host CPU's ISA surface."""
    import hashlib
    import platform as _pf

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_pf.machine()}|{flags}"
    return "host-" + hashlib.sha1(raw.encode()).hexdigest()[:12]
