#!/usr/bin/env bash
# Source this to set up a TPU training environment for dinox_tpu — the
# TPU-native analog of the reference's accelerator env scripts
# (reference: scripts/rocm_env.sh, scripts/setup_rocm_8060s.sh). Where those
# wire ROCm userland libraries into torch wheels, a TPU host only needs a
# few JAX knobs.
#
# Usage:
#   source scripts/tpu_env.sh            # TPU (default)
#   source scripts/tpu_env.sh cpu        # CPU with an 8-device virtual mesh
#   source scripts/tpu_env.sh cpu 32     # CPU with a 32-device virtual mesh

_mode="${1:-tpu}"

# Persistent XLA compilation cache: the first jit of a full train step is a
# multi-minute remote compile on some setups; the cache makes reruns instant.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/dinox_jax}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

case "$_mode" in
  tpu)
    # Let the installed TPU plugin register itself; do not pin JAX_PLATFORMS
    # so hosts with site-registered backends keep working.
    unset JAX_PLATFORMS 2>/dev/null || true
    # Async dispatch + donation do the heavy lifting; no extra flags needed.
    ;;
  cpu)
    # Virtual multi-device CPU mesh — the fake-backend substitute for a pod
    # (SURVEY.md §4): sharding/TP/multi-host code paths run without chips.
    _n="${2:-8}"
    export JAX_PLATFORMS=cpu
    _rest=$(echo "${XLA_FLAGS:-}" | tr ' ' '\n' \
      | grep -v xla_force_host_platform_device_count | tr '\n' ' ')
    export XLA_FLAGS="${_rest}--xla_force_host_platform_device_count=${_n}"
    ;;
  *)
    echo "usage: source scripts/tpu_env.sh [tpu|cpu [n_devices]]" >&2
    return 2 2>/dev/null || exit 2
    ;;
esac

# Unbuffered logs so `key=value` progress lines stream through pipes/tmux.
export PYTHONUNBUFFERED=1

echo "dinox_tpu env: mode=${_mode} cache=${JAX_COMPILATION_CACHE_DIR}" \
     "${XLA_FLAGS:+XLA_FLAGS=${XLA_FLAGS}}"
unset _mode _n _rest
