"""Hardware detection and per-device tuning presets.

TPU-world analog of the reference's per-GPU presets (scripts/
phase5_big_run.py:313-357): inspect the JAX backend and device kind, and
recommend loader workers / batch size. Numbers for v5e come from this repo's
own throughput sweeps (bench.py / tune_throughput.py)."""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class HardwareConfig:
    backend: str  # "tpu" | "cpu" | "gpu"
    device_kind: str
    num_devices: int
    num_hosts: int
    host_cpus: int
    num_workers: int
    batch_size_recommendation: int


def detect_hardware() -> HardwareConfig:
    import jax

    backend = jax.default_backend()
    devices = jax.devices()
    kind = devices[0].device_kind if devices else "unknown"
    cpus = os.cpu_count() or 1
    workers = max(2, min(16, cpus - 1))

    if backend == "tpu":
        kind_l = kind.lower()
        if "v5" in kind_l and "lite" in kind_l:  # v5e
            batch = 128  # sweep: bs128 beats bs256 on one chip
        elif "v4" in kind_l or "v5" in kind_l or "v6" in kind_l:
            batch = 256
        else:
            batch = 64
    elif backend == "gpu":
        batch = 64
    else:
        batch = 8

    return HardwareConfig(
        backend=backend,
        device_kind=kind,
        num_devices=len(devices),
        num_hosts=jax.process_count(),
        host_cpus=cpus,
        num_workers=workers,
        batch_size_recommendation=batch,
    )
