#!/usr/bin/env python
"""Headline benchmark: ViT-S scale-aware DINO pretrain slices/sec on one chip.

Runs the REAL training step (fused device augmentation, student+teacher
forwards over the 2-view concat batch, DINO+Gram+KoLeo, backward, AdamW,
teacher EMA) on synthetic 512x512 uint16 batches, and prints ONE JSON line:

    {"metric": "vit_s_pretrain_slices_per_sec", "value": N, "unit":
     "slices/s", "vs_baseline": N/159}

Baseline 159 slices/s = the reference's RTX 3090 Ti ViT-S two-organ MVP
throughput (BASELINE.md; target >= 3x = 480 slices/s on one v5e chip).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from dinox_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

BASELINE_SLICES_PER_S = 159.0  # RTX 3090 Ti, docs/EXPERIMENTS.md:531-533


def bench_train_step(batch_size: int, steps: int = 20, warmup: int = 5) -> float:
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step

    cfg = TrainConfig(
        model=MODEL_CONFIGS["vit-small"].replace(scale_aware=True, attn_impl="pallas"),
        batch_size=batch_size,
        koleo_weight=0.1,
        warmup_steps=100,
        max_steps=5000,
    )
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    pixels = jax.device_put(
        rng.integers(25000, 41000, (1, batch_size, 512, 512, 3)).astype(np.uint16)
    )
    spacing = jax.device_put(rng.uniform(0.4, 3.0, (1, batch_size, 3)).astype(np.float32))

    for _ in range(warmup):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(float(metrics["loss"])), "bench produced non-finite loss"
    return batch_size / dt


def main() -> int:
    best = 0.0
    for bs in (128,):  # sweep showed bs128 > bs256 on one v5e chip
        try:
            rate = bench_train_step(bs)
        except Exception as e:  # OOM at larger batch: keep the best smaller one
            print(f"# batch {bs} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(f"# batch={bs}: {rate:.1f} slices/s", file=sys.stderr)
        best = max(best, rate)
    print(
        json.dumps(
            {
                "metric": "vit_s_pretrain_slices_per_sec",
                "value": round(best, 1),
                "unit": "slices/s",
                "vs_baseline": round(best / BASELINE_SLICES_PER_S, 2),
            }
        )
    )
    return 0 if best > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
