#!/usr/bin/env python
"""ViT-Large / ViT-Giant single-chip train-step benchmark.

Proves the big presets compile and train on the TPU and records img/s against
the reference's published numbers (reference docs/throughput_tuning.md §2-3:
ViT-L 23.5 img/s at bs64 x accum4 grad-ckpt; ViT-G 5.4 img/s at bs32 x accum8),
using the same real train step bench.py times for ViT-S.

Usage: python scripts/bench_scale.py [--config vit-large] [--batch-size 32]
       [--accum 1] [--steps 10] [--img-size 224] [--mu-dtype float32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import enable_compilation_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_compilation_cache()

import jax
import numpy as np

REFERENCE_IMG_S = {"vit-large": 23.5, "vit-giant": 5.4}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="vit-large", choices=["vit-large", "vit-giant"])
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--mu-dtype", default="float32")
    p.add_argument("--nu-dtype", default="float32")
    p.add_argument("--attn-impl", default="pallas")
    args = p.parse_args(argv)

    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step

    cfg = TrainConfig(
        model=MODEL_CONFIGS[args.config].replace(
            scale_aware=True, attn_impl=args.attn_impl, use_grad_checkpoint=True,
        ),
        img_size=args.img_size,
        batch_size=args.batch_size,
        accumulation_steps=args.accum,
        koleo_weight=0.1,
        warmup_steps=100,
        max_steps=5000,
        mu_dtype=args.mu_dtype,
        nu_dtype=args.nu_dtype,
    )
    print(f"{args.config}: ~{cfg.model.params_millions:.0f}M params, "
          f"bs={args.batch_size}x{args.accum}, remat=on, mu_dtype={args.mu_dtype}",
          flush=True)

    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    pixels = jax.device_put(
        rng.integers(25000, 41000,
                     (args.accum, args.batch_size, args.canvas, args.canvas, 3)
                     ).astype(np.uint16)
    )
    spacing = jax.device_put(
        rng.uniform(0.4, 3.0, (args.accum, args.batch_size, 3)).astype(np.float32)
    )

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+warmup: {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    img_s = cfg.effective_batch_size / dt
    ref = REFERENCE_IMG_S[args.config]

    from dinox_tpu.utils.flops import mfu

    print(json.dumps({
        "metric": f"{args.config.replace('-', '_')}_pretrain_img_per_sec",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / ref, 2),
        "step_ms": round(dt * 1000, 1),
        "mfu": round(mfu(img_s, cfg.model.replace(img_size=args.img_size)), 3),
        "loss": round(loss, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
