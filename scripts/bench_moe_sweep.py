#!/usr/bin/env python
"""MoE efficiency sweep: capacity_factor x experts at fixed batch, with the
MoE-aware MFU denominator (round-5, VERDICT r4 #4).

Each point runs the REAL train step (student+teacher, DINO losses, backward,
AdamW, EMA) on synthetic device batches and reports slices/s plus MFU
computed with the dense-dispatch FLOPs model (utils/flops.py:
router + dispatch/combine einsums + expert FFN per MoE block).

    python scripts/bench_moe_sweep.py --experts 4 8 \
        --capacity-factors 1.0 1.25 2.0 --batch-size 96 \
        --out docs/round5/moe_sweep.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experts", type=int, nargs="+", default=[4, 8])
    p.add_argument("--capacity-factors", type=float, nargs="+",
                   default=[1.0, 1.25, 2.0])
    p.add_argument("--batch-size", type=int, default=96)
    p.add_argument("--moe-every", type=int, default=2)
    p.add_argument("--config", default="vit-small")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--out", type=Path, default=None)
    return p.parse_args(argv)


def bench_point(config: str, batch_size: int, experts: int, cf: float,
                moe_every: int, steps: int, warmup: int) -> dict:
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step
    from dinox_tpu.utils.flops import mfu, train_flops_per_slice

    mcfg = MODEL_CONFIGS[config].replace(
        scale_aware=True, attn_impl="pallas", gelu_approx=True,
        moe_experts=experts, moe_every=moe_every, moe_capacity_factor=cf)
    cfg = TrainConfig(model=mcfg, batch_size=batch_size, koleo_weight=0.1,
                      warmup_steps=100, max_steps=5000)
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    pixels = jax.device_put(
        rng.integers(25000, 41000, (1, batch_size, 512, 512, 3)).astype(np.uint16))
    spacing = jax.device_put(
        rng.uniform(0.4, 3.0, (1, batch_size, 3)).astype(np.float32))

    for _ in range(warmup):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, pixels, spacing)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(float(metrics["loss"]))
    rate = batch_size / dt
    return {
        "experts": experts,
        "capacity_factor": cf,
        "batch_size": batch_size,
        "ms_per_step": round(dt * 1e3, 2),
        "slices_per_s": round(rate, 1),
        "mfu": round(mfu(rate, mcfg), 3),
        "tflops_per_slice": round(train_flops_per_slice(mcfg) / 1e12, 4),
    }


def main(argv=None) -> int:
    args = parse_args(argv)
    results = []
    for e in args.experts:
        for cf in args.capacity_factors:
            try:
                row = bench_point(args.config, args.batch_size, e, cf,
                                  args.moe_every, args.steps, args.warmup)
            except Exception as exc:
                row = {"experts": e, "capacity_factor": cf,
                       "status": f"{type(exc).__name__}: {exc}"}
                print(f"# E{e}/cf{cf} failed: {row['status']}", file=sys.stderr)
                results.append(row)
                continue
            results.append(row)
            print(f"# E{e}/cf{cf}: {row['slices_per_s']} slices/s "
                  f"(mfu {row['mfu']}, {row['tflops_per_slice']} TF/slice)",
                  file=sys.stderr)
    ok = [r for r in results if "slices_per_s" in r]
    best = max(ok, key=lambda r: r["mfu"]) if ok else None
    payload = {"results": results, "best_mfu": best}
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(best or {"status": "all failed"}))
    return 0 if best else 1


if __name__ == "__main__":
    raise SystemExit(main())
