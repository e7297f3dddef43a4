#!/usr/bin/env python
"""Batch-size sweep of the headline ViT-S train step, with per-category
trace diffing — chases the round-3 open question "bs128 > bs256 on one v5e,
why?" (docs/PROFILING.md round-2 lever list; round-3 VERDICT weak #3).

For each batch size: slices/s + MFU on the real chip. With ``--profile``,
additionally captures a jax.profiler trace per batch size and prints the
hlo_category ms/step table normalized *per slice*, so the category whose
per-slice cost grows with batch is the answer.

    python scripts/bench_batch_sweep.py --batch-sizes 64 128 256 \
        --profile --out docs/round4/batch_sweep.json
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
    p.add_argument("--batch-sizes", type=int, nargs="+",
                   default=[64, 96, 128, 192, 256])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--config", default="vit-small")
    p.add_argument("--remat", action="store_true",
                   help="per-block rematerialization (use_grad_checkpoint) — "
                        "sweep batch x remat at L/G scale")
    p.add_argument("--factored-nu", action="store_true",
                   help="factored second moment (required to fit ViT-G "
                        "optimizer state on one 16 GB chip)")
    p.add_argument("--mu-dtype", default="float32")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="bench-only; 3e-5 for vit-giant (collapse otherwise)")
    p.add_argument("--profile", action="store_true",
                   help="capture a trace per batch size and diff categories")
    p.add_argument("--profile-steps", type=int, default=4)
    p.add_argument("--trace-root", type=Path, default=Path("/tmp/bs_sweep_traces"))
    p.add_argument("--out", type=Path, default=None)
    return p.parse_args(argv)


def bench_one(config: str, batch_size: int, steps: int, warmup: int,
              profile_dir: Path | None, profile_steps: int,
              remat: bool = False, factored_nu: bool = False,
              mu_dtype: str = "float32", lr: float = 1e-4) -> dict:
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step
    from dinox_tpu.utils.flops import mfu

    cfg = TrainConfig(
        model=MODEL_CONFIGS[config].replace(
            scale_aware=True, attn_impl="pallas", gelu_approx=True,
            use_grad_checkpoint=remat),
        batch_size=batch_size,
        koleo_weight=0.1,
        warmup_steps=100,
        max_steps=5000,
        lr=lr,
        factored_nu=factored_nu,
        mu_dtype=mu_dtype,
    )
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

    row = {
        "batch_size": batch_size,
        "remat": remat,
        "ms_per_step": round(dt * 1e3, 2),
        "slices_per_s": round(batch_size / dt, 1),
        "mfu": round(mfu(batch_size / dt, MODEL_CONFIGS[config]), 3),
    }

    if profile_dir is not None:
        from dinox_tpu.utils.trace_analysis import summarize_trace_dir

        jax.profiler.start_trace(str(profile_dir))
        for _ in range(profile_steps):
            state, metrics = step_fn(state, pixels, spacing)
        jax.block_until_ready(metrics["loss"])
        jax.profiler.stop_trace()
        summary = summarize_trace_dir(profile_dir, steps=profile_steps)
        row["categories_ms_per_step"] = {
            k: round(v["ms_per_step"], 3) for k, v in summary["categories"].items()
        }
    return row


def main(argv=None) -> int:
    args = parse_args(argv)
    results = []
    for bs in args.batch_sizes:
        pdir = (args.trace_root / f"bs{bs}") if args.profile else None
        if pdir is not None:
            pdir.mkdir(parents=True, exist_ok=True)
        try:
            row = bench_one(args.config, bs, args.steps, args.warmup,
                            pdir, args.profile_steps, remat=args.remat,
                            factored_nu=args.factored_nu,
                            mu_dtype=args.mu_dtype, lr=args.lr)
        except Exception as e:
            row = {"batch_size": bs, "status": f"{type(e).__name__}: {e}"}
            print(f"# bs{bs} failed: {row['status']}", file=sys.stderr)
            results.append(row)
            continue
        results.append(row)
        print(f"# bs={bs}: {row['slices_per_s']} slices/s "
              f"({row['ms_per_step']} ms/step, mfu {row['mfu']})", file=sys.stderr)

    ok = [r for r in results if "slices_per_s" in r]
    if args.profile and len(ok) >= 2:
        # per-SLICE µs by category: the category that grows with batch size
        # is what breaks large-batch scaling.
        cats = sorted({c for r in ok for c in r.get("categories_ms_per_step", {})})
        print(f"\n# per-slice µs by hlo_category "
              f"(columns: bs {[r['batch_size'] for r in ok]})", file=sys.stderr)
        for c in cats:
            vals = [r["categories_ms_per_step"].get(c, 0.0) * 1e3 / r["batch_size"]
                    for r in ok]
            print(f"# {c:<28} " + " ".join(f"{v:>8.1f}" for v in vals),
                  file=sys.stderr)

    best = max(ok, key=lambda r: r["slices_per_s"]) if ok else None
    payload = {"results": results, "best": best}
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(best or {"status": "all failed"}))
    return 0 if best else 1


if __name__ == "__main__":
    raise SystemExit(main())
