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


def bench_train_step(batch_size: int, steps: int = 20, warmup: int = 5,
                     gelu_approx: bool = False, fused_attn: bool = False,
                     moe_experts: int = 0) -> float:
    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.train.state import TrainConfig, create_train_state
    from dinox_tpu.train.step import build_train_step

    cfg = TrainConfig(
        model=MODEL_CONFIGS["vit-small"].replace(
            scale_aware=True, attn_impl="pallas", gelu_approx=gelu_approx,
            fused_attn=fused_attn, moe_experts=moe_experts),
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


def check_kernels() -> int:
    """Real-kernel regression gate: Pallas fwd+bwd vs XLA on the live chip
    (CI runs the kernels only in CPU interpret mode; this is the only place
    the Mosaic-compiled code is numerically checked). Run before benching."""
    import jax.numpy as jnp

    from dinox_tpu.ops.flash_attention import (
        _xla_sdpa,
        _xla_sdpa_packed,
        flash_attention,
        flash_attention_packed,
    )

    if jax.default_backend() == "cpu":
        print("# check: no TPU visible; kernels would run interpreted — FAIL",
              file=sys.stderr)
        return 1
    rng = np.random.default_rng(0)
    ok = True
    for b, n, dim, heads in ((8, 261, 384, 6), (2, 261, 1408, 16)):
        qkv = jax.device_put(
            rng.normal(size=(b, n, 3 * dim)).astype(np.float32)
        ).astype(jnp.bfloat16)
        f_p = jax.jit(lambda t, h=heads: flash_attention_packed(t, h))
        f_x = jax.jit(lambda t, h=heads: _xla_sdpa_packed(t, h))
        fwd_err = float(jnp.max(jnp.abs(
            f_p(qkv).astype(jnp.float32) - f_x(qkv).astype(jnp.float32))))
        g_p = jax.jit(jax.grad(lambda t, h=heads: jnp.sum(
            flash_attention_packed(t, h).astype(jnp.float32) ** 2)))
        g_x = jax.jit(jax.grad(lambda t, h=heads: jnp.sum(
            _xla_sdpa_packed(t, h).astype(jnp.float32) ** 2)))
        bwd_err = float(jnp.max(jnp.abs(
            g_p(qkv).astype(jnp.float32) - g_x(qkv).astype(jnp.float32))))
        good = fwd_err < 0.02 and bwd_err < 0.25  # bf16-scale tolerances
        ok &= good
        print(f"# packed b={b} dim={dim} h={heads}: fwd_err={fwd_err:.3e} "
              f"bwd_err={bwd_err:.3e} {'OK' if good else 'FAIL'}", file=sys.stderr)
    hd = 64
    q, k, v = (jax.device_put(rng.normal(size=(4, 6, 261, hd)).astype(np.float32))
               .astype(jnp.bfloat16) for _ in range(3))
    f_err = float(jnp.max(jnp.abs(
        jax.jit(flash_attention)(q, k, v).astype(jnp.float32)
        - jax.jit(_xla_sdpa)(q, k, v).astype(jnp.float32))))
    good = f_err < 0.02
    ok &= good
    print(f"# unpacked fwd_err={f_err:.3e} {'OK' if good else 'FAIL'}", file=sys.stderr)

    # fused half-block: Mosaic-compiled fwd vs the composed XLA+packed path
    from dinox_tpu.ops.fused_attn_block import _call_fused, _xla_half_block

    dim, heads = 384, 6
    xh = jax.device_put((rng.normal(size=(8, 261, dim)) * 0.5
                         ).astype(np.float32)).astype(jnp.bfloat16)
    gm = jax.device_put(1 + 0.1 * rng.normal(size=(dim,)).astype(np.float32))
    bt = jax.device_put(0.1 * rng.normal(size=(dim,)).astype(np.float32))
    wq = jax.device_put((rng.normal(size=(dim, 3 * dim)) * 0.05).astype(np.float32))
    bq = jax.device_put(0.02 * rng.normal(size=(3 * dim,)).astype(np.float32))
    wp = jax.device_put((rng.normal(size=(dim, dim)) * 0.05).astype(np.float32))
    bp = jax.device_put(0.02 * rng.normal(size=(dim,)).astype(np.float32))
    yf = jax.jit(lambda *a: _call_fused(*a, heads))(xh, gm, bt, wq, bq, wp, bp)[0]
    yc = jax.jit(lambda *a: _xla_half_block(*a, heads))(xh, gm, bt, wq, bq, wp, bp)[0]
    fb_err = float(jnp.max(jnp.abs(
        yf.astype(jnp.float32) - yc.astype(jnp.float32))))
    good = fb_err < 0.05
    ok &= good
    print(f"# fused half-block err={fb_err:.3e} {'OK' if good else 'FAIL'}",
          file=sys.stderr)
    print(json.dumps({"metric": "pallas_kernel_check", "value": 1 if ok else 0,
                      "unit": "pass", "vs_baseline": 1 if ok else 0}))
    return 0 if ok else 1


def main() -> int:
    if "--check" in sys.argv:
        return check_kernels()
    # Two configs, both quality-validated on the reference's two-organ MVP
    # anchor (docs/EXPERIMENTS.md): tanh GELU (the SHIPPING DEFAULT —
    # ModelConfig.gelu_approx=True, scripts/pretrain.py --gelu tanh; anchor
    # 0.0829) and exact erf GELU (--gelu exact, torch-parity mode used for
    # reference-imported checkpoints; anchor 0.081). The primary metric is
    # the default path; the parity number rides along in
    # exact_gelu_slices_per_sec. vs_baseline compares against the
    # reference's own default-config number (BASELINE.md, erf/torch) — each
    # framework measured at its shipping default.
    rates = {}
    for name, approx, fused in (
        ("exact", False, False),
        ("tanh", True, False),
        ("tanh+fused_attn", True, True),
        # Switch-MoE family figure (E4/cf1.25, tanh): reported with the
        # MoE-aware MFU denominator (utils/flops.py moe terms) so the 692-ish
        # slices/s number ships with a utilization, not just a rate.
        ("moe4", True, False),
    ):
        # bs96 is the single-chip peak: the round-4 per-HLO-category sweep
        # (docs/round4/batch_sweep.json) measured 884.2 slices/s at 96 vs
        # 872.6 at 128 and 798.6 at 256 — attention custom-call time grows
        # super-linearly past 96 at the seq-261 shape while conv fusions
        # stay flat per sample.
        for bs in (96,):
            try:
                rate = bench_train_step(bs, gelu_approx=approx, fused_attn=fused,
                                        moe_experts=4 if name == "moe4" else 0)
            except Exception as e:  # OOM: keep the best smaller one
                print(f"# {name} batch {bs} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            print(f"# gelu={name} batch={bs}: {rate:.1f} slices/s", file=sys.stderr)
            rates[name] = max(rates.get(name, 0.0), rate)
    # Primary = the best shipping-default (tanh) DENSE arm; fall back to exact
    # only if every tanh arm failed. The gelu label follows whichever arm
    # actually produced `best` (a lone tanh+fused_attn success is still tanh).
    tanh_arms = {k: v for k, v in rates.items() if k.startswith("tanh")}
    dense_arms = {k: v for k, v in rates.items() if k != "moe4"}
    pool = tanh_arms or dense_arms  # never let the MoE arm become the dense headline
    best_key = max(pool, key=pool.get) if pool else None
    best = pool.get(best_key, 0.0)

    from dinox_tpu.models.config import MODEL_CONFIGS
    from dinox_tpu.utils.flops import mfu

    moe_cfg = MODEL_CONFIGS["vit-small"].replace(
        moe_experts=4, gelu_approx=True)
    print(
        json.dumps(
            {
                "metric": "vit_s_pretrain_slices_per_sec",
                "value": round(best, 1),
                "unit": "slices/s",
                "vs_baseline": round(best / BASELINE_SLICES_PER_S, 2),
                "gelu": "tanh" if (best_key or "").startswith("tanh") else "exact",
                "mfu": round(mfu(best, MODEL_CONFIGS["vit-small"]), 3),
                "exact_gelu_slices_per_sec": round(rates.get("exact", 0.0), 1),
                "fused_attn_slices_per_sec": round(
                    rates.get("tanh+fused_attn", 0.0), 1),
                "moe4_slices_per_sec": round(rates.get("moe4", 0.0), 1),
                "moe4_mfu": round(mfu(rates.get("moe4", 0.0), moe_cfg), 3),
            }
        )
    )
    return 0 if best > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
