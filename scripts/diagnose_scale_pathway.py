#!/usr/bin/env python
"""Scale-pathway diagnostic (round-3 VERDICT #4: "study why counterfactual
cosine distances are ~10x the reference's").

The architecture is at exact parity with the reference (ScaleEmbedding =
Linear/GELU/Linear(zero-init)/LayerNorm added to all pre-register tokens;
reference zoo/arch.py:105-140, 224-227) — so a magnitude divergence must be
*trained dynamics*, not wiring. This tool localizes which leg carries it,
from any checkpoint (run dir, hub dir, or reference .pth):

  [1] scale-token geometry — post-LN norm (the trailing LayerNorm pins it
      near sqrt(dim)*rms(gamma) the moment fc2 leaves zero-init, regardless
      of how small the raw signal is), raw pre-LN norm, LN gamma rms, and
      the cosine rotation of the scale vector itself under x2 / x0.5
      spacing (how much of the pinned-norm vector actually *turns*).
  [2] input-mix ratio — |scale_vec| / mean |patch_token + pos_embed|: the
      share of the residual-stream input contributed by spacing.
  [3] end-to-end counterfactual curve — mean cosine distance of the
      L2-normalized CLS under spacing multipliers {0.25, 0.5, 2, 4} on a
      fixed synthetic batch (same pixels), i.e. the evaluate_panorgan
      metric plus its local slope at m=1 (+-5%).

Reference anchors: counterfactual 0.055 (x2) / 0.107 (x0.5)
(/root/reference/docs/EXPERIMENTS.md:767-775).

    python scripts/diagnose_scale_pathway.py --checkpoint data/runs/mvp \
        --out docs/round4/mvp_scale_diag.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import (
    enable_compilation_cache,
    respect_jax_platforms_env,
)

respect_jax_platforms_env()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="run dir (orbax), hub dir, or reference .pth")
    p.add_argument("--out", type=Path, default=None)
    p.add_argument("--n", type=int, default=32, help="diagnostic batch size")
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def load_any_model(path: str):
    from dinox_tpu.zoo.hub import load_model
    from dinox_tpu.train.run_export import load_backbone_from_run

    p = Path(path)
    if (p / "ckpt").is_dir():
        return load_backbone_from_run(p)
    return load_model(path)


def make_batch(n: int, canvas: int, img_size: int, seed: int):
    """Fixed synthetic pixels (two v2 profiles) + their true spacings."""
    from dinox_tpu.data.synthetic import PROFILES_V2, draw_spacing, synth_series_np
    from dinox_tpu.ops.augment import eval_transform

    rng = np.random.default_rng(seed)
    slices, spacings = [], []
    per = max(1, n // 2)
    for profile in PROFILES_V2[:2]:
        hu = synth_series_np(profile, rng, per, canvas)
        sp = draw_spacing(profile, rng)
        for s in hu:
            # 2.5D stack of the same slice (series edge behavior); encode
            # with the standard uint16 = HU + 32768 convention.
            u16 = np.clip(s + 32768.0, 0, 65535).astype(np.uint16)
            slices.append(np.stack([u16] * 3, axis=-1))
            spacings.append(sp)
    pixels = jnp.asarray(np.stack(slices[:n]))
    x = eval_transform(pixels, img_size=img_size)
    return np.asarray(x), np.asarray(spacings[:n], dtype=np.float32)


def _l2n(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _cosdist(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(1.0 - np.sum(_l2n(a) * _l2n(b), axis=-1)))


def scale_token_stats(model, spacing: np.ndarray) -> dict:
    """[1] geometry of the ScaleEmbedding output, pre- and post-LN."""
    from dinox_tpu.models.vit import ScaleEmbedding, _gelu

    p = model.params["scale_embed"]
    sp = jnp.asarray(spacing)

    def post_ln(s):
        out = ScaleEmbedding(model.cfg.dim).apply({"params": p}, s)
        return np.asarray(out[:, 0, :])

    def pre_ln(s):
        h = _gelu(s @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        return np.asarray(h @ p["fc2"]["kernel"] + p["fc2"]["bias"])

    v1, v2, vh = post_ln(sp), post_ln(sp * 2.0), post_ln(sp * 0.5)
    gamma = np.asarray(p["norm"]["scale"])
    norm1 = float(np.mean(np.linalg.norm(v1, axis=-1)))
    live = norm1 > 1e-6  # rotation is undefined at exact zero-init
    return {
        "post_ln_norm_mean": norm1,
        "pre_ln_norm_mean": float(np.mean(np.linalg.norm(pre_ln(sp), axis=-1))),
        "ln_gamma_rms": float(np.sqrt(np.mean(gamma**2))),
        "ln_pin_norm": float(np.sqrt(model.cfg.dim) * np.sqrt(np.mean(gamma**2))),
        "scale_vec_cosdist_2x": _cosdist(v1, v2) if live else None,
        "scale_vec_cosdist_0.5x": _cosdist(v1, vh) if live else None,
    }


def input_mix_ratio(model, x: np.ndarray, scale_norm: float) -> dict:
    """[2] |scale_vec| vs the mean norm of the image tokens it is added to."""
    from dinox_tpu.models.vit import PatchViT

    module = PatchViT(model.cfg)
    tokens = module.apply(
        {"params": model.params}, jnp.asarray(x), method="patch_tokens"
    )
    pos = model.params["pos_embed"][:, 1:, :]
    tok = np.asarray(tokens + pos, dtype=np.float32)
    tok_norm = float(np.mean(np.linalg.norm(tok, axis=-1)))
    return {
        "patch_token_norm_mean": tok_norm,
        "scale_to_token_ratio": float(scale_norm / max(tok_norm, 1e-12)),
    }


def counterfactual_curve(model, x: np.ndarray, spacing: np.ndarray) -> dict:
    """[3] CLS cosine distance vs spacing multiplier, same pixels."""
    def cls(mult: float) -> np.ndarray:
        out = model(jnp.asarray(x), jnp.asarray(spacing * mult))
        return np.asarray(out[:, 0, :], dtype=np.float32)

    base = cls(1.0)
    curve = {f"{m:g}x": _cosdist(base, cls(m)) for m in (0.25, 0.5, 2.0, 4.0)}
    slope = (_cosdist(base, cls(1.05)) + _cosdist(base, cls(1 / 1.05))) / (
        2 * np.log(1.05)
    )
    return {"cosdist_vs_multiplier": curve,
            "local_slope_per_log_spacing": float(slope)}


def main(argv=None) -> int:
    args = parse_args(argv)
    model = load_any_model(args.checkpoint)
    if not model.scale_aware:
        print("error: checkpoint is not scale-aware", file=sys.stderr)
        return 2

    x, spacing = make_batch(args.n, args.canvas, model.img_size, args.seed)
    report = {
        "checkpoint": str(args.checkpoint),
        "n": int(x.shape[0]),
        "dim": model.cfg.dim,
        "sqrt_dim": float(np.sqrt(model.cfg.dim)),
        "scale_token": scale_token_stats(model, spacing),
        "counterfactual": counterfactual_curve(model, x, spacing),
        "reference_anchor": {"2x": 0.055, "0.5x": 0.107,
                             "source": "/root/reference/docs/EXPERIMENTS.md:767-775"},
    }
    report["input_mix"] = input_mix_ratio(
        model, x, report["scale_token"]["post_ln_norm_mean"]
    )

    st, cf = report["scale_token"], report["counterfactual"]
    rot = st["scale_vec_cosdist_2x"]
    print(f"scale token: |post_ln|={st['post_ln_norm_mean']:.2f} "
          f"(LN pin ~{st['ln_pin_norm']:.2f}, raw pre-LN {st['pre_ln_norm_mean']:.4f}) "
          f"rotation x2={'zero-init' if rot is None else f'{rot:.4f}'}", flush=True)
    print(f"input mix: scale/token ratio = "
          f"{report['input_mix']['scale_to_token_ratio']:.3f}", flush=True)
    print(f"counterfactual: {cf['cosdist_vs_multiplier']} "
          f"(ref anchor 2x=0.055, 0.5x=0.107)", flush=True)

    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(report, indent=2))
        print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
