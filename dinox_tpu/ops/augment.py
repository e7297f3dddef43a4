"""Fused on-device augmentation (XLA-jitted; Pallas variants in augment_pallas).

Replaces the reference's CPU DataLoader-worker augmentation pipeline
(scripts/phase5_big_run.py:471-570: deci-HU decode -> per-view random HU
window -> RandomResizedCrop(bicubic) -> RandomHorizontalFlip -> ImageNet
normalize, two views per sample) with a single batched function that runs on
the TPU. All randomness is counter-based: one PRNGKey per (step), folded per
(sample, view), so augmentation is bit-deterministic given the step key —
the JAX answer to the reference's checkpointed RNG state
(scripts/phase5_big_run.py:1032-1078).

Everything here is static-shaped: the crop is expressed as a per-sample
scale/translate of a fixed 224x224 resampling grid (MXU-friendly separable
matmuls under the hood), never a dynamic slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from dinox_tpu.data.hu import (
    EVAL_LEVEL,
    EVAL_WIDTH,
    HU_SCALE,
    HU_SHIFT,
    IMAGENET_MEAN,
    IMAGENET_STD,
    RW_LEVEL_MAX,
    RW_LEVEL_MIN,
    RW_WIDTH_MAX,
    RW_WIDTH_MIN,
)

_CROP_ATTEMPTS = 10


@dataclass(frozen=True)
class AugConfig:
    """Augmentation hyperparameters (defaults = reference training recipe)."""

    img_size: int = 224
    level_min: float = RW_LEVEL_MIN
    level_max: float = RW_LEVEL_MAX
    width_min: float = RW_WIDTH_MIN
    width_max: float = RW_WIDTH_MAX
    crop_scale_min: float = 0.3  # phase5_big_run.py:483 (zoo/data.py uses 0.5)
    crop_scale_max: float = 1.0
    aspect_min: float = 3.0 / 4.0
    aspect_max: float = 4.0 / 3.0
    hflip_prob: float = 0.5
    n_views: int = 2


def decode_window(pixels: jnp.ndarray, level: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """uint16 PNG values -> deci-HU -> windowed [0, 1].

    level/width broadcast against the batch: pass (B, 1, 1, 1) for per-sample
    windows. Formula parity: scripts/phase5_big_run.py:518-525.
    """
    hu = (pixels.astype(jnp.float32) - HU_SHIFT) * HU_SCALE
    lo = level - width / 2.0
    return jnp.clip((hu - lo) / jnp.maximum(width, 1.0), 0.0, 1.0)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-last ImageNet normalization (zoo/encode.py:75-79)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def _sample_crop_box(key: jax.Array, h: int, w: int, cfg: AugConfig):
    """torchvision RandomResizedCrop.get_params semantics, vectorized over the
    10 rejection-sampling attempts: first in-bounds candidate wins, else the
    aspect-clamped center-crop fallback. Returns float (top, left, ch, cw)."""
    k_area, k_aspect, k_top, k_left = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(
        k_area, (_CROP_ATTEMPTS,), minval=cfg.crop_scale_min, maxval=cfg.crop_scale_max
    )
    log_aspect = jax.random.uniform(
        k_aspect,
        (_CROP_ATTEMPTS,),
        minval=jnp.log(cfg.aspect_min),
        maxval=jnp.log(cfg.aspect_max),
    )
    aspect = jnp.exp(log_aspect)
    cw = jnp.sqrt(area * aspect)
    ch = jnp.sqrt(area / aspect)
    ok = (cw <= w) & (ch <= h)
    pick = jnp.argmax(ok)  # first valid attempt
    any_ok = ok.any()

    # Fallback (torchvision): clamp aspect to the bounds, full-size center crop.
    in_ratio = w / h
    fb_w = jnp.where(
        in_ratio < cfg.aspect_min, float(w), jnp.where(in_ratio > cfg.aspect_max, h * cfg.aspect_max, float(w))
    )
    fb_h = jnp.where(
        in_ratio < cfg.aspect_min, w / cfg.aspect_min, jnp.where(in_ratio > cfg.aspect_max, float(h), float(h))
    )

    cw = jnp.where(any_ok, cw[pick], fb_w)
    ch = jnp.where(any_ok, ch[pick], fb_h)
    top = jax.random.uniform(k_top, (), minval=0.0, maxval=1.0) * (h - ch)
    left = jax.random.uniform(k_left, (), minval=0.0, maxval=1.0) * (w - cw)
    # Fallback is a *center* crop.
    top = jnp.where(any_ok, top, (h - ch) / 2.0)
    left = jnp.where(any_ok, left, (w - cw) / 2.0)
    return top, left, ch, cw


def _crop_resize(img: jnp.ndarray, top, left, ch, cw, out_size: int, method: str) -> jnp.ndarray:
    """Resample the continuous crop box [top, top+ch) x [left, left+cw) of a
    (H, W, C) image to (out_size, out_size, C) via scale_and_translate —
    identical math to slice-then-resize but static-shaped and batchable."""
    scale = jnp.asarray([out_size / ch, out_size / cw])
    translation = jnp.asarray([-top * out_size / ch, -left * out_size / cw])
    return jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[-1]),
        (0, 1),
        scale,
        translation,
        method=method,
        antialias=True,
    )


def _one_view(pixels: jnp.ndarray, key: jax.Array, cfg: AugConfig) -> jnp.ndarray:
    """Augment one sample (H, W, 3) uint16 -> (S, S, 3) float32 normalized."""
    h, w = pixels.shape[0], pixels.shape[1]
    k_win, k_crop, k_flip = jax.random.split(key, 3)
    k_level, k_width = jax.random.split(k_win)
    level = jax.random.uniform(k_level, (), minval=cfg.level_min, maxval=cfg.level_max)
    width = jax.random.uniform(k_width, (), minval=cfg.width_min, maxval=cfg.width_max)
    x = decode_window(pixels, level, width)
    top, left, ch, cw = _sample_crop_box(k_crop, h, w, cfg)
    x = _crop_resize(x, top, left, ch, cw, cfg.img_size, "cubic")
    flip = jax.random.bernoulli(k_flip, cfg.hflip_prob)
    x = jnp.where(flip, x[:, ::-1, :], x)
    return normalize_imagenet(x)


@partial(jax.jit, static_argnames=("cfg",))
def augment_views(
    pixels: jnp.ndarray, key: jax.Array, cfg: AugConfig = AugConfig()
) -> jnp.ndarray:
    """Batched multi-view augmentation.

    Args:
        pixels: (B, H, W, 3) uint16 host canvases.
        key: per-step PRNGKey; folded per (view, sample).
        cfg: AugConfig.

    Returns:
        (n_views, B, S, S, 3) float32, ImageNet-normalized.
    """
    B = pixels.shape[0]

    def per_view(v: int) -> jnp.ndarray:
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.fold_in(key, v), i))(
            jnp.arange(B)
        )
        return jax.vmap(_one_view, in_axes=(0, 0, None))(pixels, keys, cfg)

    return jnp.stack([per_view(v) for v in range(cfg.n_views)])


@partial(jax.jit, static_argnames=("img_size", "level", "width"))
def eval_transform(
    pixels: jnp.ndarray,
    img_size: int = 224,
    level: float = EVAL_LEVEL,
    width: float = EVAL_WIDTH,
) -> jnp.ndarray:
    """Deterministic eval preprocessing: fixed deci-HU window (default
    L=40/W=400), bicubic short-side resize + center crop, normalize
    (reference: zoo/data.py:242-252, 292-297).

    pixels: (B, H, W, 3) uint16 -> (B, S, S, 3) float32.
    """
    x = decode_window(pixels, jnp.float32(level), jnp.float32(width))
    B, H, W, C = x.shape
    # Resize short side to img_size, then center-crop the long side.
    short = min(H, W)
    scale = img_size / short
    nh, nw = round(H * scale), round(W * scale)
    x = jax.image.resize(x, (B, nh, nw, C), method="cubic")
    top, left = (nh - img_size) // 2, (nw - img_size) // 2
    x = x[:, top : top + img_size, left : left + img_size, :]
    return normalize_imagenet(x)
