"""On-device RGB (CIFAR-style) two-view augmentation.

JAX analog of the reference CIFAR TwoCrops pipeline
(scripts/baseline_cifar10_pretrain.py:100-130): RandomResizedCrop(0.5-1.0,
bicubic) + HFlip(0.5) + ColorJitter(0.4, 0.4, 0.2, 0.1) applied with p=0.8 +
RandomGrayscale(0.2) + CIFAR normalization — all batched, counter-based RNG.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from dinox_tpu.ops.augment import _crop_resize, _sample_crop_box, AugConfig

CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2470, 0.2435, 0.2616)
_LUMA = jnp.asarray([0.299, 0.587, 0.114])


@dataclass(frozen=True)
class RgbAugConfig:
    img_size: int = 32
    crop_scale_min: float = 0.5
    crop_scale_max: float = 1.0
    hflip_prob: float = 0.5
    jitter_prob: float = 0.8
    brightness: float = 0.4
    contrast: float = 0.4
    saturation: float = 0.2
    hue: float = 0.1
    grayscale_prob: float = 0.2
    n_views: int = 2

    @property
    def crop_cfg(self) -> AugConfig:
        return AugConfig(
            img_size=self.img_size,
            crop_scale_min=self.crop_scale_min,
            crop_scale_max=self.crop_scale_max,
        )


def _color_jitter(x: jnp.ndarray, key: jax.Array, cfg: RgbAugConfig) -> jnp.ndarray:
    """Brightness/contrast/saturation as multiplicative factors, hue as a
    channel rotation around the luma axis (torchvision-equivalent ranges)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=1 - cfg.brightness, maxval=1 + cfg.brightness)
    c = jax.random.uniform(kc, (), minval=1 - cfg.contrast, maxval=1 + cfg.contrast)
    s = jax.random.uniform(ks, (), minval=1 - cfg.saturation, maxval=1 + cfg.saturation)
    h = jax.random.uniform(kh, (), minval=-cfg.hue, maxval=cfg.hue) * 2.0 * jnp.pi

    x = x * b
    gray_mean = jnp.mean(x @ _LUMA)
    x = gray_mean + (x - gray_mean) * c
    gray = (x @ _LUMA)[..., None]
    x = gray + (x - gray) * s
    # hue: rotate chroma in the YIQ-ish plane
    yiq = jnp.stack(
        [
            x @ jnp.asarray([0.299, 0.587, 0.114]),
            x @ jnp.asarray([0.596, -0.274, -0.322]),
            x @ jnp.asarray([0.211, -0.523, 0.312]),
        ],
        axis=-1,
    )
    cos_h, sin_h = jnp.cos(h), jnp.sin(h)
    i, q = yiq[..., 1], yiq[..., 2]
    yiq = yiq.at[..., 1].set(cos_h * i - sin_h * q).at[..., 2].set(sin_h * i + cos_h * q)
    rgb = jnp.stack(
        [
            yiq @ jnp.asarray([1.0, 0.956, 0.621]),
            yiq @ jnp.asarray([1.0, -0.272, -0.647]),
            yiq @ jnp.asarray([1.0, -1.106, 1.703]),
        ],
        axis=-1,
    )
    return jnp.clip(rgb, 0.0, 1.0)


def _one_view(img: jnp.ndarray, key: jax.Array, cfg: RgbAugConfig) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    k_crop, k_flip, k_japply, k_jit, k_gray = jax.random.split(key, 5)
    x = img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8 else img.astype(jnp.float32)
    top, left, ch, cw = _sample_crop_box(k_crop, h, w, cfg.crop_cfg)
    x = _crop_resize(x, top, left, ch, cw, cfg.img_size, "cubic")
    x = jnp.clip(x, 0.0, 1.0)
    x = jnp.where(jax.random.bernoulli(k_flip, cfg.hflip_prob), x[:, ::-1, :], x)
    jittered = _color_jitter(x, k_jit, cfg)
    x = jnp.where(jax.random.bernoulli(k_japply, cfg.jitter_prob), jittered, x)
    gray = jnp.broadcast_to((x @ _LUMA)[..., None], x.shape)
    x = jnp.where(jax.random.bernoulli(k_gray, cfg.grayscale_prob), gray, x)
    return (x - jnp.asarray(CIFAR_MEAN)) / jnp.asarray(CIFAR_STD)


@partial(jax.jit, static_argnames=("cfg",))
def augment_rgb_views(
    pixels: jnp.ndarray, key: jax.Array, cfg: RgbAugConfig = RgbAugConfig()
) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float -> (n_views, B, S, S, 3) float32 normalized."""
    b = pixels.shape[0]

    def per_view(v: int) -> jnp.ndarray:
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.fold_in(key, v), i))(
            jnp.arange(b)
        )
        return jax.vmap(_one_view, in_axes=(0, 0, None))(pixels, keys, cfg)

    return jnp.stack([per_view(v) for v in range(cfg.n_views)])


@jax.jit
def cifar_eval_transform(pixels: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, 32, 32, 3) -> normalized float32 (deterministic)."""
    x = pixels.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(CIFAR_MEAN)) / jnp.asarray(CIFAR_STD)
