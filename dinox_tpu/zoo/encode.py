"""Zero-preprocessing encode() API: raw HU array + spacing in, features out.

Behavior parity with reference zoo/encode.py — same input formats
('hu_float', 'hu16_png', 'windowed_float'), same default L=40/W=400 window,
same channel handling for (H, W) / (H, W, 3) / (3, H, W), PIL bilinear
resize, ImageNet normalization, CLS-or-all-tokens output — with a JAX
LoadedModel instead of a torch module. ``encode_batch`` genuinely batches the
forward pass (the reference loops one-by-one, zoo/encode.py:182-227).
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax.numpy as jnp
import numpy as np

from dinox_tpu.data.hu import HU_SCALE, HU_SHIFT, IMAGENET_MEAN, IMAGENET_STD
from dinox_tpu.zoo.hub import LoadedModel

InputFormat = Literal["hu_float", "hu16_png", "windowed_float"]


def _to_hu(arr: np.ndarray, input_format: str) -> np.ndarray:
    if input_format == "hu_float":
        return arr.astype(np.float32)
    if input_format == "hu16_png":
        # deci-HU decode (the stack's working unit; see dinox_tpu.data.hu)
        return (arr.astype(np.float32) - HU_SHIFT) * HU_SCALE
    if input_format == "windowed_float":
        return arr.astype(np.float32)
    raise ValueError(
        f"Unknown input_format: '{input_format}'. "
        "Supported: 'hu_float', 'hu16_png', 'windowed_float'"
    )


def _window(arr: np.ndarray, level: float, width: float) -> np.ndarray:
    lo, hi = level - width / 2.0, level + width / 2.0
    return (np.clip(arr, lo, hi) - lo) / (hi - lo)


def _split_channels(arr: np.ndarray) -> list[np.ndarray]:
    if arr.ndim == 2:
        return [arr, arr, arr]
    if arr.ndim == 3 and arr.shape[2] == 3:
        return [arr[:, :, i] for i in range(3)]
    if arr.ndim == 3 and arr.shape[0] == 3:
        return [arr[i] for i in range(3)]
    raise ValueError(
        f"Unsupported image shape: {arr.shape}. Expected (H, W), (H, W, 3), or (3, H, W)."
    )


def _resize(arr: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(arr).resize((size, size), Image.BILINEAR))


def _preprocess(
    image: np.ndarray,
    img_size: int,
    input_format: str,
    hu_level: float,
    hu_width: float,
) -> np.ndarray:
    """One image -> (img_size, img_size, 3) float32, ImageNet-normalized."""
    if input_format == "windowed_float":
        arr = image.astype(np.float32)
    else:
        arr = _window(_to_hu(image, input_format), hu_level, hu_width)
    planes = [_resize(ch, img_size) for ch in _split_channels(arr)]
    x = np.stack(planes, axis=-1).astype(np.float32)  # NHWC
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def encode(
    model: LoadedModel,
    image: np.ndarray,
    pixel_spacing: tuple[float, float] = (1.0, 1.0),
    slice_thickness: float = 1.0,
    *,
    input_format: InputFormat = "hu_float",
    hu_level: float = 40.0,
    hu_width: float = 400.0,
    return_all_tokens: bool = False,
) -> jnp.ndarray:
    """Encode one medical image slice (or 3-slice stack).

    Returns (1, dim) CLS features, or (1, N, dim) all tokens when
    *return_all_tokens* (reference: zoo/encode.py:82-179).
    """
    x = _preprocess(image, model.img_size, input_format, hu_level, hu_width)[None]
    spacing = None
    if model.scale_aware:
        spacing = jnp.asarray(
            [[pixel_spacing[0], pixel_spacing[1], slice_thickness]], jnp.float32
        )
    feats = model(jnp.asarray(x), spacing)
    if return_all_tokens:
        return feats
    return feats[:, 0, :]


def encode_batch(
    model: LoadedModel,
    images: Sequence[np.ndarray],
    spacings: Sequence[tuple[float, float, float]],
    *,
    input_format: InputFormat = "hu_float",
    hu_level: float = 40.0,
    hu_width: float = 400.0,
    return_all_tokens: bool = False,
    batch_size: int = 64,
) -> jnp.ndarray:
    """Batched encode: (B, dim) CLS features or (B, N, dim) all tokens.

    Unlike the reference's sample-at-a-time loop this stacks up to
    *batch_size* preprocessed images per device forward.
    """
    if len(images) != len(spacings):
        raise ValueError(
            f"images ({len(images)}) and spacings ({len(spacings)}) must have same length"
        )
    chunks = []
    for i in range(0, len(images), batch_size):
        xs = np.stack(
            [
                _preprocess(img, model.img_size, input_format, hu_level, hu_width)
                for img in images[i : i + batch_size]
            ]
        )
        spacing = None
        if model.scale_aware:
            spacing = jnp.asarray(spacings[i : i + batch_size], jnp.float32)
        feats = model(jnp.asarray(xs), spacing)
        chunks.append(feats if return_all_tokens else feats[:, 0, :])
    return jnp.concatenate(chunks, axis=0)
