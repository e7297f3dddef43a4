"""Hounsfield-unit encoding/decoding and windowing.

The on-disk format is 16-bit PNG with ``uint16 = round(HU) + 32768`` written by
the preprocessing stage (reference: scripts/preprocessing/phase2_preprocess_lidc_idri.py:42-57),
while every reader decodes ``(uint16 - 32768) * 0.1`` — so the entire training /
eval / inference stack operates in **deci-HU** (reference: zoo/data.py:158,
zoo/encode.py:54-55, scripts/phase5_big_run.py:518; SURVEY.md §2.4). All window
levels/widths below are in that deci-HU space.
"""

from __future__ import annotations

import numpy as np

HU_SHIFT = 32768
HU_SCALE = 0.1  # deci-HU decode factor

# Random-window augmentation ranges (deci-HU), reference phase5_big_run.py:476-480
RW_LEVEL_MIN, RW_LEVEL_MAX = -400.0, 400.0
RW_WIDTH_MIN, RW_WIDTH_MAX = 800.0, 2000.0

# Deterministic eval window (deci-HU), reference evaluate_panorgan.py / zoo/data.py L=40 W=400
EVAL_LEVEL, EVAL_WIDTH = 40.0, 400.0

# ImageNet normalization constants (reference zoo/encode.py:30-31)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def encode_hu16(hu: np.ndarray) -> np.ndarray:
    """True HU float -> storable uint16 (writer side; clips to the encodable range)."""
    return np.clip(np.round(hu) + HU_SHIFT, 0, 65535).astype(np.uint16)


def decode_hu16(arr: np.ndarray) -> np.ndarray:
    """Stored uint16 (or float thereof) -> deci-HU float32."""
    return (arr.astype(np.float32) - HU_SHIFT) * HU_SCALE


def window(hu: np.ndarray, level: float, width: float) -> np.ndarray:
    """Map a (deci-)HU array into [0, 1] with center *level* and width *width*.

    Matches the reference's formula ``clip((hu - (level - width/2)) / max(width, 1), 0, 1)``
    (scripts/phase5_big_run.py:520-525).
    """
    lo = level - width / 2.0
    out = (hu - lo) / max(width, 1.0)
    return np.clip(out, 0.0, 1.0)
