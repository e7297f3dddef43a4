"""Device-side augmentation tests: golden formulas, crop-resize equivalence,
determinism, view diversity."""

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.ops.augment import (
    AugConfig,
    _crop_resize,
    augment_views,
    decode_window,
    eval_transform,
    normalize_imagenet,
)

CFG = AugConfig(img_size=32)


def test_decode_window_matches_reference_formula():
    u16 = jnp.asarray([[31768, 32768], [32808, 35768]], jnp.uint16)[..., None]
    out = decode_window(u16, jnp.float32(40.0), jnp.float32(400.0))
    # deci-HU: -100, 0, 4, 300 -> window lo=-160 w=400 -> 0.15, 0.4, 0.41, 1.0
    np.testing.assert_allclose(
        np.asarray(out).squeeze(), [[0.15, 0.4], [0.41, 1.0]], atol=1e-5
    )


def test_crop_resize_equals_slice_then_resize():
    img = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)), jnp.float32)
    # Integer crop box so a literal slice is possible.
    top, left, ch, cw = 8.0, 16.0, 32.0, 24.0
    got = _crop_resize(img, top, left, ch, cw, 16, "cubic")
    want = jax.image.resize(img[8:40, 16:40, :], (16, 16, 3), method="cubic", antialias=True)
    # Interior is bit-identical; borders differ (by design) because
    # scale_and_translate samples real pixels beyond the crop edge while a
    # literal slice-then-resize edge-clamps.
    np.testing.assert_allclose(
        np.asarray(got)[3:-3, 3:-3], np.asarray(want)[3:-3, 3:-3], atol=1e-5
    )


def test_augment_views_shapes_and_determinism():
    pixels = jnp.asarray(
        np.random.default_rng(1).integers(30000, 36000, (4, 48, 48, 3)), jnp.uint16
    )
    key = jax.random.key(42)
    v = augment_views(pixels, key, CFG)
    assert v.shape == (2, 4, 32, 32, 3) and v.dtype == jnp.float32
    v2 = augment_views(pixels, key, CFG)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    # Different step key -> different augmentation
    v3 = augment_views(pixels, jax.random.key(43), CFG)
    assert not np.allclose(np.asarray(v), np.asarray(v3))


def test_two_views_differ():
    pixels = jnp.asarray(
        np.random.default_rng(2).integers(30000, 36000, (2, 48, 48, 3)), jnp.uint16
    )
    v = augment_views(pixels, jax.random.key(0), CFG)
    assert not np.allclose(np.asarray(v[0]), np.asarray(v[1]))


def test_augment_output_statistics_sane():
    """Windowed [0,1] then ImageNet-normalized. Bicubic resampling overshoots
    the [0,1] window (negative kernel lobes — torch bicubic does the same),
    so allow ~±0.4 overshoot beyond the analytic normalization bounds."""
    pixels = jnp.asarray(
        np.random.default_rng(3).integers(20000, 46000, (8, 48, 48, 3)), jnp.uint16
    )
    v = np.asarray(augment_views(pixels, jax.random.key(7), CFG))
    assert np.isfinite(v).all()
    assert v.min() >= -4.2 and v.max() <= 4.7


def test_eval_transform_deterministic_and_shaped():
    pixels = jnp.asarray(
        np.random.default_rng(4).integers(30000, 36000, (3, 64, 64, 3)), jnp.uint16
    )
    a = eval_transform(pixels, img_size=32)
    b = eval_transform(pixels, img_size=32)
    assert a.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_transform_nonsquare_center_crop():
    pixels = jnp.asarray(np.full((1, 64, 96, 3), 33768), jnp.uint16)
    out = eval_transform(pixels, img_size=32)
    assert out.shape == (1, 32, 32, 3)


def test_eval_transform_custom_window():
    """The lung window (level=-30, width=120 deci-HU, reference
    docs/EXPERIMENTS.md:307) must change the decoded intensities: a pixel at
    deci-HU -30 is mid-window under the lung window but near-black under the
    default L=40/W=400 soft-tissue window."""
    # stored uint16 = HU + 32768; readers decode deci-HU = (u16 - 32768) * 0.1,
    # so deci-HU -30 is stored as HU -300.
    pixels = jnp.asarray(np.full((1, 32, 32, 3), 32768 - 300), jnp.uint16)
    lung = np.asarray(eval_transform(pixels, img_size=32, level=-30.0, width=120.0))
    soft = np.asarray(eval_transform(pixels, img_size=32))
    assert not np.allclose(lung, soft)
    # a pixel at its window's level is mid-window (0.5 pre-normalization)
    # regardless of which window was chosen
    mid = np.asarray(eval_transform(pixels, img_size=32, level=-30.0, width=2.0))
    np.testing.assert_allclose(mid, np.asarray(eval_transform(
        jnp.asarray(np.full((1, 32, 32, 3), 32768 + 400), jnp.uint16), img_size=32,
        level=40.0, width=2.0)), atol=1e-4)


def test_normalize_golden():
    x = jnp.zeros((2, 2, 3))
    out = np.asarray(normalize_imagenet(x))
    np.testing.assert_allclose(
        out[0, 0], [-0.485 / 0.229, -0.456 / 0.224, -0.406 / 0.225], atol=1e-5
    )
