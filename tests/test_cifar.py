"""CIFAR control-path tests: synthetic data, RGB augmentation, linear
separability of the synthetic classes."""

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.data.cifar import load_cifar10, synthetic_cifar
from dinox_tpu.ops.augment_rgb import (
    RgbAugConfig,
    augment_rgb_views,
    cifar_eval_transform,
)


def test_synthetic_cifar_shapes_and_determinism():
    x1, y1, xt, yt = synthetic_cifar(200, 50, seed=3)
    x2, y2, _, _ = synthetic_cifar(200, 50, seed=3)
    assert x1.shape == (200, 32, 32, 3) and x1.dtype == np.uint8
    assert set(y1.tolist()) <= set(range(10))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_load_cifar10_fallback(tmp_path):
    x, y, xt, yt, real = load_cifar10(tmp_path, synthetic_sizes=(100, 20))
    assert not real and len(x) == 100 and len(xt) == 20


def test_synthetic_classes_linearly_separable():
    """The stand-in classes must be learnable from raw pixels so the probe
    pipeline is meaningful without real CIFAR."""
    from sklearn.linear_model import LogisticRegression

    x, y, xt, yt = synthetic_cifar(600, 200, seed=0)
    clf = LogisticRegression(max_iter=500)
    clf.fit(x.reshape(len(x), -1) / 255.0, y)
    acc = (clf.predict(xt.reshape(len(xt), -1) / 255.0) == yt).mean()
    assert acc > 0.8


def test_rgb_augment_shapes_and_determinism():
    x = jnp.asarray(synthetic_cifar(8, 1)[0])
    cfg = RgbAugConfig(img_size=32)
    v = augment_rgb_views(x, jax.random.key(0), cfg)
    assert v.shape == (2, 8, 32, 32, 3) and v.dtype == jnp.float32
    v2 = augment_rgb_views(x, jax.random.key(0), cfg)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    assert not np.allclose(np.asarray(v[0]), np.asarray(v[1]))
    assert np.isfinite(np.asarray(v)).all()


def test_eval_transform_golden():
    x = jnp.full((1, 32, 32, 3), 128, jnp.uint8)
    out = np.asarray(cifar_eval_transform(x))
    want = (128 / 255.0 - np.asarray([0.4914, 0.4822, 0.4465])) / np.asarray(
        [0.2470, 0.2435, 0.2616]
    )
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-5)
