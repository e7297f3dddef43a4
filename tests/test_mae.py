"""MAE objective tests: masking invariants, patchify golden, loss semantics,
end-to-end step."""

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.mae import (
    MaeModel,
    init_mae,
    mae_loss,
    patchify,
    random_masking,
    sincos_2d,
)
from dinox_tpu.train.state import TrainConfig, create_train_state
from dinox_tpu.train.step import build_train_step

TINY = ModelConfig(
    name="mae-tiny", img_size=32, patch=16, dim=32, depth=2, heads=2,
    out_dim=64, num_registers=0, attn_impl="xla", dtype="float32",
)


def test_sincos_shape_and_cls_row():
    pos = sincos_2d(64, 4, cls_token=True)
    assert pos.shape == (1, 17, 64)
    np.testing.assert_array_equal(pos[0, 0], 0.0)
    assert np.abs(pos[0, 1:]).max() <= 1.0


def test_patchify_golden():
    img = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    out = patchify(img, 2)
    assert out.shape == (2, 4, 12)
    # first patch of first image = rows 0-1, cols 0-1, (p,q,c) order
    want = np.asarray(img[0, :2, :2, :]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), want)


def test_random_masking_invariants():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 8)), jnp.float32)
    x_vis, mask, ids_restore = random_masking(x, 0.75, jax.random.key(1))
    assert x_vis.shape == (3, 4, 8)  # 25% kept
    assert mask.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), 12.0)  # 75% removed
    # visible tokens really come from the input
    flat = np.asarray(x)
    for b in range(3):
        for tok in np.asarray(x_vis[b]):
            assert any(np.allclose(tok, flat[b, j]) for j in range(16))


def test_mae_loss_only_masked_patches():
    imgs = jnp.zeros((1, 4, 4, 3))
    pred = jnp.ones((1, 4, 12))  # every patch wrong by 1.0
    mask_half = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    # mean over masked patches only -> 1.0 regardless of how many are masked
    assert float(mae_loss(pred, imgs, mask_half, 2)) == 1.0
    # unmasked perfect predictions don't dilute the loss
    pred2 = pred.at[0, 2:].set(0.0)
    assert float(mae_loss(pred2, imgs, mask_half, 2)) == 1.0


def test_mae_forward_shapes():
    params = init_mae(TINY, jax.random.key(0))
    assert set(params) == {"encoder", "decoder"}
    model = MaeModel(TINY)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    pred, mask = model.apply({"params": params}, imgs, jax.random.key(1))
    assert pred.shape == (2, 4, 16 * 16 * 3)
    assert mask.shape == (2, 4)


def test_mae_train_step_learns():
    cfg = TrainConfig(
        model=TINY, img_size=32, batch_size=4, loss_type="mae", lr=1e-3,
        warmup_steps=0, max_steps=50, train_seed=0,
    )
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 4, 48, 48, 3)), jnp.uint16)
    sp = jnp.ones((1, 4, 3), jnp.float32)
    losses = []
    for _ in range(10):
        state, m = step_fn(state, px, sp)
        losses.append(float(m["loss_mae"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])  # reconstruction improves
    # teacher untouched under mae
    np.testing.assert_array_equal(
        np.asarray(state.teacher["encoder"]["cls_token"]),
        np.asarray(create_train_state(cfg, jax.random.key(0)).teacher["encoder"]["cls_token"]),
    )
