"""Fused MLP half-block kernel (ops/fused_mlp.py): numerical parity with the
unfused flax path — forward, full VJP (dx + all six param grads), padding of
non-divisible row counts, and identical param trees / checkpoints."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import PatchViT, init_backbone
from dinox_tpu.ops.fused_mlp import fused_mlp_block, mlp_block_reference

CFG = ModelConfig(
    name="t", img_size=28, patch=14, dim=32, depth=2, heads=2,
    num_registers=2, scale_aware=True, attn_impl="xla", dtype="float32",
    # fused_mlp_block hard-wires the exact erf GELU; pin the config to exact
    # so the fused path is actually taken (TransformerBlock routes tanh-GELU
    # configs to the unfused Mlp).
    gelu_approx=False,
)


def make_args(b=2, n=16, c=32, h=128, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)),
        jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c, h)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(h,)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(h, c)).astype(np.float32)),
        jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)),
    )


def test_forward_matches_reference():
    args = make_args()
    np.testing.assert_allclose(
        np.asarray(fused_mlp_block(*args)),
        np.asarray(mlp_block_reference(*args)), atol=2e-6,
    )


def test_vjp_matches_reference_all_args():
    args = make_args()
    loss = lambda fn: (lambda *a: jnp.sum(jnp.sin(fn(*a))))  # noqa: E731
    g1 = jax.grad(loss(fused_mlp_block), argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss(mlp_block_reference), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["dx", "dg", "db", "dw1", "db1", "dw2", "db2"], g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


def test_row_padding_path():
    """b*n = 14 rows (not a multiple of any block size) must still be exact —
    the zero-padded rows may not leak into dx or the dW accumulators."""
    args = make_args(b=2, n=7)
    np.testing.assert_allclose(
        np.asarray(fused_mlp_block(*args)),
        np.asarray(mlp_block_reference(*args)), atol=2e-6,
    )
    loss = lambda fn: (lambda *a: jnp.sum(fn(*a) ** 2))  # noqa: E731
    g1 = jax.grad(loss(fused_mlp_block), argnums=(0, 3, 5))(*args)
    g2 = jax.grad(loss(mlp_block_reference), argnums=(0, 3, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_model_level_parity_and_checkpoint_identity():
    """fused_mlp=True produces the same param tree, the same init values,
    and the same forward/grads as the unfused model — checkpoints are
    interchangeable."""
    cfgf = CFG.replace(fused_mlp=True)
    p1 = init_backbone(CFG, jax.random.key(0))
    p2 = init_backbone(cfgf, jax.random.key(0))
    assert jtu.tree_structure(p1) == jtu.tree_structure(p2)
    for a, b in zip(jtu.tree_leaves(p1), jtu.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)), jnp.float32)
    sp = jnp.asarray([[0.7, 0.7, 1.5], [1.0, 1.0, 2.0]])
    o1 = PatchViT(CFG).apply({"params": p1}, x, sp)
    o2 = PatchViT(cfgf).apply({"params": p1}, x, sp)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(PatchViT(CFG).apply({"params": p}, x, sp))))(p1)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(PatchViT(cfgf).apply({"params": p}, x, sp))))(p1)
    for (path, a), b in zip(jtu.tree_flatten_with_path(g1)[0], jtu.tree_leaves(g2)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5,
            err_msg=jtu.keystr(path),
        )


def test_lora_keeps_unfused_path():
    """LoRA-enabled blocks must ignore fused_mlp (adapters live in the Dense
    path); the model with rank>0 still initializes lora params."""
    cfg = CFG.replace(fused_mlp=True, lora_rank=4)
    params = init_backbone(cfg, jax.random.key(0))
    assert "lora_A" in params["blocks_0"]["mlp"]["fc1"]


def test_vjp_b2_cotangent_dtype():
    """db2 must come back in b2's dtype even when it differs from b1's
    (regression: db2 was cast to b1.dtype)."""
    args = list(make_args())
    args[6] = args[6].astype(jnp.bfloat16)  # b2 bf16, b1 stays f32
    g = jax.grad(lambda *a: jnp.sum(fused_mlp_block(*a).astype(jnp.float32)),
                 argnums=(4, 6))(*args)
    assert g[0].dtype == jnp.float32   # db1 follows b1
    assert g[1].dtype == jnp.bfloat16  # db2 follows b2
