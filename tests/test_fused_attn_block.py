"""Fused attention half-block (LN1 -> QKV -> attn -> proj -> +res): numeric
parity against the unfused path, forward and backward, plus checkpoint-path
identity at the module level. CPU runs the kernels in interpret mode; the
Mosaic-compiled path is gated on the live chip by bench.py --check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import PatchViT, init_backbone
from dinox_tpu.ops.fused_attn_block import _xla_half_block, fused_attn_block

B, N, DIM, HEADS = 4, 16, 32, 2


def _args(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, DIM)) * 0.5, jnp.float32).astype(dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.normal(size=(DIM,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(DIM,)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(DIM, 3 * DIM)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(0.02 * rng.normal(size=(3 * DIM,)), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(DIM, DIM)) * 0.1, jnp.float32)
    bproj = jnp.asarray(0.02 * rng.normal(size=(DIM,)), jnp.float32)
    return x, gamma, beta, wqkv, bqkv, wproj, bproj


def test_forward_matches_unfused():
    args = _args()
    got = fused_attn_block(*args, HEADS)
    want, _, _ = _xla_half_block(*args, HEADS)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-5)


def test_forward_matches_unfused_bf16():
    args = _args(dtype=jnp.bfloat16)
    got = fused_attn_block(*args, HEADS).astype(jnp.float32)
    want = _xla_half_block(*args, HEADS)[0].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_backward_matches_unfused():
    args = _args()

    def loss_fused(*a):
        return jnp.sum(fused_attn_block(*a, HEADS).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(_xla_half_block(*a, HEADS)[0].astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "gamma", "beta", "wqkv", "bqkv", "wproj", "bproj"]
    for name, a, b in zip(names, g_fused, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-4 * scale, err_msg=f"grad mismatch: {name}")


CFG = ModelConfig(name="t", img_size=32, patch=16, dim=32, depth=2, heads=2,
                  out_dim=64, num_registers=2, attn_impl="pallas",
                  dtype="float32", scale_aware=False)


def test_model_level_parity_and_checkpoint_paths():
    """fused_attn=True must use the SAME parameter tree (checkpoint
    compatibility) and produce matching outputs."""
    params = init_backbone(CFG, jax.random.key(0))
    params_fused = init_backbone(CFG.replace(fused_attn=True), jax.random.key(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_fused),
    ):
        assert pa == pb and a.shape == b.shape

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    out_ref = PatchViT(CFG).apply({"params": params}, x, None)
    out_fused = PatchViT(CFG.replace(fused_attn=True)).apply({"params": params}, x, None)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=5e-4)


def test_model_level_grad_parity():
    params = init_backbone(CFG, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)

    def loss(p, cfg):
        return jnp.mean(PatchViT(cfg).apply({"params": p}, x, None) ** 2)

    g_ref = jax.grad(loss)(params, CFG)
    g_fused = jax.grad(loss)(params, CFG.replace(fused_attn=True))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=5e-3 * scale, err_msg=f"grad mismatch at {path}")


def test_lora_and_mesh_exclusions_still_work():
    """LoRA configs must silently take the unfused path (adapters live in
    LoraDense), keeping forward finite with the extra adapter params."""
    cfg = CFG.replace(fused_attn=True, lora_rank=2)
    params = init_backbone(cfg, jax.random.key(0))
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    out = PatchViT(cfg).apply({"params": params}, x, None)
    assert np.isfinite(np.asarray(out)).all()
