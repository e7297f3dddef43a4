"""Architecture tests (analog of reference tests/test_scale_embedding.py and
shape/behavior checks; see SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models import (
    MODEL_CONFIGS,
    DinoStudentTeacher,
    ModelConfig,
    PatchViT,
    ScaleEmbedding,
    init_backbone,
    init_model,
)

TINY = ModelConfig(
    name="test-tiny", img_size=28, patch=14, dim=64, depth=2, heads=2,
    out_dim=128, num_registers=4, attn_impl="xla", dtype="float32",
)


def test_presets_match_reference():
    s = MODEL_CONFIGS["vit-small"]
    assert (s.patch, s.dim, s.depth, s.heads, s.out_dim) == (14, 384, 12, 6, 8192)
    g = MODEL_CONFIGS["vit-giant"]
    assert (g.dim, g.depth, g.heads) == (1408, 40, 16)
    # 224/14 -> 16x16=256 patches; +CLS +4 registers = 261 tokens.
    assert s.seq_len == 261


def test_backbone_output_shape():
    params = init_backbone(TINY, jax.random.key(0))
    x = jnp.ones((3, 28, 28, 3))
    out = PatchViT(TINY).apply({"params": params}, x)
    # 28/14 -> 2x2=4 patches, +1 CLS +4 registers = 9 tokens
    assert out.shape == (3, 9, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_scale_embedding_zero_init_is_noop():
    """Zero-init output Dense => fresh ScaleEmbedding contributes exactly zero
    ... except the LayerNorm after it. Reference semantics (zoo/arch.py:119-130):
    the LN sits inside the MLP, and LN(0)=0 because LN of a constant vector is
    bias (=0). So output must be exactly zero."""
    se = ScaleEmbedding(64)
    p = se.init(jax.random.key(0), jnp.ones((2, 3)))
    out = se.apply(p, jnp.asarray([[0.5, 0.5, 1.0], [2.0, 2.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_scale_aware_fresh_equals_scale_blind():
    """A freshly-initialized scale-aware model gives the same output as the
    same weights without spacing (gradual-adoption requirement,
    zoo/arch.py:113-117)."""
    cfg_sa = TINY.replace(scale_aware=True)
    params = init_backbone(cfg_sa, jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (2, 28, 28, 3))
    spacing = jnp.asarray([[0.5, 0.5, 1.0], [1.5, 1.5, 3.0]])
    out_with = PatchViT(cfg_sa).apply({"params": params}, x, spacing)
    out_without = PatchViT(cfg_sa).apply({"params": params}, x, None)
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without), atol=1e-5)


def test_scale_aware_trained_depends_on_spacing():
    cfg_sa = TINY.replace(scale_aware=True)
    params = init_backbone(cfg_sa, jax.random.key(1))
    # Un-zero the scale embed output layer to simulate training.
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["scale_embed"]["fc2"]["kernel"] = (
        jax.random.normal(jax.random.key(3), params["scale_embed"]["fc2"]["kernel"].shape) * 0.1
    )
    x = jax.random.normal(jax.random.key(2), (1, 28, 28, 3))
    o1 = PatchViT(cfg_sa).apply({"params": params}, x, jnp.asarray([[0.5, 0.5, 1.0]]))
    o2 = PatchViT(cfg_sa).apply({"params": params}, x, jnp.asarray([[2.0, 2.0, 5.0]]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_student_teacher_head_shape():
    params = init_model(TINY, jax.random.key(0))
    x = jnp.ones((2, 28, 28, 3))
    out = DinoStudentTeacher(TINY).apply({"params": params}, x)
    assert out.shape == (2, 128)


def test_param_tree_structure():
    params = init_model(TINY, jax.random.key(0))
    bb = params["backbone"]
    assert set(bb) >= {"patch_embed", "cls_token", "pos_embed", "registers", "norm"}
    assert "blocks_0" in bb and "blocks_1" in bb and "blocks_2" not in bb
    blk = bb["blocks_0"]
    assert set(blk) == {"norm1", "attn", "norm2", "mlp"}
    assert set(blk["attn"]) == {"qkv", "proj"}
    assert set(blk["mlp"]) == {"fc1", "fc2"}
    assert set(params["head"]) == {"fc1", "fc2"}
    # qkv fused: kernel (dim, 3*dim)
    assert blk["attn"]["qkv"]["kernel"].shape == (64, 192)


def test_no_registers():
    cfg = TINY.replace(num_registers=0)
    params = init_backbone(cfg, jax.random.key(0))
    assert "registers" not in params
    out = PatchViT(cfg).apply({"params": params}, jnp.ones((1, 28, 28, 3)))
    assert out.shape == (1, 5, 64)


def test_grad_checkpoint_matches():
    cfg_r = TINY.replace(use_grad_checkpoint=True)
    params = init_backbone(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(5), (2, 28, 28, 3))

    def loss_fn(p, cfg, train):
        return jnp.sum(PatchViT(cfg).apply({"params": p}, x, train=train) ** 2)

    g_plain = jax.grad(loss_fn)(params, TINY, True)
    g_remat = jax.grad(loss_fn)(params, cfg_r, True)
    chex = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5), g_plain, g_remat
    )
    del chex


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_dtype_policy(dtype):
    cfg = TINY.replace(dtype=dtype)
    params = init_backbone(cfg, jax.random.key(0))
    # Params always f32
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    out = PatchViT(cfg).apply({"params": params}, jnp.ones((1, 28, 28, 3)))
    assert out.dtype == jnp.float32  # final norm upcasts


def test_gelu_approx_flag():
    """gelu_approx changes only the MLP nonlinearity: same params/checkpoint,
    close-but-not-identical outputs. The native default is tanh; torch-parity
    (reference-imported) configs run exact erf."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinox_tpu.models.config import ModelConfig
    from dinox_tpu.models.vit import PatchViT, init_backbone

    cfg = ModelConfig(name="t", img_size=32, patch=16, dim=64, depth=2, heads=2,
                      out_dim=128, scale_aware=False, attn_impl="xla",
                      dtype="float32")
    assert cfg.gelu_approx, "native default must be the tanh GELU"
    params = init_backbone(cfg, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    approx = PatchViT(cfg).apply({"params": params}, x, None)
    exact = PatchViT(cfg.replace(gelu_approx=False)).apply({"params": params}, x, None)
    assert not np.allclose(np.asarray(exact), np.asarray(approx), atol=1e-7)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(approx), atol=5e-2)


def test_gelu_variant_follows_checkpoint_provenance():
    """Reference-format loads (no gelu_approx in config) resolve to exact erf;
    native hub exports carry the field so tanh models round-trip as tanh."""
    from dinox_tpu.models.config import HUB_DEFAULT_CONFIG
    from dinox_tpu.zoo.hub import _cfg_from_dict

    assert HUB_DEFAULT_CONFIG["gelu_approx"] is False
    assert _cfg_from_dict({"dim": 384, "depth": 12, "heads": 6}).gelu_approx is False
    assert _cfg_from_dict({"dim": 384, "depth": 12, "heads": 6,
                           "gelu_approx": True}).gelu_approx is True


def test_scale_gamma_init_scales_pinned_norm():
    """The trailing LN pins the scale token norm at sqrt(dim)*rms(gamma) once
    fc2 leaves zero-init; `scale_gamma_init` sets gamma (and hence the
    scale/token input-mix ratio) proportionally, and 1.0 is the flax default
    (bit-exact with prior checkpoints)."""
    sp = jnp.asarray([[0.5, 0.5, 1.0], [2.0, 2.0, 5.0]])

    def out_norm(gamma_init):
        se = ScaleEmbedding(64, gamma_init=gamma_init)
        p = se.init(jax.random.key(0), sp)
        assert np.allclose(np.asarray(p["params"]["norm"]["scale"]), gamma_init)
        # un-zero fc2 to leave the zero-init regime
        p = jax.tree_util.tree_map(lambda v: v, p)
        p["params"]["fc2"]["kernel"] = (
            jax.random.normal(jax.random.key(3), p["params"]["fc2"]["kernel"].shape) * 0.1
        )
        out = se.apply(p, sp)
        return float(np.mean(np.linalg.norm(np.asarray(out)[:, 0, :], axis=-1)))

    n_full, n_quarter = out_norm(1.0), out_norm(0.25)
    assert n_quarter == pytest.approx(n_full * 0.25, rel=1e-5)


def test_scale_gamma_init_threads_through_config():
    cfg = TINY.replace(scale_aware=True, scale_gamma_init=0.25)
    params = init_backbone(cfg, jax.random.key(1))
    assert np.allclose(np.asarray(params["scale_embed"]["norm"]["scale"]), 0.25)
    # round-trips through config dicts (hub/export compat)
    from dinox_tpu.models.config import ModelConfig as MC
    assert MC.from_dict(cfg.to_dict()).scale_gamma_init == 0.25
