"""Checkpoint interop tests: the torch<->JAX bijection is validated against an
independent torch implementation of the documented reference architecture
(tests-only oracle), plus round-trips, legacy migration, and hub formats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import PatchViT
from dinox_tpu.zoo.hub import (
    LoadedModel,
    export_hub_checkpoint,
    load_from_hub_dir,
    load_from_training_checkpoint,
    load_model,
)
from dinox_tpu.zoo.interop import (
    jax_to_torch_backbone,
    jax_to_torch_student,
    migrate_state_dict,
    needs_migration,
    torch_to_jax_backbone,
    torch_to_jax_student,
)

CFG = ModelConfig(
    name="tiny", img_size=28, patch=14, dim=32, depth=2, heads=2,
    out_dim=48, num_registers=3, scale_aware=True, attn_impl="xla", dtype="float32",
    # This CFG models a reference-format (torch) architecture: exact erf GELU,
    # matching the oracle's nn.GELU and what zoo/hub selects for imports.
    gelu_approx=False,
)


# -- torch oracle: the documented reference architecture (zoo/arch.py), -----
# -- re-implemented here purely as a test fixture ---------------------------


class TorchOracleViT(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        d, p = cfg.dim, cfg.patch
        self.cfg = cfg
        self.patch_embed = nn.Conv2d(3, d, kernel_size=p, stride=p)
        n = (cfg.img_size // p) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + n, d) * 0.1)
        self.registers = nn.Parameter(torch.randn(1, cfg.num_registers, d) * 0.02)
        if cfg.scale_aware:
            hidden = max(d // 4, 16)
            self.scale_embed = nn.Module()
            self.scale_embed.mlp = nn.Sequential(
                nn.Linear(3, hidden), nn.GELU(), nn.Linear(hidden, d), nn.LayerNorm(d)
            )
        self.blocks = nn.ModuleList()
        for _ in range(cfg.depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(d)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(d, 3 * d)
            blk.attn.proj = nn.Linear(d, d)
            blk.attn.num_heads = cfg.heads
            blk.norm2 = nn.LayerNorm(d)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(d, int(d * cfg.mlp_ratio))
            blk.mlp.fc2 = nn.Linear(int(d * cfg.mlp_ratio), d)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(d)

    def forward(self, x, spacing=None):
        B = x.shape[0]
        d, h = self.cfg.dim, self.cfg.heads
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1) + self.pos_embed
        if self.cfg.scale_aware and spacing is not None:
            x = x + self.scale_embed.mlp(spacing).unsqueeze(1)
        x = torch.cat([x, self.registers.expand(B, -1, -1)], dim=1)
        for blk in self.blocks:
            y = blk.norm1(x)
            qkv = blk.attn.qkv(y).reshape(B, y.shape[1], 3, h, d // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            y = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(B, -1, d)
            x = x + blk.attn.proj(y)
            x = x + blk.mlp.fc2(F.gelu(blk.mlp.fc1(blk.norm2(x))))
        return self.norm(x)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    return TorchOracleViT(CFG).eval()


def test_torch_to_jax_forward_parity(oracle):
    """Reference-format weights loaded into the flax model produce the same
    features as the torch forward (the core compatibility guarantee)."""
    params = torch_to_jax_backbone(oracle.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    spacing = np.asarray([[0.7, 0.7, 1.5], [1.2, 1.2, 3.0]], np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x), torch.tensor(spacing)).numpy()
    # Full-precision matmuls for the comparison: XLA's default matmul
    # precision is reduced even for f32 inputs, which is a perf policy, not a
    # conversion error.
    with jax.default_matmul_precision("highest"):
        got = np.asarray(
            PatchViT(CFG).apply(
                {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(spacing)
            )
        )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bijection_roundtrip(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    back = jax_to_torch_backbone(torch_to_jax_backbone(sd))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_student_wrapper_roundtrip(oracle):
    sd = {f"backbone.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    rng = np.random.default_rng(1)
    sd["head.0.weight"] = rng.normal(size=(32, 32)).astype(np.float32)
    sd["head.0.bias"] = rng.normal(size=(32,)).astype(np.float32)
    sd["head.2.weight"] = rng.normal(size=(48, 32)).astype(np.float32)
    sd["head.2.bias"] = rng.normal(size=(48,)).astype(np.float32)
    tree = torch_to_jax_student(sd)
    assert set(tree) == {"backbone", "head"}
    back = jax_to_torch_student(tree)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_legacy_migration():
    sd = {
        "blocks.0.attn.in_proj_weight": np.zeros((9, 3)),
        "blocks.0.attn.out_proj.weight": np.zeros((3, 3)),
        "blocks.0.mlp.0.weight": np.zeros((12, 3)),
        "blocks.0.mlp.2.bias": np.zeros((3,)),
        "scale_embed.mlp.0.weight": np.zeros((8, 3)),  # must NOT be renamed
        "cls_token": np.zeros((1, 1, 3)),
    }
    assert needs_migration(sd)
    out = migrate_state_dict(sd)
    assert "blocks.0.attn.qkv.weight" in out
    assert "blocks.0.attn.proj.weight" in out
    assert "blocks.0.mlp.fc1.weight" in out
    assert "blocks.0.mlp.fc2.bias" in out
    assert "scale_embed.mlp.0.weight" in out
    assert not needs_migration(out)


def test_load_from_training_checkpoint(tmp_path, oracle):
    sd = {f"backbone.{k}": v for k, v in oracle.state_dict().items()}
    sd["head.0.weight"] = torch.zeros(32, 32)
    payload = {
        "step": 500,
        "student": sd,
        "teacher": sd,
        "config": {
            "model": {"patch": 14, "dim": 32, "depth": 2, "heads": 2, "out_dim": 48,
                      "num_registers": 3},
            "img_size": 28,
            "scale_aware": True,
        },
    }
    p = tmp_path / "ckpt.pth"
    torch.save(payload, p)
    model = load_from_training_checkpoint(p)
    assert model.scale_aware and model.dim == 32 and model.img_size == 28
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 28, 28, 3)), jnp.float32)
    out = model(x, jnp.asarray([[0.7, 0.7, 1.5]]))
    assert out.shape == (1, 1 + 4 + 3, 32)


def test_scale_aware_mismatch_tolerated(tmp_path, oracle):
    """Loading a scale-blind checkpoint into a scale-aware config fills the
    scale_embed with fresh zero-init values (strict=False analog)."""
    sd = {f"backbone.{k}": v for k, v in oracle.state_dict().items()
          if not k.startswith("scale_embed.")}
    payload = {"student": sd, "config": {
        "model": {"patch": 14, "dim": 32, "depth": 2, "heads": 2, "num_registers": 3},
        "img_size": 28, "scale_aware": True}}
    p = tmp_path / "ckpt.pth"
    torch.save(payload, p)
    model = load_from_training_checkpoint(p)
    assert "scale_embed" in model.params
    # fresh scale_embed output layer is zero-init -> spacing is a no-op
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 28, 28, 3)), jnp.float32)
    a = model(x, jnp.asarray([[0.5, 0.5, 1.0]]))
    b = model(x, jnp.asarray([[9.9, 9.9, 9.9]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_legacy_checkpoint_file_loads_end_to_end(tmp_path, oracle):
    """A phase3-generation .pth (nn.MultiheadAttention / nn.Sequential key
    names) saved by real torch.save loads through load_from_training_checkpoint
    with key migration and produces the same features as the modern keys —
    the file-level analog of the mapping test above. (phase3_micro_run itself
    is deliberately not ported: only its checkpoints matter; see
    docs/DECISIONS.md.)"""
    modern = oracle.state_dict()
    legacy = {}
    for k, v in modern.items():
        lk = (k.replace(".attn.qkv.weight", ".attn.in_proj_weight")
               .replace(".attn.qkv.bias", ".attn.in_proj_bias")
               .replace(".attn.proj.weight", ".attn.out_proj.weight")
               .replace(".attn.proj.bias", ".attn.out_proj.bias")
               .replace(".mlp.fc1.", ".mlp.0.").replace(".mlp.fc2.", ".mlp.2."))
        legacy[f"backbone.{lk}"] = v
    assert any(".in_proj_weight" in k for k in legacy)
    payload = {"step": 100, "student": legacy, "config": {
        "model": {"patch": 14, "dim": 32, "depth": 2, "heads": 2, "num_registers": 3},
        "img_size": 28, "scale_aware": True}}
    p = tmp_path / "legacy.pth"
    torch.save(payload, p)
    model = load_from_training_checkpoint(p)
    x = np.random.default_rng(0).normal(size=(1, 3, 28, 28)).astype(np.float32)
    spacing = np.asarray([[0.7, 0.7, 1.5]], np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x), torch.tensor(spacing)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(spacing)))
    # hub models run bf16 compute; a wrong key mapping would produce O(1)
    # garbage, not 1e-2-scale rounding
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_scale_embed_width_mismatch_reinitialized(tmp_path, oracle):
    """A checkpoint whose scale_embed MLP was built at a different hidden
    width must load with scale_embed dropped + reinitialized, not crash
    (reference zoo/hub.py:139-141)."""
    sd = dict(oracle.state_dict())
    wrong_hidden = 24  # model expects max(dim//4, 16) = 16
    sd["scale_embed.mlp.0.weight"] = torch.randn(wrong_hidden, 3)
    sd["scale_embed.mlp.0.bias"] = torch.randn(wrong_hidden)
    sd["scale_embed.mlp.2.weight"] = torch.randn(32, wrong_hidden)
    payload = {"student": {f"backbone.{k}": v for k, v in sd.items()}, "config": {
        "model": {"patch": 14, "dim": 32, "depth": 2, "heads": 2, "num_registers": 3},
        "img_size": 28, "scale_aware": True}}
    p = tmp_path / "ckpt.pth"
    torch.save(payload, p)
    model = load_from_training_checkpoint(p)
    # reinitialized scale_embed output layer is zero-init -> spacing is a no-op
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 28, 28, 3)), jnp.float32)
    a = model(x, jnp.asarray([[0.5, 0.5, 1.0]]))
    b = model(x, jnp.asarray([[9.9, 9.9, 9.9]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # non-scale_embed mismatches still raise
    sd2 = dict(oracle.state_dict())
    sd2["norm.weight"] = torch.randn(64)
    p2 = tmp_path / "ckpt2.pth"
    torch.save({"student": {f"backbone.{k}": v for k, v in sd2.items()},
                "config": payload["config"]}, p2)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_from_training_checkpoint(p2)


def test_hub_dir_roundtrip_safetensors(tmp_path, oracle):
    params = jax.tree_util.tree_map(jnp.asarray, torch_to_jax_backbone(oracle.state_dict()))
    model = LoadedModel(CFG, params)
    out = export_hub_checkpoint(model, tmp_path / "hub", use_safetensors=True)
    assert (out / "config.json").exists() and (out / "backbone.safetensors").exists()
    re_model = load_from_hub_dir(out)
    assert re_model.cfg.dim == 32 and re_model.scale_aware
    for a, b in zip(jax.tree_util.tree_leaves(re_model.params),
                    jax.tree_util.tree_leaves(model.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hub_pth_readable_by_torch(tmp_path, oracle):
    """The exported backbone.pth must load into a torch model with
    strict=True — proving reference-direction compatibility."""
    params = jax.tree_util.tree_map(jnp.asarray, torch_to_jax_backbone(oracle.state_dict()))
    out = export_hub_checkpoint(LoadedModel(CFG, params), tmp_path / "hub")
    sd = torch.load(out / "backbone.pth", weights_only=True)
    fresh = TorchOracleViT(CFG)
    fresh.load_state_dict(sd, strict=True)
    for k, v in fresh.state_dict().items():
        np.testing.assert_allclose(v.numpy(), oracle.state_dict()[k].numpy(), atol=0, err_msg=k)


def test_load_model_dispatch(tmp_path, oracle):
    params = jax.tree_util.tree_map(jnp.asarray, torch_to_jax_backbone(oracle.state_dict()))
    hub = export_hub_checkpoint(LoadedModel(CFG, params), tmp_path / "hub")
    m1 = load_model(hub)
    assert isinstance(m1, LoadedModel)
    with pytest.raises(FileNotFoundError):
        load_from_training_checkpoint(tmp_path / "missing.pth")
