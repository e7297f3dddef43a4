"""LoRA tests: no-op init, gradient isolation targets, peft on-disk format
round-trip, and cross-compatibility with real HF peft + torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import LoadedModel
from dinox_tpu.zoo.interop import torch_to_jax_backbone
from dinox_tpu.zoo.peft import (
    apply_lora,
    count_parameters,
    load_adapter,
    merge_adapter,
    save_adapter,
)
from tests.test_interop import CFG as INTEROP_CFG, TorchOracleViT

CFG = ModelConfig(
    name="tiny", img_size=28, patch=14, dim=32, depth=2, heads=2,
    out_dim=48, num_registers=2, attn_impl="xla", dtype="float32",
)


@pytest.fixture()
def base_model():
    return LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))


def test_fresh_adapter_is_noop(base_model):
    lora = apply_lora(base_model, rank=4, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lora(x)), np.asarray(base_model(x)), atol=1e-6
    )


def test_trainable_mask_targets_only_lora(base_model):
    lora = apply_lora(base_model, rank=4)
    mask = lora.trainable_mask()
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = [jax.tree_util.keystr(p) for p, v in flat if v]
    assert trainable and all("lora_" in p for p in trainable)
    # physics layers hold no trainable leaves
    assert not any("patch_embed" in p or "pos_embed" in p for p in trainable)
    counts = count_parameters(lora)
    assert 0 < counts["trainable"] < 0.15 * counts["total"]


def test_target_module_subset(base_model):
    lora = apply_lora(base_model, rank=4, target_modules=["qkv"])
    keys = set(lora.adapter_params())
    assert keys and all("qkv" in k for k in keys)
    with pytest.raises(ValueError):
        apply_lora(base_model, rank=4, target_modules=["nope"])


def test_adapter_roundtrip(tmp_path, base_model):
    lora = apply_lora(base_model, rank=4, alpha=8.0, dropout=0.0)
    # make the adapter non-trivial
    params = lora.params
    rng = np.random.default_rng(0)
    for blk in ("blocks_0", "blocks_1"):
        for mod, sub in (("attn", "qkv"), ("attn", "proj"), ("mlp", "fc1"), ("mlp", "fc2")):
            node = params[blk][mod][sub]
            node["lora_B"] = jnp.asarray(rng.normal(size=node["lora_B"].shape) * 0.1, jnp.float32)
    out = save_adapter(lora, tmp_path / "adapter")
    assert (out / "adapter_model.safetensors").exists()
    assert (out / "adapter_config.json").exists()

    re_lora = load_adapter(base_model, out)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 28, 28, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(re_lora(x)), np.asarray(lora(x)), atol=1e-6)
    # adapter actually changes the output
    assert not np.allclose(np.asarray(re_lora(x)), np.asarray(base_model(x)), atol=1e-4)


def test_merge_adapter_matches_unmerged(base_model):
    lora = apply_lora(base_model, rank=4, alpha=8.0, dropout=0.0)
    params = lora.params
    rng = np.random.default_rng(2)
    node = params["blocks_0"]["attn"]["qkv"]
    node["lora_B"] = jnp.asarray(rng.normal(size=node["lora_B"].shape) * 0.1, jnp.float32)
    merged = merge_adapter(lora)
    assert merged.cfg.lora_rank == 0
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 28, 28, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(merged(x)), np.asarray(lora(x)), atol=1e-5)


def test_real_peft_adapter_loads(tmp_path):
    """An adapter trained/saved with HF peft on the torch reference
    architecture loads into the JAX model and produces the same features —
    the 'adapters flow unchanged' guarantee."""
    from peft import LoraConfig, get_peft_model

    torch.manual_seed(0)
    oracle = TorchOracleViT(INTEROP_CFG).eval()
    base_sd = {k: v.clone() for k, v in oracle.state_dict().items()}

    peft_model = get_peft_model(
        oracle,
        LoraConfig(r=4, lora_alpha=8.0, target_modules=["qkv", "proj", "fc1", "fc2"],
                   lora_dropout=0.0, bias="none"),
    )
    # give the adapter real (nonzero) B factors
    with torch.no_grad():
        for name, p in peft_model.named_parameters():
            if "lora_B" in name:
                p.normal_(0, 0.05)
    peft_model.save_pretrained(tmp_path / "torch_adapter")

    jax_base = LoadedModel(
        INTEROP_CFG,
        jax.tree_util.tree_map(jnp.asarray, torch_to_jax_backbone(base_sd)),
    )
    jax_lora = load_adapter(jax_base, tmp_path / "torch_adapter")

    x = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    spacing = np.asarray([[0.7, 0.7, 1.5], [1.0, 1.0, 2.0]], np.float32)
    with torch.no_grad():
        want = peft_model(torch.tensor(x), torch.tensor(spacing)).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax_lora(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(spacing)))
    np.testing.assert_allclose(got, want, atol=5e-4)

    # and the reverse direction: our save_adapter output loads into HF peft
    out = save_adapter(jax_lora, tmp_path / "jax_adapter")
    from peft import PeftModel

    torch.manual_seed(0)
    fresh = TorchOracleViT(INTEROP_CFG).eval()
    fresh.load_state_dict(base_sd)
    peft2 = PeftModel.from_pretrained(fresh, tmp_path / "jax_adapter")
    with torch.no_grad():
        want2 = peft2(torch.tensor(x), torch.tensor(spacing)).numpy()
    np.testing.assert_allclose(want2, want, atol=5e-5)
