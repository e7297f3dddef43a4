"""publish_release CLI (round-5, VERDICT r4 #2): staging from a backbone with
embedded eval results + adapter, and the committable weightless snapshot
whose sha256 manifest matches the staged weights byte-for-byte."""

import hashlib
import json
import subprocess
import sys
from pathlib import Path

import jax
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.hub import LoadedModel, export_hub_checkpoint
from dinox_tpu.zoo.peft import apply_lora, save_adapter

REPO = Path(__file__).resolve().parent.parent

TINY = ModelConfig(name="tiny-rel", img_size=32, patch=16, dim=64, depth=2,
                   heads=2, out_dim=128, num_registers=4, scale_aware=True,
                   attn_impl="xla", dtype="float32")


@pytest.fixture(scope="module")
def release(tmp_path_factory):
    root = tmp_path_factory.mktemp("release")
    model = LoadedModel(TINY, init_backbone(TINY, jax.random.key(0)))
    hub = root / "hub"
    export_hub_checkpoint(model, hub, use_safetensors=True)
    adapter = save_adapter(apply_lora(model, rank=4), root / "adapter")
    (root / "eval.json").write_text(json.dumps(
        {"spacing_prediction": {"r2": 0.9}}))
    (root / "retr.json").write_text(json.dumps({"top1_ratio": 14.0}))
    staging, snap = root / "staging", root / "snap"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "publish_release.py"),
         "--backbone", str(hub), "--model-name", "tiny-rel-test",
         "--eval-json", str(root / "eval.json"),
         "--retrieval-json", str(root / "retr.json"),
         "--adapter", str(adapter),
         "--staging-dir", str(staging), "--snapshot-dir", str(snap)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return staging, snap


def test_staging_contains_full_release(release):
    staging, _ = release
    for name in ("backbone.safetensors", "backbone.pth", "config.json",
                 "README.md", "eval_results.json"):
        assert (staging / name).exists(), name
    evals = json.loads((staging / "eval_results.json").read_text())
    assert evals["spacing_prediction"]["r2"] == 0.9
    assert evals["view_retrieval"]["top1_ratio"] == 14.0
    assert (staging / "adapter" / "adapter_model.safetensors").exists()
    assert (staging / "adapter" / "adapter_config.json").exists()


def test_snapshot_is_weightless_with_matching_manifest(release):
    staging, snap = release
    manifest = (snap / "WEIGHTS.sha256").read_text().splitlines()
    entries = {}
    for line in manifest[1:]:
        digest, size, rel = line.split(maxsplit=2)
        entries[rel] = (digest, int(size))
    # every staged weight is manifested with the right hash; none copied
    for f in staging.rglob("*"):
        if f.is_file() and f.suffix in (".safetensors", ".pth"):
            rel = str(f.relative_to(staging))
            assert rel in entries, rel
            assert not (snap / rel).exists()
            digest, size = entries[rel]
            assert digest == hashlib.sha256(f.read_bytes()).hexdigest()
            assert size == f.stat().st_size
    # the light files ARE copied
    assert (snap / "README.md").exists()
    assert (snap / "config.json").exists()
    assert (snap / "adapter" / "adapter_config.json").exists()


def test_staged_pth_loads_with_reference_semantics(release):
    """The staged torch .pth round-trips through the reference-format loader
    (timm-style keys, strict)."""
    staging, _ = release
    from dinox_tpu.zoo.hub import load_from_hub_dir

    loaded = load_from_hub_dir(staging)
    assert loaded.cfg.dim == TINY.dim and loaded.cfg.scale_aware
    import torch

    sd = torch.load(staging / "backbone.pth", map_location="cpu",
                    weights_only=True)
    assert "blocks.0.attn.qkv.weight" in sd
    assert "patch_embed.weight" in sd and sd["patch_embed.weight"].shape == (
        64, 3, 16, 16)
