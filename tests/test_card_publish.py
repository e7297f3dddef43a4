"""Model-card and publish tests (dry-run pattern, no network —
reference tests/test_card_publish.py per SURVEY.md §4)."""

import json

import jax
from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.zoo.card import _scrub_path, generate_model_card
from dinox_tpu.zoo.hub import LoadedModel, load_from_hub_dir
from dinox_tpu.zoo.publish import _scrub_config, publish_to_hub

CFG = ModelConfig(
    name="tiny", img_size=28, patch=14, dim=32, depth=2, heads=2,
    out_dim=48, num_registers=2, scale_aware=True, attn_impl="xla", dtype="float32",
)


def test_scrub_path():
    assert _scrub_path("/home/user/project/data/runs/x") == "data/runs/x"
    assert _scrub_path("/root/repo/runs/exp1/config.json") == "runs/exp1/config.json"
    assert _scrub_path("/tmp/abc123/weights.pth") == "weights.pth"
    assert _scrub_path("relative/path.csv") == "relative/path.csv"


def test_scrub_config_removes_local_details():
    cfg = {
        "lr": 1e-4,
        "index_csv": "/home/tim/data/processed/index.csv",
        "hardware": {"device": "RTX"},
        "nested": {"run_dir": "/root/runs/exp"},
    }
    out = _scrub_config(cfg)
    assert out["lr"] == 1e-4
    assert "/home" not in out["index_csv"]
    assert "hardware" not in out
    assert "/root" not in out["nested"]["run_dir"]


def test_model_card_sections():
    card = generate_model_card(
        {"name": "vit-small", "dim": 384, "depth": 12, "heads": 6, "patch": 14,
         "scale_aware": True, "params_millions": 21.7},
        training_config={"lr": 1e-4, "batch_size": 64, "accumulation_steps": 4,
                         "ema": 0.996, "datasets": ["lidc-idri", "pancreas-ct"]},
        eval_results={"metrics": {
            "view_retrieval_per_dataset": {"lidc-idri": {"top1": 0.105, "top5": 0.395,
                                                         "ratio_vs_random": 54.0}},
            "dataset_discrimination_probe": {"accuracy": 1.0, "auc": 1.0},
            "spacing_prediction": {"r2": 0.876},
        }, "val_slices": 512, "step": 5000, "seed": 42},
        model_name="dinox-ct-vit-small-v1",
    )
    assert card.startswith("---")
    assert "scale-aware" in card  # frontmatter tag
    assert "Research use only" in card
    assert "| Embedding dim | 384 |" in card
    assert "256 (batch=64 × accum=4)" in card
    assert "54×" in card
    assert "0.876" in card
    assert "CC-BY-NC-3.0" in card and "GPL-3.0" in card
    assert "datasets: [lidc-idri, pancreas-ct]" in card
    assert "/home/" not in card and "/root/" not in card


def test_publish_dry_run_stages_everything(tmp_path):
    model = LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))
    staging = publish_to_hub(
        model,
        "someone/dinox-test",
        training_config={"lr": 1e-4, "index_csv": "/home/x/data/index.csv"},
        eval_results={"metrics": {}, "val_slices": 10},
        dry_run=True,
        staging_dir=tmp_path / "stage",
    )
    names = {p.name for p in staging.iterdir()}
    assert {"config.json", "backbone.safetensors", "backbone.pth", "README.md",
            "training_config.json", "eval_results.json"} <= names
    # scrubbing applied to staged training config
    tc = json.loads((staging / "training_config.json").read_text())
    assert "/home" not in tc["index_csv"]
    # staged checkpoint loads back
    re_model = load_from_hub_dir(staging)
    assert re_model.cfg.dim == 32 and re_model.scale_aware


def test_publish_card_reports_real_param_count_and_valid_usage(tmp_path):
    """Regression: the card must carry the actual leaf count of the shipped
    params (not the reference's rough formula, which over-counts ~3x) and a
    usage snippet whose kwargs exist on encode()."""
    import inspect

    import numpy as np

    from dinox_tpu.zoo.encode import encode

    params = init_backbone(CFG, jax.random.key(0))
    model = LoadedModel(CFG, params)
    staging = publish_to_hub(
        model,
        "someone/dinox-test",
        training_config={"lr": 1e-4, "git_commit": "abc1234"},
        dry_run=True,
        staging_dir=tmp_path / "stage",
    )
    card = (staging / "README.md").read_text()
    true_m = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree_util.tree_leaves(params)) / 1e6
    assert f"| Parameters | {round(true_m, 1)}M |" in card
    # training git commit surfaces in the card
    assert "`abc1234`" in card
    # every kwarg the usage snippet shows must exist on encode()
    sig = set(inspect.signature(encode).parameters)
    assert "pixel_spacing" in card and "pixel_spacing" in sig
    assert "slice_thickness" in card and "slice_thickness" in sig
    import re

    assert not re.search(r"(?<!pixel_)spacing=\(", card)  # old, nonexistent kwarg
