"""Fine-tune subsystem tests: labeled CSV, metrics, optimizer masking,
learning on a separable toy task, save format."""

import csv

import jax
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import init_backbone
from dinox_tpu.train.finetune import (
    EarlyStopper,
    FinetuneConfig,
    build_finetune_step,
    compute_metrics,
    init_head,
    iter_labeled_batches,
    load_labeled_csv,
    make_finetune_optimizer,
    rank_auroc,
    save_finetune,
)
from dinox_tpu.zoo.hub import LoadedModel
from dinox_tpu.zoo.peft import apply_lora
from tests.test_data import make_hu16_png

CFG = ModelConfig(
    name="tiny", img_size=28, patch=14, dim=32, depth=2, heads=2,
    out_dim=48, num_registers=2, attn_impl="xla", dtype="float32",
)


def write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_path", "label", "spacing_x", "spacing_y", "spacing_z"])
        w.writerows(rows)


@pytest.fixture
def labeled_tree(tmp_path):
    """Separable 2-class task: class 1 images are much brighter."""
    rows = []
    for i in range(24):
        label = i % 2
        p = tmp_path / f"img{i}.png"
        # class 0 ~ -200 HU, class 1 ~ +800 HU (well inside the L40/W400 window)
        make_hu16_png(p, value_hu=-150.0 + 400.0 * label, size=32)
        rows.append([str(p), label, 0.7, 0.7, 1.5])
    csv_path = tmp_path / "train.csv"
    write_csv(csv_path, rows)
    return csv_path


def test_load_labeled_csv(labeled_tree):
    rows = load_labeled_csv(labeled_tree)
    assert len(rows) == 24 and rows[0].spacing_x == 0.7
    assert {r.label for r in rows} == {0.0, 1.0}


def test_load_labeled_csv_rejects_float_class(tmp_path):
    p = tmp_path / "bad.csv"
    write_csv(p, [["a.png", 0.5, 1, 1, 1]])
    with pytest.raises(ValueError, match="non-integer"):
        load_labeled_csv(p, "classification")
    assert load_labeled_csv(p, "regression")[0].label == 0.5


def test_rank_auroc_golden():
    assert rank_auroc(np.asarray([0.9, 0.8, 0.2, 0.1]), np.asarray([1, 1, 0, 0])) == 1.0
    assert rank_auroc(np.asarray([0.1, 0.2, 0.8, 0.9]), np.asarray([1, 1, 0, 0])) == 0.0
    assert rank_auroc(np.asarray([0.5, 0.5, 0.5, 0.5]), np.asarray([1, 1, 0, 0])) == 0.5
    assert rank_auroc(np.asarray([1.0]), np.asarray([1])) == 0.5  # degenerate


def test_compute_metrics_classification():
    logits = np.asarray([[2.0, -1.0], [-1.0, 2.0], [3.0, 0.0], [0.0, 3.0]])
    t = np.asarray([0, 1, 0, 1])
    m = compute_metrics(logits, t, "classification", 2)
    assert m["accuracy"] == 1.0 and m["auroc"] == 1.0 and m["macro_f1"] > 0.99


def test_compute_metrics_regression():
    logits = np.asarray([[1.0], [2.0], [3.0]])
    t = np.asarray([1.0, 2.0, 3.0])
    m = compute_metrics(logits, t, "regression", 1)
    assert m["mse"] == 0.0 and m["r2"] == 1.0


def test_early_stopper():
    es = EarlyStopper(metric="auroc", patience=2)
    assert es.update({"auroc": 0.6}) == (True, False)
    assert es.update({"auroc": 0.7}) == (True, False)
    assert es.update({"auroc": 0.65}) == (False, False)
    assert es.update({"auroc": 0.64}) == (False, True)


def test_optimizer_only_updates_adapter_and_head(labeled_tree):
    base = LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))
    lora = apply_lora(base, rank=4, dropout=0.0)
    cfg = FinetuneConfig(rank=4, lr=1e-2, warmup_steps=0, total_steps=10, batch_size=4)
    params = {"backbone": lora.params, "head": init_head(cfg, CFG.dim, jax.random.key(1))}
    frozen_before = np.asarray(params["backbone"]["patch_embed"]["kernel"])
    lora_before = np.asarray(params["backbone"]["blocks_0"]["attn"]["qkv"]["lora_B"])

    tx = make_finetune_optimizer(cfg, lora.params, CFG.depth)
    opt_state = tx.init(params)
    step_fn, predict_fn = build_finetune_step(lora, cfg, tx)
    rows = load_labeled_csv(labeled_tree)
    px, sp, lab = next(iter_labeled_batches(rows, 4, shuffle=True, seed=0, canvas=32))
    params, opt_state, loss = step_fn(params, opt_state, px, sp, lab, 0)
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["patch_embed"]["kernel"]), frozen_before
    )
    assert not np.array_equal(
        np.asarray(params["backbone"]["blocks_0"]["attn"]["qkv"]["lora_B"]), lora_before
    )


def test_unfreeze_blocks_updates_last_block(labeled_tree):
    base = LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))
    lora = apply_lora(base, rank=4, dropout=0.0)
    cfg = FinetuneConfig(rank=4, lr=1e-2, backbone_lr=1e-3, warmup_steps=0,
                         total_steps=10, batch_size=4, unfreeze_blocks=1)
    params = {"backbone": lora.params, "head": init_head(cfg, CFG.dim, jax.random.key(1))}
    b0 = np.asarray(params["backbone"]["blocks_0"]["mlp"]["fc1"]["kernel"])
    b1 = np.asarray(params["backbone"]["blocks_1"]["mlp"]["fc1"]["kernel"])
    tx = make_finetune_optimizer(cfg, lora.params, CFG.depth)
    opt_state = tx.init(params)
    step_fn, _ = build_finetune_step(lora, cfg, tx)
    rows = load_labeled_csv(labeled_tree)
    px, sp, lab = next(iter_labeled_batches(rows, 4, shuffle=True, seed=0, canvas=32))
    params, _, _ = step_fn(params, opt_state, px, sp, lab, 0)
    np.testing.assert_array_equal(np.asarray(params["backbone"]["blocks_0"]["mlp"]["fc1"]["kernel"]), b0)
    assert not np.array_equal(np.asarray(params["backbone"]["blocks_1"]["mlp"]["fc1"]["kernel"]), b1)


def test_finetune_learns_separable_task(labeled_tree):
    base = LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))
    lora = apply_lora(base, rank=4, dropout=0.0)
    cfg = FinetuneConfig(rank=4, lr=3e-3, warmup_steps=0, total_steps=30, batch_size=8)
    params = {"backbone": lora.params, "head": init_head(cfg, CFG.dim, jax.random.key(1))}
    tx = make_finetune_optimizer(cfg, lora.params, CFG.depth)
    opt_state = tx.init(params)
    step_fn, predict_fn = build_finetune_step(lora, cfg, tx)
    rows = load_labeled_csv(labeled_tree)
    batches = iter_labeled_batches(rows, 8, shuffle=True, seed=0, canvas=32)
    for step in range(30):
        px, sp, lab = next(batches)
        params, opt_state, loss = step_fn(params, opt_state, px, sp, lab, step)
    # evaluate on the training set (separable -> must fit)
    px, sp, lab = next(iter_labeled_batches(rows, 24, shuffle=False, seed=0, canvas=32))
    logits = np.asarray(predict_fn(params, px, sp))
    m = compute_metrics(logits, lab, "classification", 2)
    assert m["accuracy"] >= 0.9 and m["auroc"] >= 0.95


def test_save_finetune_formats(tmp_path, labeled_tree):
    base = LoadedModel(CFG, init_backbone(CFG, jax.random.key(0)))
    lora = apply_lora(base, rank=4, dropout=0.0)
    cfg = FinetuneConfig(rank=4, unfreeze_blocks=1)
    params = {"backbone": lora.params, "head": init_head(cfg, CFG.dim, jax.random.key(1))}
    out = save_finetune(lora, params, cfg, tmp_path / "ft")
    names = {p.name for p in out.iterdir()}
    assert {"adapter_model.safetensors", "adapter_config.json", "head.pth",
            "unfrozen_blocks.pth", "finetune_config.json"} <= names
    import torch

    head = torch.load(out / "head.pth", weights_only=True)
    assert head["weight"].shape == (2, 32)
    blocks = torch.load(out / "unfrozen_blocks.pth", weights_only=True)
    assert all(k.startswith("blocks.1.") for k in blocks)
