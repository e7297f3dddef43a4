"""Downstream supervised fine-tuning: LoRA backbone + task head.

Library core for scripts/finetune_lora.py (analog of reference
scripts/finetune_lora.py): labeled-CSV data, single-view fixed-window device
transform (train: RandomResizedCrop 0.7-1.0 + flip; eval: resize+center-crop,
:173-197), classification/regression heads on the CLS token with the head
kept OUTSIDE the adapter for clean save/load (:250-280), optional partial
unfreezing of the last K blocks at a separate LR (:705-764), rank-based
AUROC / macro-F1 / R^2 metrics (:288-385), cosine+warmup schedule and
early stopping (:766-872).
"""

from __future__ import annotations

import csv
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dinox_tpu.data.hu import EVAL_LEVEL, EVAL_WIDTH
from dinox_tpu.ops.augment import AugConfig, augment_views, eval_transform
from dinox_tpu.zoo.peft import LoraModel

# -- labeled data -----------------------------------------------------------


@dataclass
class LabeledRow:
    image_path: str
    label: float
    spacing_x: float = 1.0
    spacing_y: float = 1.0
    spacing_z: float = 1.0


def load_labeled_csv(path: str | Path, task: str = "classification") -> list[LabeledRow]:
    """CSV with columns image_path,label[,spacing_x,spacing_y,spacing_z].

    Classification labels must be integers >= 0; regression labels floats.
    """
    rows: list[LabeledRow] = []
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        cols = reader.fieldnames or []
        if "image_path" not in cols or "label" not in cols:
            raise ValueError(f"{path}: need image_path,label columns, got {cols}")
        has_spacing = all(c in cols for c in ("spacing_x", "spacing_y", "spacing_z"))
        for rec in reader:
            label = float(rec["label"])
            if task == "classification" and label != int(label):
                raise ValueError(f"non-integer classification label: {rec['label']}")
            row = LabeledRow(image_path=rec["image_path"], label=label)
            if has_spacing:
                row.spacing_x = float(rec["spacing_x"])
                row.spacing_y = float(rec["spacing_y"])
                row.spacing_z = float(rec["spacing_z"])
            rows.append(row)
    return rows


def _read_u16(path: str, canvas: int) -> np.ndarray:
    from dinox_tpu.data.pipeline import _read_png_u16, _to_canvas

    return _to_canvas(_read_png_u16(path), canvas)


def iter_labeled_batches(
    rows: list[LabeledRow],
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    canvas: int = 512,
    epochs: Optional[int] = None,
) -> Iterable[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yields (pixels_u16 (B, canvas, canvas, 3), spacing (B, 3), labels (B,)).

    Single-slice inputs replicated to 3 channels (matches pretraining,
    reference :233-236). Partial final batches are padded by wrapping."""
    epoch = 0
    while epochs is None or epoch < epochs:
        order = (
            np.random.default_rng((seed, epoch)).permutation(len(rows))
            if shuffle
            else np.arange(len(rows))
        )
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            planes = [_read_u16(rows[i].image_path, canvas) for i in idx]
            pixels = np.stack([np.stack([p, p, p], axis=-1) for p in planes])
            spacing = np.asarray(
                [[rows[i].spacing_x, rows[i].spacing_y, rows[i].spacing_z] for i in idx],
                np.float32,
            )
            labels = np.asarray([rows[i].label for i in idx], np.float32)
            yield pixels, spacing, labels
        epoch += 1


def finetune_train_aug(
    img_size: int, level: float = EVAL_LEVEL, width: float = EVAL_WIDTH
) -> AugConfig:
    """Fixed HU window + RandomResizedCrop(0.7-1.0) + flip, one view.

    The window is configurable in scaled deci-HU units (reference
    scripts/finetune_lora.py window args; the LIDC malignancy benchmark uses
    the lung window level=-30 width=120, docs/EXPERIMENTS.md:307). Defaults
    to the L=40/W=400 soft-tissue eval window."""
    return AugConfig(
        img_size=img_size,
        level_min=level, level_max=level,
        width_min=width, width_max=width,
        crop_scale_min=0.7, crop_scale_max=1.0,
        n_views=1,
    )


# -- model + step -----------------------------------------------------------


@dataclass(frozen=True)
class FinetuneConfig:
    task: str = "classification"  # classification | regression
    num_classes: int = 2
    rank: int = 8
    alpha: float = 16.0
    lora_dropout: float = 0.05
    lr: float = 1e-4
    backbone_lr: float = 1e-5  # for unfrozen blocks
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 1000
    unfreeze_blocks: int = 0
    batch_size: int = 32
    seed: int = 0
    es_metric: str = "loss"  # loss | accuracy | auroc | macro_f1 | r2
    es_patience: int = 5
    window_level: float = EVAL_LEVEL  # scaled deci-HU (lung: -30)
    window_width: float = EVAL_WIDTH  # scaled deci-HU (lung: 120)


def init_head(cfg: FinetuneConfig, dim: int, rng: jax.Array) -> dict:
    out = 1 if cfg.task == "regression" else cfg.num_classes
    k1, _ = jax.random.split(rng)
    return {
        "kernel": jax.nn.initializers.lecun_normal()(k1, (dim, out), jnp.float32),
        "bias": jnp.zeros((out,), jnp.float32),
    }


def _param_labels(backbone_params: dict, cfg: FinetuneConfig, depth: int) -> dict:
    """Label tree for optax.multi_transform: adapter | unfrozen | frozen."""
    start = depth - min(cfg.unfreeze_blocks, depth)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if path and path[-1] in ("lora_A", "lora_B"):
            return "adapter"
        if path and path[0].startswith("blocks_") and int(path[0].split("_")[1]) >= start \
                and cfg.unfreeze_blocks > 0:
            return "unfrozen"
        return "frozen"

    return walk(backbone_params)


def make_finetune_optimizer(cfg: FinetuneConfig, backbone_params: dict, depth: int):
    def sched_for(base_lr):
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, cfg.warmup_steps, max(cfg.total_steps, cfg.warmup_steps + 1)
        )

    tx = optax.multi_transform(
        {
            "adapter": optax.adamw(sched_for(cfg.lr), weight_decay=cfg.weight_decay),
            "head": optax.adamw(sched_for(cfg.lr), weight_decay=cfg.weight_decay),
            "unfrozen": optax.adamw(sched_for(cfg.backbone_lr), weight_decay=cfg.weight_decay),
            "frozen": optax.set_to_zero(),
        },
        {"backbone": _param_labels(backbone_params, cfg, depth), "head": "head"},
    )
    return tx


@dataclass
class FinetuneState:
    params: dict  # {"backbone": ..., "head": ...}
    opt_state: Any
    step: int = 0


def build_finetune_step(model: LoraModel, cfg: FinetuneConfig, tx):
    """Jitted supervised step over (pixels u16, spacing, labels)."""
    from dinox_tpu.models.vit import PatchViT

    module = PatchViT(model.cfg)
    aug = finetune_train_aug(model.cfg.img_size, cfg.window_level, cfg.window_width)
    scale_aware = model.cfg.scale_aware
    base_key = jax.random.key(cfg.seed)

    def loss_fn(params, pixels, spacing, labels, step):
        key = jax.random.fold_in(base_key, step)
        x = augment_views(pixels, key, aug)[0]
        sp = spacing if scale_aware else None
        feats = module.apply(
            {"params": params["backbone"]}, x, sp, train=True,
            rngs={"dropout": jax.random.fold_in(key, 1)},
        )
        logits = feats[:, 0].astype(jnp.float32) @ params["head"]["kernel"] + params["head"]["bias"]
        if cfg.task == "classification":
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)
            ).mean()
        else:
            loss = jnp.mean((logits[:, 0] - labels) ** 2)
        return loss

    @jax.jit
    def step_fn(params, opt_state, pixels, spacing, labels, step):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixels, spacing, labels, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def predict_fn(params, pixels, spacing):
        x = eval_transform(
            pixels, img_size=model.cfg.img_size,
            level=cfg.window_level, width=cfg.window_width,
        )
        sp = spacing if scale_aware else None
        feats = module.apply({"params": params["backbone"]}, x, sp)
        return feats[:, 0].astype(jnp.float32) @ params["head"]["kernel"] + params["head"]["bias"]

    return step_fn, predict_fn


# -- metrics ----------------------------------------------------------------


def rank_auroc(scores: np.ndarray, targets: np.ndarray) -> float:
    """Tie-aware rank AUROC, sklearn-free (reference :288-323 semantics)."""
    pos = targets == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.5
    from scipy.stats import rankdata

    ranks = rankdata(scores)  # average ranks on ties
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def compute_metrics(
    logits: np.ndarray, targets: np.ndarray, task: str, num_classes: int
) -> dict[str, float]:
    out: dict[str, float] = {}
    if task == "classification":
        t = targets.astype(np.int64)
        pred = logits.argmax(axis=-1)
        out["accuracy"] = float((pred == t).mean()) if len(t) else 0.0
        if num_classes == 2:
            z = logits - logits.max(axis=-1, keepdims=True)
            probs = np.exp(z)
            probs /= probs.sum(axis=-1, keepdims=True)
            out["auroc"] = rank_auroc(probs[:, 1], t)
        f1s = []
        for c in range(num_classes):
            if not (t == c).any():
                continue
            tp = float(((pred == c) & (t == c)).sum())
            fp = float(((pred == c) & (t != c)).sum())
            fn = float(((pred != c) & (t == c)).sum())
            prec = tp / (tp + fp + 1e-8)
            rec = tp / (tp + fn + 1e-8)
            f1s.append(2 * prec * rec / (prec + rec + 1e-8))
        out["macro_f1"] = float(np.mean(f1s)) if f1s else 0.0
    else:
        p = logits[:, 0]
        mse = float(np.mean((p - targets) ** 2))
        out["mse"] = mse
        out["rmse"] = float(np.sqrt(mse))
        ss_tot = float(((targets - targets.mean()) ** 2).sum())
        out["r2"] = 1.0 - float(((p - targets) ** 2).sum()) / ss_tot if ss_tot > 1e-8 else 0.0
    return out


# -- early stopping ---------------------------------------------------------


@dataclass
class EarlyStopper:
    metric: str = "loss"
    patience: int = 5
    best: float = field(default=float("inf"))
    bad_epochs: int = 0

    def _score(self, metrics: dict[str, float]) -> float:
        v = metrics[self.metric]
        return v if self.metric in ("loss", "mse", "rmse") else -v  # lower better

    def update(self, metrics: dict[str, float]) -> tuple[bool, bool]:
        """Returns (improved, should_stop)."""
        s = self._score(metrics)
        if s < self.best - 1e-9:
            self.best = s
            self.bad_epochs = 0
            return True, False
        self.bad_epochs += 1
        return False, self.bad_epochs >= self.patience


# -- save -------------------------------------------------------------------


def save_finetune(
    model: LoraModel,
    params: dict,
    cfg: FinetuneConfig,
    output_dir: str | Path,
) -> Path:
    """adapter (HF peft format) + head.pth + unfrozen_blocks.pth +
    finetune_config.json (reference :488-531)."""
    import json

    import torch

    from dinox_tpu.zoo.interop import jax_to_torch_backbone
    from dinox_tpu.zoo.peft import save_adapter

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_adapter(LoraModel(model.cfg, params["backbone"]), out)
    head = params["head"]
    torch.save(
        {
            "weight": torch.from_numpy(np.array(np.asarray(head["kernel"], np.float32).T, order="C")),
            "bias": torch.from_numpy(np.asarray(head["bias"], np.float32).copy()),
        },
        out / "head.pth",
    )
    if cfg.unfreeze_blocks > 0:
        depth = model.cfg.depth
        start = depth - min(cfg.unfreeze_blocks, depth)
        # strip lora factors; export unfrozen blocks in torch layout
        def strip(t):
            if isinstance(t, dict):
                return {k: strip(v) for k, v in t.items() if k not in ("lora_A", "lora_B")}
            return t

        full_sd = jax_to_torch_backbone(
            {k: strip(v) for k, v in params["backbone"].items() if k.startswith("blocks_")
             and int(k.split("_")[1]) >= start}
        )
        torch.save(
            {k: torch.from_numpy(np.array(v, order="C")) for k, v in full_sd.items()},
            out / "unfrozen_blocks.pth",
        )
    (out / "finetune_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
    )
    return out
