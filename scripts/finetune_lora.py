#!/usr/bin/env python
"""Downstream LoRA fine-tuning CLI (analog of reference scripts/finetune_lora.py).

    python scripts/finetune_lora.py --backbone <ckpt|hub|run> \\
        --train-csv train.csv --val-csv val.csv --task classification \\
        --num-classes 2 --rank 8 --epochs 10 --out adapters/malignancy
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import (
    enable_compilation_cache,
    respect_jax_platforms_env,
)

respect_jax_platforms_env()
enable_compilation_cache()


import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", required=True, help="hub dir / .pth / run dir")
    p.add_argument("--train-csv", type=Path, required=True)
    p.add_argument("--val-csv", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--task", default="classification", choices=["classification", "regression"])
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--alpha", type=float, default=16.0)
    p.add_argument("--lora-dropout", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--backbone-lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--unfreeze-blocks", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--es-metric", default="loss",
                   choices=["loss", "accuracy", "auroc", "macro_f1", "r2", "mse"])
    p.add_argument("--es-patience", type=int, default=5)
    p.add_argument("--window-level", type=float, default=40.0,
                   help="HU window level in scaled deci-HU (lung: -30)")
    p.add_argument("--window-width", type=float, default=400.0,
                   help="HU window width in scaled deci-HU (lung: 120)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    from dinox_tpu.train.finetune import (
        EarlyStopper,
        FinetuneConfig,
        build_finetune_step,
        compute_metrics,
        init_head,
        iter_labeled_batches,
        load_labeled_csv,
        make_finetune_optimizer,
        save_finetune,
    )
    from dinox_tpu.zoo.peft import apply_lora, count_parameters

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from evaluate_panorgan import load_any_model

    base = load_any_model(args.backbone)
    train_rows = load_labeled_csv(args.train_csv, args.task)
    val_rows = load_labeled_csv(args.val_csv, args.task)
    print(f"train={len(train_rows)} val={len(val_rows)} "
          f"scale_aware={base.scale_aware} dim={base.dim}", flush=True)

    steps_per_epoch = max(1, len(train_rows) // args.batch_size)
    cfg = FinetuneConfig(
        task=args.task, num_classes=args.num_classes, rank=args.rank, alpha=args.alpha,
        lora_dropout=args.lora_dropout, lr=args.lr, backbone_lr=args.backbone_lr,
        weight_decay=args.weight_decay, warmup_steps=args.warmup_steps,
        total_steps=steps_per_epoch * args.epochs, unfreeze_blocks=args.unfreeze_blocks,
        batch_size=args.batch_size, seed=args.seed,
        es_metric=args.es_metric, es_patience=args.es_patience,
        window_level=args.window_level, window_width=args.window_width,
    )

    lora = apply_lora(base, rank=cfg.rank, alpha=cfg.alpha, dropout=cfg.lora_dropout)
    print(f"parameters: {count_parameters(lora)}", flush=True)
    params = {
        "backbone": lora.params,
        "head": init_head(cfg, base.dim, jax.random.key(args.seed)),
    }
    tx = make_finetune_optimizer(cfg, lora.params, base.cfg.depth)
    opt_state = tx.init(params)
    step_fn, predict_fn = build_finetune_step(lora, cfg, tx)

    def validate(params):
        logits, targets = [], []
        for px, sp, lab in iter_labeled_batches(
            val_rows, args.batch_size, shuffle=False, seed=0, canvas=args.canvas, epochs=1
        ):
            logits.append(np.asarray(predict_fn(params, px, sp)))
            targets.append(lab)
        logits = np.concatenate(logits)[: len(val_rows)]
        targets = np.concatenate(targets)[: len(val_rows)]
        m = compute_metrics(logits, targets, cfg.task, cfg.num_classes)
        if cfg.task == "classification":
            z = logits - logits.max(-1, keepdims=True)
            p = np.exp(z); p /= p.sum(-1, keepdims=True)
            m["loss"] = float(-np.log(p[np.arange(len(targets)), targets.astype(int)] + 1e-12).mean())
        else:
            m["loss"] = m["mse"]
        return m

    stopper = EarlyStopper(metric=cfg.es_metric, patience=cfg.es_patience)
    best_params = params
    history = []
    step = 0
    batches = iter_labeled_batches(
        train_rows, args.batch_size, shuffle=True, seed=args.seed, canvas=args.canvas
    )
    for epoch in range(args.epochs):
        t0 = time.monotonic()
        losses = []
        for _ in range(steps_per_epoch):
            px, sp, lab = next(batches)
            params, opt_state, loss = step_fn(params, opt_state, px, sp, lab, step)
            losses.append(float(loss))
            step += 1
        val = validate(params)
        improved, stop = stopper.update(val)
        if improved:
            best_params = jax.tree_util.tree_map(lambda x: x, params)
        history.append({"epoch": epoch, "train_loss": float(np.mean(losses)), **val})
        print(f"epoch={epoch} train_loss={np.mean(losses):.4f} "
              + " ".join(f"val_{k}={v:.4f}" for k, v in val.items())
              + f" wall_s={time.monotonic() - t0:.1f}"
              + (" *best*" if improved else ""), flush=True)
        if stop:
            print(f"early stopping at epoch {epoch} "
                  f"(no {cfg.es_metric} improvement for {cfg.es_patience} epochs)", flush=True)
            break

    out = save_finetune(lora, best_params, cfg, args.out)
    (out / "history.json").write_text(json.dumps(history, indent=2))
    print(f"saved adapter+head -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
