#!/usr/bin/env python
"""Where does the dataset signal live: CLS token vs mean patch tokens?

Mechanism diagnostic for the round-5 signature-strength experiment. The
6-metric probe (and the reference's, scripts/evaluate_panorgan.py:313-416)
reads the CLS embedding — the token the DINO instance-discrimination head
optimizes. If the series-split dataset probe is high on MEAN PATCH tokens
while low on CLS, the signal was not destroyed by training; it was excluded
from the instance-level summary (actionable: domain/protocol tasks should
read patch tokens). One forward per batch; both pools probed.

    python scripts/round5_patch_probe.py --checkpoint data/runs/sig_200 \
        --index-csv data/synth_v2_eval_sig200/index.csv \
        --split-manifest data/synth_v2_eval_sig200/split_manifest.json \
        --out docs/round5/sig_200_patch_probe.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import enable_compilation_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--index-csv", type=Path, required=True)
    p.add_argument("--split-manifest", type=Path, required=True)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--max-slices", type=int, default=1200)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.evaluation.embedder import _l2n, _load_batches
    from dinox_tpu.evaluation.metrics import dataset_discrimination_probe
    from dinox_tpu.ops.augment import eval_transform

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from evaluate_panorgan import load_any_model

    model = load_any_model(args.checkpoint)
    rows = load_index_rows(args.index_csv)
    val = set(json.loads(args.split_manifest.read_text())["val"]["series_dir"])
    rows = [r for r in rows if r.series_dir in val][: args.max_slices]
    print(f"eval_rows={len(rows)}", flush=True)

    n_patches = model.cfg.n_patches
    cls_chunks, patch_chunks = [], []
    for pixels, spacing in _load_batches(rows, np.arange(len(rows)),
                                         args.canvas, args.batch_size):
        x = eval_transform(jnp.asarray(pixels), img_size=model.img_size)
        sp = jnp.asarray(spacing) if model.scale_aware else None
        feats = model(x, sp)  # (B, N, D): [CLS, patches..., registers]
        cls_chunks.append(np.asarray(feats[:, 0], np.float32))
        patch_chunks.append(
            np.asarray(jnp.mean(feats[:, 1:1 + n_patches], axis=1), np.float32))
    result = {"checkpoint": str(args.checkpoint), "n_slices": len(rows)}
    for name, chunks in (("cls", cls_chunks), ("mean_patch", patch_chunks)):
        emb = _l2n(np.concatenate(chunks))
        probe = dataset_discrimination_probe(emb, rows, seed=42)
        result[name] = {k: probe[k] for k in
                        ("accuracy", "auc", "knn_accuracy") if k in probe}
        print(f"{name}: {result[name]}", flush=True)
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
