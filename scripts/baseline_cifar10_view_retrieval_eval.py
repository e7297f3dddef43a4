#!/usr/bin/env python
"""CIFAR view-retrieval analog (reference
scripts/baseline_cifar10_view_retrieval_eval.py): embed two augmented views
of N test images, top-1 NN match vs chance; exit 2 below the ratio gate.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()


import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-dir", type=Path, default=None)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--min-ratio", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dinox_tpu.data.cifar import load_cifar10
    from dinox_tpu.evaluation.metrics import view_retrieval
    from dinox_tpu.ops.augment_rgb import RgbAugConfig, augment_rgb_views
    from dinox_tpu.train.run_export import load_backbone_from_run

    model = load_backbone_from_run(args.checkpoint)
    _, _, x_te, _, real = load_cifar10(args.data_dir)
    rng = np.random.default_rng(args.seed)
    n = min(args.n, len(x_te))
    pick = rng.choice(len(x_te), n, replace=False)
    cfg = RgbAugConfig(img_size=model.img_size)
    views = augment_rgb_views(jnp.asarray(x_te[pick]), jax.random.key(args.seed), cfg)

    def embed(x):
        e = np.asarray(model(x)[:, 0], np.float32)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    res = view_retrieval(embed(views[0]), embed(views[1]))
    res["passed"] = bool(res["ratio_vs_random"] >= args.min_ratio)
    res["real_cifar"] = bool(real)
    if args.out:
        args.out.write_text(json.dumps(res, indent=2))
    print(json.dumps(res), flush=True)
    return 0 if res["passed"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
