#!/usr/bin/env python
"""Frozen-backbone linear probe on CIFAR-10 (analog of reference
scripts/baseline_cifar10_linear_probe.py). PASS gate: top-1 >= 0.70 on real
CIFAR (the reference's :57); exit code 2 on failure.
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
    p.add_argument("--checkpoint", required=True, help="run dir from cifar pretrain")
    p.add_argument("--data-dir", type=Path, default=None)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--pass-threshold", type=float, default=0.70)
    p.add_argument("--max-train", type=int, default=20000)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from dinox_tpu.data.cifar import load_cifar10
    from dinox_tpu.ops.augment_rgb import cifar_eval_transform
    from dinox_tpu.train.run_export import load_backbone_from_run

    model = load_backbone_from_run(args.checkpoint)
    x_tr, y_tr, x_te, y_te, real = load_cifar10(args.data_dir)
    if len(x_tr) > args.max_train:
        keep = np.random.default_rng(0).choice(len(x_tr), args.max_train, replace=False)
        x_tr, y_tr = x_tr[keep], y_tr[keep]

    def embed(images):
        out = []
        for s in range(0, len(images), args.batch_size):
            x = cifar_eval_transform(jnp.asarray(images[s : s + args.batch_size]))
            out.append(np.asarray(model(x)[:, 0], np.float32))
        e = np.concatenate(out)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    from sklearn.linear_model import LogisticRegression

    e_tr, e_te = embed(x_tr), embed(x_te)
    clf = LogisticRegression(max_iter=2000, C=10.0)
    clf.fit(e_tr, y_tr)
    acc = float((clf.predict(e_te) == y_te).mean())
    passed = acc >= args.pass_threshold
    result = {
        "top1": acc,
        "pass_threshold": args.pass_threshold,
        "passed": bool(passed),
        "real_cifar": bool(real),
        "n_train": len(x_tr),
        "n_test": len(x_te),
    }
    if args.out:
        args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result), flush=True)
    print(f"{'PASS' if passed else 'FAIL'}: top1={acc:.4f} (gate {args.pass_threshold})",
          flush=True)
    return 0 if passed else 2


if __name__ == "__main__":
    raise SystemExit(main())
