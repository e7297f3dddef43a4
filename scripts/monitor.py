#!/usr/bin/env python
"""Out-of-process training health monitor (analog of reference
scripts/phase5_monitor.py): point it at a run directory while training runs;
it loads the latest checkpoint, embeds a fixed probe batch, computes collapse
statistics (embedding std / norm, Gram mean) and renders an attention-energy
heatmap — stats.json + heatmap.png in the run dir.

    python scripts/monitor.py --run-dir data/runs/mvp [--index-csv idx.csv] \\
        [--watch 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()


import numpy as np


def probe_batch(args):
    """Fixed probe inputs: first val rows if an index is given, else a
    deterministic synthetic batch."""
    if args.index_csv and Path(args.index_csv).exists():
        from dinox_tpu.data.index import load_index_rows
        from dinox_tpu.data.pipeline import SliceStackSource

        rows = load_index_rows(args.index_csv)[: args.n]
        src = SliceStackSource(rows, canvas=args.canvas)
        pixels = np.stack([src.get(i)[0] for i in range(len(rows))])
        spacing = np.asarray(
            [[r.spacing_x, r.spacing_y, r.spacing_z] for r in rows], np.float32
        )
        return pixels, spacing
    rng = np.random.default_rng(0)
    return (
        rng.integers(25000, 41000, (args.n, args.canvas, args.canvas, 3), dtype=np.uint16),
        rng.uniform(0.4, 3.0, (args.n, 3)).astype(np.float32),
    )


def snapshot(args) -> dict:
    import jax.numpy as jnp

    from dinox_tpu.ops.augment import eval_transform
    from dinox_tpu.train.losses import gram_matrix
    from dinox_tpu.train.run_export import load_backbone_from_run, load_state_from_run

    # host=True: the monitor runs alongside training on the same chip — only
    # the backbone (via load_backbone_from_run) should ever touch HBM.
    state, cfg, meta = load_state_from_run(args.run_dir, host=True)
    model = load_backbone_from_run(args.run_dir)
    pixels, spacing = probe_batch(args)
    x = eval_transform(jnp.asarray(pixels), img_size=model.img_size)
    feats = np.asarray(model(x, jnp.asarray(spacing) if model.scale_aware else None))

    cls = feats[:, 0]
    patches = feats[:, 1 : 1 + (model.img_size // model.patch) ** 2]
    gram = np.asarray(gram_matrix(jnp.asarray(patches[: min(8, len(patches))])))

    stats = {
        "step": int(meta["step"]),
        "embed_std": float(cls.std(axis=0).mean()),
        "embed_norm_mean": float(np.linalg.norm(cls, axis=-1).mean()),
        "gram_mean": float(gram.mean()),
        "collapse_warning": bool(cls.std(axis=0).mean() < 0.01),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    (Path(args.run_dir) / "stats.json").write_text(json.dumps(stats, indent=2))

    # attention-energy heatmap: per-patch token L2 norms of the first sample
    side = model.img_size // model.patch
    energy = np.linalg.norm(patches[0], axis=-1).reshape(side, side)
    energy = (energy - energy.min()) / max(float(np.ptp(energy)), 1e-9)
    from PIL import Image

    img = Image.fromarray((energy * 255).astype(np.uint8)).resize((224, 224), Image.NEAREST)
    img.save(Path(args.run_dir) / "heatmap.png")
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--index-csv", type=Path, default=None)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--watch", type=int, default=0,
                   help="re-check every N seconds (0 = once)")
    args = p.parse_args(argv)

    while True:
        try:
            stats = snapshot(args)
            print(json.dumps(stats), flush=True)
            if stats["collapse_warning"]:
                print("WARNING: possible embedding collapse", flush=True)
        except FileNotFoundError as e:
            print(f"no checkpoint yet: {e}", flush=True)
        if not args.watch:
            return 0
        time.sleep(args.watch)


if __name__ == "__main__":
    raise SystemExit(main())
