#!/usr/bin/env python
"""Visual QA of preprocessed slices (analog of reference
scripts/preprocessing/phase2_validate_samples.py): sample N slices from an
index, verify decode + value statistics, and write windowed 8-bit previews
for human inspection.

    python scripts/preprocessing/validate_samples.py --index idx.csv \\
        --out qa/ --n 16
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from PIL import Image

    from dinox_tpu.data.hu import decode_hu16, window
    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.data.pipeline import _read_png_u16

    rows = load_index_rows(args.index)
    rng = np.random.default_rng(args.seed)
    pick = rng.choice(len(rows), min(args.n, len(rows)), replace=False)
    args.out.mkdir(parents=True, exist_ok=True)

    report = []
    bad = 0
    for i in pick:
        r = rows[int(i)]
        try:
            u16 = _read_png_u16(r.png_path)
            hu = decode_hu16(u16)  # deci-HU
            stats = {
                "png_path": r.png_path,
                "shape": list(u16.shape),
                "hu_deci_min": float(hu.min()),
                "hu_deci_max": float(hu.max()),
                "hu_deci_mean": float(hu.mean()),
                "nonconstant": bool(hu.std() > 1e-6),
                "in_encodable_range": bool(-110.0 <= hu.min() and hu.max() <= 410.0),
            }
            ok = stats["nonconstant"] and stats["in_encodable_range"]
            stats["ok"] = ok
            bad += not ok
            preview = (window(hu, 40.0, 400.0) * 255).astype(np.uint8)
            Image.fromarray(preview).save(
                args.out / f"{Path(r.png_path).parent.name}_{Path(r.png_path).name}"
            )
        except Exception as e:  # noqa: BLE001
            stats = {"png_path": r.png_path, "ok": False, "error": str(e)}
            bad += 1
        report.append(stats)

    (args.out / "qa_report.json").write_text(json.dumps(report, indent=2))
    print(f"checked {len(report)} samples, {bad} bad -> {args.out}/qa_report.json", flush=True)
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
