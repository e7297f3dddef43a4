#!/usr/bin/env python
"""NIfTI volumes -> 16-bit HU PNG slice tree + index.csv (analog of reference
scripts/preprocessing/phase2_preprocess_nifti.py, the MSD-dataset path).
Same output format as preprocess_dicom.py; spacing from the NIfTI pixdim.

    python scripts/preprocessing/preprocess_nifti.py \\
        --src Task10_Colon/imagesTr --out data/processed/msd_colon \\
        --dataset msd-colon
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np

HU_CLIP = (-1000.0, 4000.0)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--max-volumes", type=int, default=None)
    args = p.parse_args(argv)

    from PIL import Image

    from dinox_tpu.data.hu import encode_hu16
    from dinox_tpu.data.nifti import read_nifti

    vols = sorted(
        f for f in args.src.rglob("*.nii*") if not f.name.startswith("._")
    )
    if args.max_volumes:
        vols = vols[: args.max_volumes]
    print(f"found {len(vols)} volumes", flush=True)

    rows: list[dict] = []
    for i, f in enumerate(vols):
        try:
            vol = read_nifti(f)
        except Exception as e:  # noqa: BLE001
            print(f"skip {f}: {e}", file=sys.stderr)
            continue
        stem = f.name.split(".")[0]
        series_dir = args.out / args.dataset / stem
        series_dir.mkdir(parents=True, exist_ok=True)
        sx, sy, sz = vol.spacing
        for z in range(vol.n_slices):
            png = series_dir / f"{z:04d}.png"
            if not png.exists():
                hu = np.clip(vol.slice_hu(z), *HU_CLIP)
                Image.fromarray(encode_hu16(hu)).save(png)
            rows.append(dict(
                png_path=str(png), series_dir=str(series_dir.relative_to(args.out)),
                slice_index=z, encoding="hu16",
                spacing_x=sx, spacing_y=sy, spacing_z=sz, dataset=args.dataset,
            ))
        print(f"[{i + 1}/{len(vols)}] {stem}: {vol.n_slices} slices", flush=True)

    index = args.out / "_index" / "index.csv"
    index.parent.mkdir(parents=True, exist_ok=True)
    with open(index, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"{len(rows)} slices -> {index}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
