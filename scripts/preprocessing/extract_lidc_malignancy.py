#!/usr/bin/env python
"""Build the LIDC nodule-malignancy LoRA benchmark (analog of reference
scripts/preprocessing/extract_lidc_malignancy.py): nodule-centered crops +
patient-stratified train/val/test CSVs for scripts/finetune_lora.py.

The reference reads annotations via the pylidc library (absent here); this
version consumes a generic annotations CSV with columns
``series_dir,slice_index,center_x,center_y,malignancy,patient_id``
(malignancy 1-5; nodules with median score 3 are dropped, >3 -> label 1,
<3 -> label 0 — the standard LIDC binarization).

    python scripts/preprocessing/extract_lidc_malignancy.py \\
        --index idx.csv --annotations nodules.csv --out data/malignancy \\
        --crop 64
"""

from __future__ import annotations

import argparse
import csv
import random
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", type=Path, required=True)
    p.add_argument("--annotations", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--val-fraction", type=float, default=0.15)
    p.add_argument("--test-fraction", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from PIL import Image

    from dinox_tpu.data.index import SeriesMap, load_index_rows
    from dinox_tpu.data.pipeline import _read_png_u16

    rows = load_index_rows(args.index)
    smap = SeriesMap.build(rows)

    with open(args.annotations, newline="") as f:
        annos = list(csv.DictReader(f))

    half = args.crop // 2
    samples: list[dict] = []
    args.out.mkdir(parents=True, exist_ok=True)
    for i, a in enumerate(annos):
        mal = float(a["malignancy"])
        if mal == 3:  # indeterminate — dropped
            continue
        label = 1 if mal > 3 else 0
        series = a["series_dir"]
        z = int(a["slice_index"])
        row = smap.by_series.get(series, {}).get(z)
        if row is None:
            continue
        img = _read_png_u16(row.png_path)
        cy, cx = int(float(a["center_y"])), int(float(a["center_x"]))
        top = np.clip(cy - half, 0, max(img.shape[0] - args.crop, 0))
        left = np.clip(cx - half, 0, max(img.shape[1] - args.crop, 0))
        crop = img[top : top + args.crop, left : left + args.crop]
        out_png = args.out / "crops" / f"nodule_{i:05d}.png"
        out_png.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(crop).save(out_png)
        samples.append(dict(
            image_path=str(out_png), label=label,
            spacing_x=row.spacing_x, spacing_y=row.spacing_y, spacing_z=row.spacing_z,
            patient_id=a.get("patient_id") or series,
        ))

    # patient-stratified split: a patient's nodules never straddle splits
    by_patient: dict[str, list[dict]] = defaultdict(list)
    for s in samples:
        by_patient[s["patient_id"]].append(s)
    patients = sorted(by_patient)
    random.Random(args.seed).shuffle(patients)
    n = len(patients)
    n_test = max(1, int(n * args.test_fraction)) if n > 2 else 0
    n_val = max(1, int(n * args.val_fraction)) if n > 1 else 0
    splits = {
        "test": patients[:n_test],
        "val": patients[n_test : n_test + n_val],
        "train": patients[n_test + n_val :],
    }
    fields = ["image_path", "label", "spacing_x", "spacing_y", "spacing_z"]
    for split, plist in splits.items():
        recs = [s for pt in plist for s in by_patient[pt]]
        with open(args.out / f"{split}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            w.writeheader()
            w.writerows(recs)
        pos = sum(r["label"] for r in recs)
        print(f"{split}: {len(recs)} nodules ({pos} malignant) from {len(plist)} patients",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
