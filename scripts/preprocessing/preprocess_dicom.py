#!/usr/bin/env python
"""DICOM series -> 16-bit HU PNG slice tree + index.csv (analog of reference
scripts/preprocessing/phase2_preprocess_lidc_idri.py).

Behavioral parity: HU clip [-1000, 4000]; storage ``uint16 = round(HU) + 32768``;
z-sort by ImagePositionPatient with median-delta z-spacing (more reliable than
the SliceThickness tag); RescaleSlope/Intercept applied; incremental
skip-if-exists; ``--dry-run`` writes a synthetic volume instead of reading
DICOM.

    python scripts/preprocessing/preprocess_dicom.py --src /data/raw/LIDC \\
        --out data/processed/lidc --dataset lidc-idri
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np

HU_CLIP = (-1000.0, 4000.0)


def find_series(src: Path) -> dict[str, list[Path]]:
    """Group .dcm files by SeriesInstanceUID (header-only reads)."""
    from dinox_tpu.data.dicom import read_dicom

    series: dict[str, list[Path]] = defaultdict(list)
    for f in sorted(src.rglob("*.dcm")):
        try:
            ds = read_dicom(f, stop_before_pixels=True)
        except Exception as e:  # noqa: BLE001
            print(f"skip {f}: {e}", file=sys.stderr)
            continue
        series[ds.series_uid or f.parent.name].append(f)
    return series


def process_series(uid: str, files: list[Path], out_root: Path, dataset: str,
                   rows: list[dict]) -> None:
    from PIL import Image

    from dinox_tpu.data.dicom import read_dicom
    from dinox_tpu.data.hu import encode_hu16

    slices = []
    for f in files:
        ds = read_dicom(f)
        slices.append((ds.image_position_z, ds))
    slices.sort(key=lambda t: t[0])

    # median z-delta beats the SliceThickness tag for spacing_z
    zs = [z for z, _ in slices]
    dz = float(np.median(np.abs(np.diff(zs)))) if len(zs) > 1 else slices[0][1].slice_thickness
    if dz <= 0:
        dz = slices[0][1].slice_thickness

    series_dir = out_root / dataset / uid.replace(".", "_")
    series_dir.mkdir(parents=True, exist_ok=True)
    for idx, (_z, ds) in enumerate(slices):
        png = series_dir / f"{idx:04d}.png"
        if not png.exists():
            hu = np.clip(ds.hu(), *HU_CLIP)
            Image.fromarray(encode_hu16(hu)).save(png)
        sx, sy = ds.pixel_spacing
        rows.append(dict(
            png_path=str(png), series_dir=str(series_dir.relative_to(out_root)),
            slice_index=idx, encoding="hu16",
            spacing_x=sx, spacing_y=sy, spacing_z=dz, dataset=dataset,
        ))


def synthetic_series(out_root: Path, dataset: str, rows: list[dict], seed=0) -> None:
    from PIL import Image

    from dinox_tpu.data.hu import encode_hu16

    rng = np.random.default_rng(seed)
    series_dir = out_root / dataset / "dryrun_series"
    series_dir.mkdir(parents=True, exist_ok=True)
    for idx in range(8):
        hu = np.clip(rng.normal(-100, 300, (64, 64)), *HU_CLIP)
        png = series_dir / f"{idx:04d}.png"
        Image.fromarray(encode_hu16(hu)).save(png)
        rows.append(dict(
            png_path=str(png), series_dir=str(series_dir.relative_to(out_root)),
            slice_index=idx, encoding="hu16",
            spacing_x=0.7, spacing_y=0.7, spacing_z=1.0, dataset=dataset,
        ))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", type=Path, default=None, help="DICOM tree root")
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--dry-run", action="store_true", help="synthetic volume, no DICOM needed")
    p.add_argument("--max-series", type=int, default=None)
    args = p.parse_args(argv)

    rows: list[dict] = []
    if args.dry_run:
        synthetic_series(args.out, args.dataset, rows)
    else:
        if args.src is None:
            print("error: --src required unless --dry-run", file=sys.stderr)
            return 2
        series = find_series(args.src)
        print(f"found {len(series)} series", flush=True)
        for i, (uid, files) in enumerate(sorted(series.items())):
            if args.max_series and i >= args.max_series:
                break
            process_series(uid, files, args.out, args.dataset, rows)
            print(f"[{i + 1}/{len(series)}] {uid}: {len(files)} slices", flush=True)

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
