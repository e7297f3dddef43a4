#!/usr/bin/env python
"""Convert an index.csv into a Parquet DataManifest (analog of reference
scripts/preprocessing/phase2_write_dataset_manifest.py) — the provenance-layer
entry point for merge/lineage tooling.

    python scripts/preprocessing/write_dataset_manifest.py --index idx.csv \\
        --dataset lidc-idri --out manifests/lidc.parquet [--organs lung]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", type=Path, required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--organs", nargs="*", default=[])
    args = p.parse_args(argv)

    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.zoo.manifest import DataManifest
    from dinox_tpu.zoo.schemas import SliceMetadata

    rows = load_index_rows(args.index)
    manifest = DataManifest(
        [
            SliceMetadata(
                dataset=args.dataset,
                series_id=r.series_dir,
                slice_idx=r.slice_index,
                pixel_spacing_x=r.spacing_x,
                pixel_spacing_y=r.spacing_y,
                slice_thickness=r.spacing_z,
                image_path=r.png_path,
                organs_present=list(args.organs),
            )
            for r in rows
        ]
    )
    manifest.save(args.out)
    stats = manifest.spacing_stats()
    print(f"{len(manifest)} records -> {args.out} "
          f"(spacing_x {stats.pixel_spacing_x_min:.3f}-{stats.pixel_spacing_x_max:.3f} mm)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
