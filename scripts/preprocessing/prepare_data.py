#!/usr/bin/env python
"""End-to-end MVP data preparation orchestrator (analog of reference
scripts/preprocessing/mvp_prepare_data.py): per-dataset preprocess ->
combined index -> split manifest -> Parquet manifests, in one command.

    python scripts/preprocessing/prepare_data.py --out data/processed \\
        --dicom lidc=/raw/LIDC --nifti colon=/raw/Task10/imagesTr \\
        [--dry-run]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dinox_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

HERE = Path(__file__).resolve().parent


def run(script: str, *args) -> None:
    cmd = [sys.executable, str(HERE / script), *map(str, args)]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--dicom", nargs="*", default=[], help="name=src pairs")
    p.add_argument("--nifti", nargs="*", default=[], help="name=src pairs")
    p.add_argument("--dry-run", action="store_true",
                   help="synthetic volumes instead of real sources")
    p.add_argument("--val-fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    sources = [("dicom", s) for s in args.dicom] + [("nifti", s) for s in args.nifti]
    if args.dry_run and not sources:
        sources = [("dicom", "dryrun_a="), ("dicom", "dryrun_b=")]
    if not sources:
        print("error: no sources (use --dicom/--nifti name=path or --dry-run)",
              file=sys.stderr)
        return 2

    index_specs = []
    for kind, spec in sources:
        name, _, src = spec.partition("=")
        ds_out = args.out / name
        if kind == "dicom":
            cmd_args = ["--out", ds_out, "--dataset", name]
            if args.dry_run or not src:
                cmd_args.append("--dry-run")
            else:
                cmd_args += ["--src", src]
            run("preprocess_dicom.py", *cmd_args)
        else:
            run("preprocess_nifti.py", "--src", src, "--out", ds_out, "--dataset", name)
        index_specs.append(f"{name}={ds_out / '_index' / 'index.csv'}")
        run("write_dataset_manifest.py", "--index", ds_out / "_index" / "index.csv",
            "--dataset", name, "--out", args.out / "manifests" / f"{name}.parquet")

    combined = args.out / "_index" / "index.csv"
    combined.parent.mkdir(parents=True, exist_ok=True)
    run("combine_indices.py", *index_specs, "--out", combined)
    run("make_split_manifest.py", "--index", combined,
        "--out", args.out / "split_manifest.json",
        "--val-fraction", args.val_fraction, "--seed", args.seed)
    run("validate_samples.py", "--index", combined, "--out", args.out / "qa", "--n", "8")
    print(f"data ready: {combined}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
