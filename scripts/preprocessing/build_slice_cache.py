#!/usr/bin/env python
"""Build the write-once decoded-slice memmap cache for an index tree.

One sequential decode pass turns every later epoch's zlib inflate into a
page-cache memcpy (dinox_tpu/data/slice_cache.py — the production fix for
the 1-core host decode ceiling; the reference's answer is more DataLoader
worker processes, scripts/phase5_big_run.py:1577-1587).

    python scripts/preprocessing/build_slice_cache.py \\
        --index-csv data/synth_v2_train512/index.csv --canvas 512
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import logging

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index-csv", type=Path, required=True)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--force", action="store_true",
                   help="rebuild even if a cache is already present")
    args = p.parse_args(argv)

    from dinox_tpu.data.index import load_index_rows
    from dinox_tpu.data.slice_cache import build_slice_cache

    rows = load_index_rows(args.index_csv)
    path = build_slice_cache(rows, args.canvas, args.index_csv.parent,
                             workers=args.workers, force=args.force)
    print(f"cache: {path} ({path.stat().st_size / 1e9:.2f} GB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
