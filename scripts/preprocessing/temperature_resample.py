"""Temperature-resample a combined index CSV across its datasets.

CLI analog of the inline T=2.0 resampling step in the reference's
5-dataset index builder (scripts/preprocessing/phase3_build_5dataset_index.sh:71-114):
per-dataset quotas follow n_d^(1/T) temperature weights over the raw sizes,
small datasets are oversampled (with replacement) and large ones subsampled,
and the resampled rows are shuffled into one training index. The quota math
is shared with the framework's DatasetMerger (dinox_tpu/zoo/merge.py) so the
offline CLI and the in-process merge path cannot drift.

    python scripts/preprocessing/temperature_resample.py \
        --index combined.csv --out combined_t2.csv --temperature 2.0
"""

from __future__ import annotations

import argparse
import random
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from dinox_tpu.data.index import load_index_rows, write_index_rows
from dinox_tpu.zoo.merge import _allocate_quotas, temperature_weights


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, help="combined index.csv with a dataset column")
    p.add_argument("--out", required=True)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--total", type=int, default=0,
                   help="total resampled rows (default: same as input)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    rows = load_index_rows(args.index)
    by_ds: dict[str, list] = defaultdict(list)
    for r in rows:
        by_ds[r.dataset or "unknown"].append(r)
    names = sorted(by_ds)
    sizes = [len(by_ds[n]) for n in names]
    total = args.total or len(rows)
    weights = temperature_weights(sizes, args.temperature)
    quotas = _allocate_quotas(total, weights)

    rng = random.Random(args.seed)
    out_rows = []
    print(f"raw slices: {len(rows)}  T={args.temperature}  target total: {total}")
    for name, size, quota in zip(names, sizes, quotas):
        src = by_ds[name]
        if quota <= size:
            sampled = rng.sample(src, quota)
        else:  # oversample small datasets with replacement
            sampled = list(src) + rng.choices(src, k=quota - size)
        print(f"  {name}: {size} -> {len(sampled)} ({len(sampled) / size:.2f}x)")
        out_rows.extend(sampled)
    rng.shuffle(out_rows)
    write_index_rows(out_rows, args.out)
    print(f"wrote {len(out_rows)} rows -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
