#!/usr/bin/env python
"""Resume-seam continuity analysis for a chained-restart run (round-5 ops
soak, VERDICT r4 #6).

Reads a run's metrics.jsonl and, for each declared seam step, compares the
last K logged losses before the seam with the first K after it, plus the lr
on both sides — a seam is clean when the loss jump ratio is ~1 within
trailing noise AND the lr continues the same schedule (the failure mode the
first soak attempt self-inflicted was an lr discontinuity from a per-leg
--max-steps; see scripts/round5_queue_c.sh).

    python scripts/soak_seam_analysis.py --run data/runs/soak_30k \
        --seams 10000 20000 --out docs/round5/soak_analysis.json
"""

from __future__ import annotations

import argparse
import json
import statistics
from pathlib import Path


def analyze(run: Path, seams: list[int], k: int = 5) -> dict:
    recs: list[dict] = []
    for line in (run / "metrics.jsonl").read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "loss" in r and "step" in r:
            recs.append(r)
    recs.sort(key=lambda r: int(r["step"]))
    losses = [(int(r["step"]), float(r["loss"])) for r in recs]
    lrs = [(int(r["step"]), float(r["lr"])) for r in recs if "lr" in r]

    out: dict = {"n_logged": len(recs), "seams": []}
    for seam in seams:
        before = [l for s, l in losses if s <= seam][-k:]
        after = [l for s, l in losses if s > seam][:k]
        if not before or not after:
            out["seams"].append({"step": seam, "status": "missing data"})
            continue
        mb, ma = statistics.mean(before), statistics.mean(after)
        # trailing noise scale: stdev of the 50 losses before the seam, so
        # the jump is judged against the run's own converged jitter
        trail = [l for s, l in losses if s <= seam][-50:]
        noise = statistics.stdev(trail) if len(trail) > 1 else 0.0
        lr_b = [v for s, v in lrs if s <= seam][-1:]
        lr_a = [v for s, v in lrs if s > seam][:1]
        row = {
            "step": seam,
            "mean_loss_before": round(mb, 5),
            "mean_loss_after": round(ma, 5),
            "jump_ratio": round(ma / max(mb, 1e-9), 4),
            "jump_in_noise_units": round((ma - mb) / max(noise, 1e-9), 2),
            "trailing_noise_std": round(noise, 5),
        }
        if lr_b and lr_a:
            row["lr_before"] = lr_b[0]
            row["lr_after"] = lr_a[0]
            row["lr_ratio"] = round(lr_a[0] / max(lr_b[0], 1e-12), 4)
        out["seams"].append(row)
    if losses:
        out["final_step"], out["final_loss"] = losses[-1]
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", type=Path, required=True)
    p.add_argument("--seams", type=int, nargs="+", default=[10000, 20000])
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)
    out = analyze(args.run, args.seams, args.k)
    text = json.dumps(out, indent=2)
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
