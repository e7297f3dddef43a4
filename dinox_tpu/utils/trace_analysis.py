"""Aggregate jax.profiler Chrome traces by HLO category — the TPU analog of
the reference's per-phase perf_counter segmentation
(reference scripts/tune_throughput.py:630-700), applied at the op level.

A `jax.profiler.start_trace` capture writes
``<dir>/plugins/profile/<ts>/<host>.trace.json.gz`` containing Chrome-trace
events; device-lane events carry ``args.hlo_category`` (XLA's op-class tag)
and ``dur`` in microseconds. Summing ``dur`` per category over a known number
of steps reproduces the tables in docs/PROFILING.md without TensorBoard.

Only TPU (and GPU) device lanes tag ops with ``hlo_category``; CPU-backend
traces carry ``hlo_op``/``hlo_module`` but no category, so aggregation over a
CPU capture legitimately returns an empty table.
"""

from __future__ import annotations

import gzip
import json
from collections import defaultdict
from pathlib import Path
from typing import Optional


def find_trace_files(trace_dir: str | Path) -> list[Path]:
    """All trace.json(.gz) files under a profiler output dir, newest first."""
    root = Path(trace_dir)
    files = sorted(root.rglob("*.trace.json.gz")) + sorted(root.rglob("*.trace.json"))
    return sorted(files, key=lambda p: p.stat().st_mtime, reverse=True)


def load_trace_events(path: str | Path) -> list[dict]:
    p = Path(path)
    raw = gzip.open(p, "rt") if p.suffix == ".gz" else open(p, "rt")
    with raw as f:
        doc = json.load(f)
    return doc.get("traceEvents", doc if isinstance(doc, list) else [])


def aggregate_by_category(
    events: list[dict], steps: Optional[int] = None
) -> dict[str, dict]:
    """Sum device-op duration per hlo_category.

    Returns {category: {"ms": total_ms, "ms_per_step": ..., "count": n}};
    ms_per_step present only when ``steps`` is given. Only complete-duration
    ('X') events that carry an hlo_category arg are device ops — host lanes
    and metadata events have none, so no pid filtering is needed.
    """
    total_us: dict[str, float] = defaultdict(float)
    count: dict[str, int] = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        total_us[cat] += float(ev.get("dur", 0.0))
        count[cat] += 1
    out: dict[str, dict] = {}
    for cat, us in sorted(total_us.items(), key=lambda kv: -kv[1]):
        row = {"ms": us / 1e3, "count": count[cat]}
        if steps:
            row["ms_per_step"] = us / 1e3 / steps
        out[cat] = row
    return out


def summarize_trace_dir(trace_dir: str | Path, steps: Optional[int] = None) -> dict:
    """Aggregate the newest trace file under ``trace_dir``."""
    files = find_trace_files(trace_dir)
    if not files:
        raise FileNotFoundError(f"no trace.json(.gz) under {trace_dir}")
    cats = aggregate_by_category(load_trace_events(files[0]), steps=steps)
    return {"trace_file": str(files[0]), "steps": steps, "categories": cats}


def format_category_table(cats: dict[str, dict], top: int = 12) -> str:
    lines = [f"{'hlo_category':<28} {'ms/step':>9} {'count':>7}"]
    for name, row in list(cats.items())[:top]:
        ms = row.get("ms_per_step", row["ms"])
        lines.append(f"{name:<28} {ms:>9.2f} {row['count']:>7}")
    return "\n".join(lines)
