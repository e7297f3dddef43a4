"""--stop-after seam continuity: a run split across restarts with a fixed
--max-steps schedule horizon must reproduce the uninterrupted run exactly.

This is the invariant the round-5 ops soak rests on (one 30K-step run
executed as 3x10K legs, reference analog: the multi-day-run rehearsal of
/root/reference/scripts/integration_canary.py:189-272). The first soak
attempt passed a per-leg --max-steps, which moved the cosine LR horizon at
every seam and produced an LR jump masquerading as a resume bug; the fix
(--stop-after stops early while --max-steps pins the horizon) is what this
test certifies at vit-tiny scale: identical lr sequence and losses across
the seam versus a straight-through run.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    return env


def _run(run_dir, extra):
    cmd = [
        sys.executable, str(REPO / "scripts" / "pretrain.py"),
        "--config", "vit-tiny", "--synthetic-device-batches", "2",
        "--run-dir", str(run_dir), "--batch-size", "8",
        "--img-size", "56", "--canvas", "64", "--max-steps", "6",
        "--warmup-steps", "2", "--lr", "5e-4", "--seed", "7",
        "--scale-aware", "--log-json", "--no-tensorboard",
        "--ckpt-every", "3", "--attn-impl", "xla",
    ] + extra
    proc = subprocess.run(cmd, env=_env(), cwd=REPO, capture_output=True,
                          text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]


def _metrics(run_dir):
    recs = [json.loads(ln) for ln in
            (run_dir / "metrics.jsonl").read_text().splitlines()]
    return {r["step"]: r for r in recs}


def test_stop_after_resume_matches_uninterrupted(tmp_path):
    straight = tmp_path / "straight"
    _run(straight, [])
    ref = _metrics(straight)
    assert sorted(ref) == [1, 2, 3, 4, 5, 6]

    split = tmp_path / "split"
    _run(split, ["--stop-after", "3"])
    leg1 = _metrics(split)
    assert sorted(leg1) == [1, 2, 3], "leg 1 must stop at --stop-after"

    _run(split, ["--resume", str(split)])
    got = _metrics(split)
    assert sorted(got) == [1, 2, 3, 4, 5, 6]

    # Schedule continuity: the LR sequence is the straight run's, bit-exact —
    # the horizon stayed at --max-steps 6 across the restart.
    for s in range(1, 7):
        assert got[s]["lr"] == ref[s]["lr"], (s, got[s]["lr"], ref[s]["lr"])

    # Resume determinism: the post-seam losses match the uninterrupted run.
    for s in range(4, 7):
        np.testing.assert_allclose(got[s]["loss"], ref[s]["loss"],
                                   rtol=1e-5, err_msg=f"step {s}")
