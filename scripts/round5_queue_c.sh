#!/usr/bin/env bash
# Round-5 chip queue C: ops soak (VERDICT r4 #6) — one 30K-step production
# run executed as 3 x 10K with deliberate restarts and --resume auto,
# watchdog armed, monitor + TB images on, anomaly knobs at production
# values; then a seam-continuity analysis from the JSONL logs.
# Usage: bash scripts/round5_queue_c.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round5/queue_c.log
mkdir -p docs/round5 data/runs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

RUN=data/runs/soak_30k
COMMON=(
  --config vit-small --scale-aware
  --synthetic-device-batches 24 --synthetic-datasets 5
  --batch-size 96
  --log-json --ckpt-every 2500 --ckpt-keep-last 2 --ckpt-timeout 900
  --monitor-every 1000
)

leg() {
  # One interrupted slice of a single 30K-step run: every leg carries the
  # SAME --max-steps 30000 schedule horizon and stops early via
  # --stop-after, so the LR schedule is identical across restarts and any
  # seam discontinuity is attributable to resume itself (a per-leg
  # --max-steps would change the cosine horizon at each seam — an LR jump
  # the first version of this script self-inflicted).
  local n=$1 target=$2
  note "=== soak leg $n -> step $target (deliberate restart boundary)"
  local resume=()
  [ -d "$RUN/ckpt" ] && resume=(--resume "$RUN")
  timeout 5400 python scripts/pretrain.py "${COMMON[@]}" --max-steps 30000 \
    --stop-after "$target" \
    --run-dir "$RUN" "${resume[@]}" >> "$LOG" 2>&1
  note "soak leg $n rc=$?"
}

stage_soak() {
  leg 1 10000
  leg 2 20000
  leg 3 30000
}

stage_soak_analysis() {
  note "=== soak seam analysis"
  timeout 600 python - <<'PY' > docs/round5/soak_analysis.json 2>>"$LOG"
# Loss continuity across the two resume seams: compare the mean loss of the
# last K logged steps before each seam with the first K after it.
import json
from pathlib import Path

recs = []
for line in (Path("data/runs/soak_30k") / "metrics.jsonl").read_text().splitlines():
    try:
        r = json.loads(line)
    except json.JSONDecodeError:
        continue
    if "loss" in r and "step" in r:
        recs.append((int(r["step"]), float(r["loss"])))
recs.sort()
K = 5
out = {"n_logged": len(recs), "seams": []}
for seam in (10000, 20000):
    before = [l for s, l in recs if s <= seam][-K:]
    after = [l for s, l in recs if s > seam][:K]
    if not before or not after:
        out["seams"].append({"step": seam, "status": "missing data"})
        continue
    mb, ma = sum(before) / len(before), sum(after) / len(after)
    out["seams"].append({
        "step": seam,
        "mean_loss_before": round(mb, 5),
        "mean_loss_after": round(ma, 5),
        "jump_ratio": round(ma / max(mb, 1e-9), 4),
    })
out["final_loss"] = recs[-1][1] if recs else None
out["final_step"] = recs[-1][0] if recs else None
print(json.dumps(out, indent=2))
PY
  note "soak analysis rc=$?"
  tail -20 docs/round5/soak_analysis.json | tee -a "$LOG"
}

STAGES=${*:-"soak soak_analysis"}
for s in $STAGES; do "stage_$s"; done
note "queue_c done"
