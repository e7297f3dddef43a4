#!/bin/bash
# Round-4 queue E: third calibration point gamma=0.1 (mapping the
# scale-gamma-init -> counterfactual curve: gamma 1.0 -> 0.74, 0.25 -> 0.53,
# 0.1 -> ?) + same-domain eval + geometry diagnostic.
# Usage: bash scripts/round4_queue_e.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue_e.log
mkdir -p docs/round4 data/runs logs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

ORGAN=data/synth_organ_twin

run_resumable() {
  local run_dir=$1 tmo=$2 tries=$3; shift 3
  local rc=1
  for i in $(seq 1 "$tries"); do
    local resume=()
    [ -d "$run_dir/ckpt" ] && resume=(--resume "$run_dir")
    note "attempt $i/$tries (resume=${resume[*]:-no})"
    timeout "$tmo" python scripts/pretrain.py "$@" --run-dir "$run_dir" \
      "${resume[@]}" >> "$LOG" 2>&1
    rc=$?
    note "attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 30
  done
  return "$rc"
}

stage_gamma01() {
  note "=== T. calibration arm: jitter 0.1 + scale-gamma-init 0.1"
  run_resumable data/runs/mvp_gamma01 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --spacing-jitter 0.1 --scale-gamma-init 0.1 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_gamma01 rc=$?"
}

stage_gamma01_eval() {
  note "=== U. gamma01 same-domain eval + geometry diagnostic"
  timeout 1800 python scripts/evaluate_panorgan.py --checkpoint data/runs/mvp_gamma01 \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --out docs/round4/mvp_gamma01_eval.json > docs/round4/mvp_gamma01_eval.log 2>&1
  note "gamma01 eval rc=$?"
  timeout 1200 python scripts/diagnose_scale_pathway.py \
    --checkpoint data/runs/mvp_gamma01 --n 16 \
    --out docs/round4/mvp_gamma01_scale_diag.json \
    > docs/round4/mvp_gamma01_scale_diag.log 2>&1
  note "gamma01 diag rc=$?"
}

stage_ledger() {
  note "=== V. ledger regen"
  JAX_PLATFORMS=cpu timeout 600 python scripts/log_runs.py >> "$LOG" 2>&1
  note "ledger rc=$?"
}

STAGES=${*:-"gamma01 gamma01_eval ledger"}
for s in $STAGES; do "stage_$s"; done
note "queue_e done"
