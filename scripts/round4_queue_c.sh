#!/usr/bin/env bash
# Round-4 chip queue, part C — runs AFTER round4_queue_b.sh releases the chip.
# Agenda: the mechanism-guided calibration arm (VERDICT #4: LN-pinning fix —
# spacing-jitter 0.1 + scale-gamma-init 0.25), its same-domain eval + geometry
# diagnostic, and the batch-size sweep with per-category trace diffing
# (round-3 weak #3: why bs128 > bs256).
# Usage: bash scripts/round4_queue_c.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue_c.log
mkdir -p docs/round4 data/runs logs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

ORGAN=data/synth_organ_twin

wait_for_chip() {
  # queue_b (PID file or process name match is forbidden) — wait until no
  # pretrain/eval python holds the TPU: poll the known queue_b bash PID if
  # alive, else proceed.
  local pid=${QUEUE_B_PID:-}
  if [ -n "$pid" ] && [ -d "/proc/$pid" ]; then
    note "waiting for queue_b (pid $pid) to finish"
    while [ -d "/proc/$pid" ]; do sleep 60; done
  fi
  note "chip free"
}

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

stage_vitg_retrieval() {
  # Retry of queue_b stage J: the first attempt OOMed because the eval loader
  # staged the FULL ViT-G TrainState (student+teacher+moments ~14 GB) to the
  # chip; load_backbone_from_run now restores on host and stages only the
  # backbone. bs16 keeps activation headroom at dim 1408.
  note "=== L. ViT-Giant view retrieval (retry, host-side state restore)"
  timeout 3600 python scripts/view_retrieval_eval.py --checkpoint data/runs/vitg_2k \
    --index-csv data/synth_v2_eval_big/index.csv \
    --split-manifest data/synth_v2_eval_big/split_manifest.json \
    --n 256 --batch-size 16 --out docs/round4/vitg_2k_view_retrieval.json \
    > docs/round4/vitg_2k_view_retrieval.log 2>&1
  note "vitg retrieval rc=$?"
}

stage_gamma() {
  note "=== M. calibration arm: jitter 0.1 + scale-gamma-init 0.25"
  run_resumable data/runs/mvp_gamma025 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --spacing-jitter 0.1 --scale-gamma-init 0.25 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_gamma025 rc=$?"
}

stage_gamma_eval() {
  note "=== N. gamma arm same-domain eval + geometry diagnostic"
  timeout 1800 python scripts/evaluate_panorgan.py --checkpoint data/runs/mvp_gamma025 \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --out docs/round4/mvp_gamma025_eval.json > docs/round4/mvp_gamma025_eval.log 2>&1
  note "gamma eval rc=$?"
  timeout 1200 python scripts/diagnose_scale_pathway.py \
    --checkpoint data/runs/mvp_gamma025 --n 16 \
    --out docs/round4/mvp_gamma025_scale_diag.json \
    > docs/round4/mvp_gamma025_scale_diag.log 2>&1
  note "gamma diag rc=$?"
}

stage_sweep() {
  note "=== O. batch-size sweep + per-category trace diff (bs128>bs256)"
  timeout 3600 python scripts/bench_batch_sweep.py \
    --batch-sizes 64 96 128 192 256 --profile \
    --out docs/round4/batch_sweep.json > docs/round4/batch_sweep.log 2>&1
  note "sweep rc=$?"
}

stage_bench() {
  note "=== P. refresh headline bench"
  timeout 3600 python bench.py > docs/round4/bench_final.json 2> docs/round4/bench_final.log
  note "bench rc=$?"
}

wait_for_chip
STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(vitg_retrieval gamma gamma_eval sweep bench)
fi
for s in "${STAGES[@]}"; do "stage_$s"; done
note "queue_c done"
