#!/usr/bin/env bash
# Round-4 chip queue, part B (post VM-restart recovery).
# Remaining agenda: serving SLO, calibration arms (VERDICT #4), ViT-Giant
# convergence + eval (VERDICT #3), v2 50K + evals (VERDICT #5).
# Short/high-value stages run FIRST to bank results against chip flakiness;
# long pretrains checkpoint every 5K steps and auto-resume on retry.
# Usage: bash scripts/round4_queue_b.sh [stage ...]   (default: all stages)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue_b.log
mkdir -p docs/round4 data/runs logs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

EVALBIG=data/synth_v2_eval_big             # 5 profiles x 40 series x 12 slices @512, val 0.5
ORGAN=data/synth_organ_twin                # organa+organb x 18 series x 12 slices @512

# run_resumable <run_dir> <per-attempt-timeout> <attempts> <pretrain args...>
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

stage_slo() {
  note "=== L. serving SLO bench (p50/p95/p99 vs concurrency)"
  timeout 2400 python scripts/bench_inference.py --slo \
    > docs/round4/bench_inference_slo.json 2> docs/round4/bench_inference_slo.log
  note "slo rc=$?"
}

stage_calib() {
  note "=== D. calibration arm: spacing-jitter 0.1 (VERDICT #4)"
  run_resumable data/runs/mvp_jitter01 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --spacing-jitter 0.1 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_jitter01 rc=$?"
  note "=== E. calibration arm: scale-lr-mult 0.1"
  run_resumable data/runs/mvp_slr01 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --scale-lr-mult 0.1 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_slr01 rc=$?"
}

stage_calib_eval() {
  note "=== F. calibration same-domain evals (counterfactual vs 0.306 anchor)"
  for arm in mvp_jitter01 mvp_slr01; do
    timeout 1800 python scripts/evaluate_panorgan.py --checkpoint data/runs/$arm \
      --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
      --out docs/round4/${arm}_eval.json > docs/round4/${arm}_eval.log 2>&1
    note "$arm eval rc=$?"
  done
}

stage_vitg() {
  note "=== I. ViT-Giant 2K steps, factored nu (VERDICT #3)"
  run_resumable data/runs/vitg_2k 10800 2 \
    --config vit-giant --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 5 \
    --batch-size 32 --lr 3e-5 --warmup-steps 100 --max-steps 2000 \
    --factored-nu --mu-dtype bfloat16 \
    --log-json --ckpt-every 1000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "vitg_2k rc=$?"
}

stage_vitg_eval() {
  note "=== J. ViT-Giant view retrieval from final checkpoint"
  timeout 3600 python scripts/view_retrieval_eval.py --checkpoint data/runs/vitg_2k \
    --index-csv $EVALBIG/index.csv --split-manifest $EVALBIG/split_manifest.json \
    --n 256 --batch-size 32 --out docs/round4/vitg_2k_view_retrieval.json \
    > docs/round4/vitg_2k_view_retrieval.log 2>&1
  note "vitg retrieval rc=$?"
}

stage_50k() {
  note "=== G. v2 50K long run (VERDICT #5)"
  run_resumable data/runs/v2_50k 12000 3 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 5 \
    --batch-size 64 --accumulation-steps 2 --max-steps 50000 \
    --log-json --ckpt-every 5000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "v2_50k rc=$?"
}

stage_50k_eval() {
  note "=== H. v2 50K evals (big eval set)"
  timeout 3600 python scripts/evaluate_panorgan.py --checkpoint data/runs/v2_50k \
    --index-csv $EVALBIG/index.csv --split-manifest $EVALBIG/split_manifest.json \
    --out docs/round4/v2_50k_panorgan_big.json \
    > docs/round4/v2_50k_panorgan_big.log 2>&1
  note "v2_50k panorgan rc=$?"
  timeout 2400 python scripts/view_retrieval_eval.py --checkpoint data/runs/v2_50k \
    --index-csv $EVALBIG/index.csv --split-manifest $EVALBIG/split_manifest.json \
    --n 512 --out docs/round4/v2_50k_view_retrieval.json \
    > docs/round4/v2_50k_view_retrieval.log 2>&1
  note "v2_50k retrieval rc=$?"
}

STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(slo calib calib_eval vitg vitg_eval 50k 50k_eval)
fi
for s in "${STAGES[@]}"; do "stage_$s"; done
note "queue_b done"
