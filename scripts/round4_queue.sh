#!/usr/bin/env bash
# Round-4 chip queue (serialized — ONE TPU process at a time).
# Covers the "Pending chip" agenda in docs/ROUND4_RESULTS.md:
#   VERDICT #1 host-fed production path, #3 ViT-Giant convergence+eval,
#   #4 scale-pathway calibration arms, #5 v2 50K long run, bench MFU,
#   serving SLOs.
# Usage: bash scripts/round4_queue.sh [stage ...]   (default: all stages)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue.log
mkdir -p docs/round4 data/runs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

TRAIN512=data/synth_v2_train512            # 5 profiles x 16 series x 50 slices @512
EVALBIG=data/synth_v2_eval_big             # 5 profiles x 40 series x 12 slices @512, val 0.5
ORGAN=data/synth_organ_twin                # organa+organb x 18 series x 12 slices @512

stage_loader_ceiling() {
  note "=== A. loader-stress ceiling (host pipeline alone, cold decode)"
  timeout 1800 python scripts/tune_throughput.py --loader-only \
    --index-csv $TRAIN512/index.csv --canvas 512 \
    --batch-sizes 64 --num-workers 4 8 16 --prefetch 4 \
    --cache-slices 0 --inflate 4 --steps 30 --warmup 3 \
    --out-dir docs/round4/tune_loader_only >> "$LOG" 2>&1
  note "loader ceiling rc=$?"
}

stage_train_grid() {
  note "=== B. host-fed train grid (real step, data-wait split)"
  timeout 2400 python scripts/tune_throughput.py --config vit-small --scale-aware \
    --index-csv $TRAIN512/index.csv --canvas 512 \
    --batch-sizes 64 --num-workers 4 8 --prefetch 2 4 \
    --inflate 4 --steps 12 --warmup 3 \
    --out-dir docs/round4/tune_hostfed >> "$LOG" 2>&1
  note "train grid rc=$?"
}

stage_hostfed() {
  note "=== C. host-fed production run: ViT-S 1K steps from disk (VERDICT #1)"
  timeout 7200 python scripts/pretrain.py --config vit-small --scale-aware \
    --index-csv $TRAIN512/index.csv --split-manifest $TRAIN512/split_manifest.json \
    --batch-size 64 --max-steps 1000 --canvas 512 \
    --num-workers "${HOSTFED_WORKERS:-4}" --device-prefetch 2 \
    --log-json --ckpt-every 1000 --ckpt-timeout 900 --monitor-every 0 \
    --run-dir data/runs/hostfed_1k >> "$LOG" 2>&1
  note "hostfed rc=$?"
}

stage_50k() {
  note "=== G. v2 50K long run (VERDICT #5)"
  timeout 12000 python scripts/pretrain.py --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 5 \
    --batch-size 64 --accumulation-steps 2 --max-steps 50000 \
    --log-json --ckpt-every 25000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0 --run-dir data/runs/v2_50k >> "$LOG" 2>&1
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

stage_vitg() {
  note "=== I. ViT-Giant 2K steps, factored nu (VERDICT #3)"
  timeout 10800 python scripts/pretrain.py --config vit-giant --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 5 \
    --batch-size 32 --lr 3e-5 --warmup-steps 100 --max-steps 2000 \
    --factored-nu --mu-dtype bfloat16 \
    --log-json --ckpt-every 2000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0 --run-dir data/runs/vitg_2k >> "$LOG" 2>&1
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

stage_calib() {
  note "=== D. calibration arm: spacing-jitter 0.1 (VERDICT #4)"
  timeout 4200 python scripts/pretrain.py --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --spacing-jitter 0.1 \
    --log-json --ckpt-every 5000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0 --run-dir data/runs/mvp_jitter01 >> "$LOG" 2>&1
  note "mvp_jitter01 rc=$?"
  note "=== E. calibration arm: scale-lr-mult 0.1"
  timeout 4200 python scripts/pretrain.py --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --scale-lr-mult 0.1 \
    --log-json --ckpt-every 5000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0 --run-dir data/runs/mvp_slr01 >> "$LOG" 2>&1
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

stage_bench() {
  note "=== K. bench.py (headline + MFU)"
  timeout 3600 python bench.py > docs/round4/bench.json 2> docs/round4/bench.log
  note "bench rc=$?"; tail -1 docs/round4/bench.json | tee -a "$LOG"
}

stage_slo() {
  note "=== L. serving SLO bench (p50/p95/p99 vs concurrency)"
  timeout 2400 python scripts/bench_inference.py --slo \
    > docs/round4/bench_inference_slo.json 2> docs/round4/bench_inference_slo.log
  note "slo rc=$?"
}

STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(loader_ceiling train_grid hostfed 50k 50k_eval vitg vitg_eval calib calib_eval bench slo)
fi
for s in "${STAGES[@]}"; do "stage_$s"; done
note "queue done"
