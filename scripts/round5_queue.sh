#!/usr/bin/env bash
# Round-5 chip queue A (serialized — ONE TPU process at a time).
# VERDICT r4 next-round #3 (causal probe-degradation experiment: three
# signature-strength arms at 20K steps + matched-domain evals) and #9's
# gamma=0.5 point that pins the interior of the gamma->counterfactual curve.
# Usage: bash scripts/round5_queue.sh [stage ...]   (default: all stages)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round5/queue_a.log
mkdir -p docs/round5 data/runs
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

sig_arm() {
  # 20K-step five-profile run at the given signature strength; matched-domain
  # panorgan eval (dataset probe is metric 2) + view retrieval.
  local tag=$1 strength=$2 evalset=$3
  note "=== signature arm $tag (strength $strength, 20K steps)"
  run_resumable "data/runs/sig_${tag}" 5400 3 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 5 \
    --signature-strength "$strength" \
    --batch-size 64 --accumulation-steps 2 --max-steps 20000 \
    --log-json --ckpt-every 10000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "sig_${tag} rc=$?"
  timeout 3600 python scripts/evaluate_panorgan.py \
    --checkpoint "data/runs/sig_${tag}" \
    --index-csv "$evalset/index.csv" --split-manifest "$evalset/split_manifest.json" \
    --out "docs/round5/sig_${tag}_panorgan.json" \
    > "docs/round5/sig_${tag}_panorgan.log" 2>&1
  note "sig_${tag} panorgan rc=$?"
  timeout 2400 python scripts/view_retrieval_eval.py \
    --checkpoint "data/runs/sig_${tag}" \
    --index-csv "$evalset/index.csv" --split-manifest "$evalset/split_manifest.json" \
    --n 512 --out "docs/round5/sig_${tag}_view_retrieval.json" \
    > "docs/round5/sig_${tag}_view_retrieval.log" 2>&1
  note "sig_${tag} retrieval rc=$?"
}

stage_sig033() { sig_arm 033 0.33 data/synth_v2_eval_sig033; }
stage_sig100() { sig_arm 100 1.0 data/synth_v2_eval_big; }
stage_sig200() { sig_arm 200 2.0 data/synth_v2_eval_sig200; }

stage_gamma05() {
  note "=== gamma=0.5 calibration arm (interior point of the U)"
  run_resumable data/runs/mvp_gamma05 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --spacing-jitter 0.1 --scale-gamma-init 0.5 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_gamma05 rc=$?"
  timeout 1800 python scripts/evaluate_panorgan.py --checkpoint data/runs/mvp_gamma05 \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --out docs/round5/mvp_gamma05_eval.json > docs/round5/mvp_gamma05_eval.log 2>&1
  note "gamma05 eval rc=$?"
  timeout 1200 python scripts/diagnose_scale_pathway.py \
    --checkpoint data/runs/mvp_gamma05 --n 16 \
    --out docs/round5/mvp_gamma05_scale_diag.json \
    > docs/round5/mvp_gamma05_scale_diag.log 2>&1
  note "gamma05 diag rc=$?"
}

STAGES=${*:-"sig200 sig033 sig100 gamma05"}
for s in $STAGES; do "stage_$s"; done
note "queue_a done"
