#!/bin/bash
# Round-4 queue F: MoE convergence run (2K steps, 4 experts, ViT-S, v2
# two-organ device batches) + view-retrieval eval from the checkpoint.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue_f.log
mkdir -p docs/round4 data/runs
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

stage_moe2k() {
  note "=== W. MoE convergence: 4 experts, 2K steps"
  run_resumable data/runs/moe_2k 3000 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 2 --max-steps 2000 \
    --moe-experts 4 \
    --log-json --ckpt-every 1000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "moe_2k rc=$?"
}

stage_moe_eval() {
  note "=== X. MoE view retrieval"
  timeout 1800 python scripts/view_retrieval_eval.py --checkpoint data/runs/moe_2k \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --n 216 --out docs/round4/moe_2k_view_retrieval.json \
    > docs/round4/moe_2k_view_retrieval.log 2>&1
  note "moe retrieval rc=$?"
}

stage_ledger() {
  note "=== Y. ledger regen"
  JAX_PLATFORMS=cpu timeout 600 python scripts/log_runs.py >> "$LOG" 2>&1
  note "ledger rc=$?"
}

STAGES=${*:-"moe2k moe_eval ledger"}
for s in $STAGES; do "stage_$s"; done
note "queue_f done"
