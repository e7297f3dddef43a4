#!/usr/bin/env bash
# Round-4 chip queue, part D — recovery of the evals that failed while the
# host-side checkpoint restore was mid-fix (run_export host=True briefly
# required a cpu jax backend; queue_b stage H and queue_c stage L hit it),
# plus end-of-round bookkeeping (ledger regen).
# Usage: QUEUE_C_PID=<pid> bash scripts/round4_queue_d.sh [stage ...]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round4/queue_d.log
mkdir -p docs/round4 logs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

EVALBIG=data/synth_v2_eval_big

wait_for_chip() {
  local pid=${QUEUE_C_PID:-}
  if [ -n "$pid" ] && [ -d "/proc/$pid" ]; then
    note "waiting for queue_c (pid $pid) to finish"
    while [ -d "/proc/$pid" ]; do sleep 60; done
  fi
  note "chip free"
}

stage_vitg_retrieval() {
  note "=== Q. ViT-Giant view retrieval (retry 2: host-side numpy restore)"
  timeout 3600 python scripts/view_retrieval_eval.py --checkpoint data/runs/vitg_2k \
    --index-csv $EVALBIG/index.csv --split-manifest $EVALBIG/split_manifest.json \
    --n 256 --batch-size 16 --out docs/round4/vitg_2k_view_retrieval.json \
    > docs/round4/vitg_2k_view_retrieval.log 2>&1
  note "vitg retrieval rc=$?"
}

stage_50k_eval() {
  note "=== R. v2 50K evals (big eval set, recovery of queue_b stage H)"
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

stage_ledger() {
  note "=== S. ledger regen with round-4 runs"
  timeout 900 python scripts/log_runs.py --runs-dir data/runs \
    > logs/log_runs_r4.log 2>&1
  note "ledger rc=$?"
}

wait_for_chip
STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(vitg_retrieval 50k_eval ledger)
fi
for s in "${STAGES[@]}"; do "stage_$s"; done
note "queue_d done"
