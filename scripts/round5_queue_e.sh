#!/usr/bin/env bash
# Round-5 chip queue E (post-soak): the remaining ledger TBDs, in value
# order — MoE capacity x experts sweep with MoE-aware MFU (VERDICT r4 #4),
# ViT-L/G batch x remat sweeps (#8), the gamma=0.5 interior point (#9,
# optional), and a final headline bench refresh.
# Usage: bash scripts/round5_queue_e.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round5/queue_e.log
mkdir -p docs/round5 data/runs
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

stage_moe_sweep() {
  note "=== MoE capacity x experts sweep (MoE-aware MFU)"
  timeout 5400 python scripts/bench_moe_sweep.py --experts 4 8 \
    --capacity-factors 1.0 1.25 2.0 --batch-size 96 \
    --out docs/round5/moe_sweep.json >> "$LOG" 2>&1
  note "moe sweep rc=$?"
}

stage_vitl_sweep() {
  note "=== ViT-L batch x remat sweep"
  timeout 4500 python scripts/bench_batch_sweep.py --config vit-large \
    --batch-sizes 32 64 96 128 --profile \
    --out docs/round5/vitl_sweep_noremat.json >> "$LOG" 2>&1
  note "vitl no-remat rc=$?"
  timeout 4500 python scripts/bench_batch_sweep.py --config vit-large \
    --batch-sizes 64 128 192 256 --remat --profile \
    --out docs/round5/vitl_sweep_remat.json >> "$LOG" 2>&1
  note "vitl remat rc=$?"
}

stage_vitg_sweep() {
  note "=== ViT-G batch x remat sweep (factored nu, lr 3e-5)"
  timeout 4500 python scripts/bench_batch_sweep.py --config vit-giant \
    --batch-sizes 16 32 48 --remat --factored-nu --mu-dtype bfloat16 \
    --lr 3e-5 --profile \
    --out docs/round5/vitg_sweep_remat.json >> "$LOG" 2>&1
  note "vitg remat rc=$?"
  timeout 3000 python scripts/bench_batch_sweep.py --config vit-giant \
    --batch-sizes 16 32 --factored-nu --mu-dtype bfloat16 --lr 3e-5 \
    --out docs/round5/vitg_sweep_noremat.json >> "$LOG" 2>&1
  note "vitg no-remat rc=$?"
}

stage_gamma05() {
  # Interior point of the gamma->counterfactual curve (queue A never reached
  # this stage). Requires data/synth_organ_twin (round5_gen_data.sh).
  bash scripts/round5_queue.sh gamma05
}

stage_bench() {
  note "=== headline bench refresh"
  timeout 3600 python bench.py | tee -a "$LOG"
  note "bench rc=$?"
}

STAGES=${*:-"moe_sweep vitl_sweep vitg_sweep gamma05 bench"}
for s in $STAGES; do "stage_$s"; done
note "queue_e done"
