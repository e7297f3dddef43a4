#!/usr/bin/env bash
# Round-5 chip queue D: ViT-L/G batch x remat sweeps (VERDICT r4 #8), the
# MoE capacity x experts efficiency sweep with MoE-aware MFU (#4), and the
# final kernel gate + headline bench.
# Usage: bash scripts/round5_queue_d.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round5/queue_d.log
mkdir -p docs/round5
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

stage_flagship_restage() {
  # Regenerate the flagship staging/snapshot with the corrected card
  # (real param count, training git commit from provenance.json, fixed
  # encode() kwargs in the usage snippet).
  note "=== flagship release re-staging (corrected card)"
  timeout 1800 python scripts/publish_release.py \
    --backbone data/runs/mvp_flagship \
    --model-name dinox-tpu-vits-mvp-scale-aware \
    --eval-json docs/round5/mvp_flagship_eval.json \
    --retrieval-json docs/round5/mvp_flagship_retrieval.json \
    --adapter data/runs/mvp_flagship_lora \
    --staging-dir data/release/mvp_flagship \
    --snapshot-dir docs/release/mvp_flagship >> "$LOG" 2>&1
  note "flagship restage rc=$?"
}

stage_sig100_release() {
  # Third release artifact: the 20K five-dataset v2 backbone (s=1.0 arm) —
  # the strongest quality numbers in the repo (retrieval 133x, spacing R^2
  # 0.941) staged through the same publish path as the MVP flagship.
  note "=== sig_100 20K backbone release staging"
  timeout 1800 python scripts/publish_release.py \
    --backbone data/runs/sig_100 \
    --model-name dinox-tpu-vits-v2-20k \
    --eval-json docs/round5/sig_100_panorgan.json \
    --retrieval-json docs/round5/sig_100_view_retrieval.json \
    --staging-dir data/release/sig_100 \
    --snapshot-dir docs/release/sig_100 >> "$LOG" 2>&1
  note "sig_100 release rc=$?"
}

stage_vitl_sweep() {
  note "=== ViT-L batch x remat sweep"
  timeout 5400 python scripts/bench_batch_sweep.py --config vit-large \
    --batch-sizes 32 64 96 128 --profile \
    --out docs/round5/vitl_sweep_noremat.json >> "$LOG" 2>&1
  note "vitl no-remat rc=$?"
  timeout 5400 python scripts/bench_batch_sweep.py --config vit-large \
    --batch-sizes 64 128 192 256 --remat --profile \
    --out docs/round5/vitl_sweep_remat.json >> "$LOG" 2>&1
  note "vitl remat rc=$?"
}

stage_vitg_sweep() {
  note "=== ViT-G batch x remat sweep (factored nu, lr 3e-5)"
  timeout 5400 python scripts/bench_batch_sweep.py --config vit-giant \
    --batch-sizes 16 32 48 --remat --factored-nu --mu-dtype bfloat16 \
    --lr 3e-5 --profile \
    --out docs/round5/vitg_sweep_remat.json >> "$LOG" 2>&1
  note "vitg remat rc=$?"
  timeout 3600 python scripts/bench_batch_sweep.py --config vit-giant \
    --batch-sizes 16 32 --factored-nu --mu-dtype bfloat16 --lr 3e-5 \
    --out docs/round5/vitg_sweep_noremat.json >> "$LOG" 2>&1
  note "vitg no-remat rc=$?"
}

stage_moe_sweep() {
  note "=== MoE capacity x experts sweep (MoE-aware MFU)"
  timeout 7200 python scripts/bench_moe_sweep.py --experts 4 8 \
    --capacity-factors 1.0 1.25 2.0 --batch-size 96 \
    --out docs/round5/moe_sweep.json >> "$LOG" 2>&1
  note "moe sweep rc=$?"
}

stage_bench() {
  note "=== kernel gate + headline bench"
  timeout 1800 python bench.py --check >> "$LOG" 2>&1
  note "kernel gate rc=$?"
  timeout 3600 python bench.py | tee -a "$LOG"
  note "bench rc=$?"
}

STAGES=${*:-"flagship_restage sig100_release moe_sweep vitl_sweep vitg_sweep bench"}
for s in $STAGES; do "stage_$s"; done
note "queue_d done"
