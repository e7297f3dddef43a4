#!/usr/bin/env bash
# Round-5 data regeneration (CPU-only; data/ was cleaned at end of round 4).
# Rebuilds the round-4 synthetic trees plus the signature-strength eval sets
# for the round-5 causal probe experiment (VERDICT r4 next-round #3).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu
LOG=docs/round5/gen_data.log
mkdir -p docs/round5 data
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

gen() {
  local out=$1; shift
  if [ -f "$out/index.csv" ]; then note "skip $out (exists)"; return 0; fi
  note "gen $out $*"
  timeout 3600 python scripts/preprocessing/make_synthetic_data.py \
    --out "$out" "$@" >> "$LOG" 2>&1
  note "gen $out rc=$?"
}

# two-organ MVP twin (same-domain eval for MVP/gamma/MoE runs; round-3 recipe)
gen data/synth_organ_twin --datasets organa organb \
  --series-per-dataset 18 --slices-per-series 12 --size 512 --seed 0

# five-profile v2 eval set, signature strength 1.0 (round-4 EVALBIG recipe)
gen data/synth_v2_eval_big --five-datasets \
  --series-per-dataset 40 --slices-per-series 12 --size 512 --seed 0 \
  --val-fraction 0.5

# signature-strength arms' matched eval sets (round-5 probe experiment)
gen data/synth_v2_eval_sig033 --five-datasets \
  --series-per-dataset 40 --slices-per-series 12 --size 512 --seed 0 \
  --val-fraction 0.5 --signature-strength 0.33
gen data/synth_v2_eval_sig200 --five-datasets \
  --series-per-dataset 40 --slices-per-series 12 --size 512 --seed 0 \
  --val-fraction 0.5 --signature-strength 2.0

# host-fed training tree (decode-cache work + tuner; round-4 TRAIN512 recipe)
gen data/synth_v2_train512 --five-datasets \
  --series-per-dataset 16 --slices-per-series 50 --size 512 --seed 1

note "gen_data done"
