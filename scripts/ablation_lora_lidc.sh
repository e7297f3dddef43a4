#!/usr/bin/env bash
# LoRA ablation scan on the LIDC malignancy benchmark — the analog of the
# reference's downstream ablation runbook (reference:
# scripts/ablation_5dataset_bs256.sh): given a pretrained backbone, sweep the
# adapter knobs that closed its AUROC gap (rank, partial unfreezing, crop
# size) against a pinned-seed baseline, one adapter directory per arm.
#
# Usage:
#   scripts/ablation_lora_lidc.sh <backbone> <train.csv> <val.csv> [arm]
#   arm: all (default) | baseline | rank | unfreeze | crop128
#
# The CSVs come from scripts/preprocessing/extract_lidc_malignancy.py
# (columns image_path,label[,spacing_*]; patient-stratified splits).
set -euo pipefail

[ $# -ge 3 ] || { echo "usage: $0 <backbone> <train.csv> <val.csv> [arm]" >&2; exit 2; }
BACKBONE=$1; TRAIN_CSV=$2; VAL_CSV=$3
ARM="${4:-all}"
ADAPTER_BASE="${ADAPTER_BASE:-adapters/ablation-lidc}"
SEED="${SEED:-42}"

# Lung window in scaled deci-HU (real: level=-300 HU, width=1200 HU;
# reference docs/EXPERIMENTS.md:307).
COMMON=(
  --backbone "$BACKBONE"
  --train-csv "$TRAIN_CSV" --val-csv "$VAL_CSV"
  --task classification --num-classes 2
  --window-level -30 --window-width 120
  --epochs 50 --batch-size 32
  --es-metric auroc --es-patience 10
  --warmup-steps 100 --seed "$SEED"
)

run_arm() {
  local name=$1; shift
  echo "==== arm: $name ===="
  python scripts/finetune_lora.py "${COMMON[@]}" --out "$ADAPTER_BASE/$name" "$@"
  python - "$ADAPTER_BASE/$name" <<'PY'
import json, sys, pathlib
hist = json.loads((pathlib.Path(sys.argv[1]) / "history.json").read_text())
best = max(h.get("auroc", 0.0) for h in hist)
print(f"{sys.argv[1]}: best val AUROC = {best:.4f}")
PY
}

case "$ARM" in
  all)
    run_arm baseline --rank 8
    run_arm rank16 --rank 16
    run_arm unfreeze2 --rank 8 --unfreeze-blocks 2 --backbone-lr 1e-5
    run_arm crop128 --rank 8 --canvas 128
    ;;
  baseline) run_arm baseline --rank 8 ;;
  rank)     run_arm rank16 --rank 16 ;;
  unfreeze) run_arm unfreeze2 --rank 8 --unfreeze-blocks 2 --backbone-lr 1e-5 ;;
  crop128)  run_arm crop128 --rank 8 --canvas 128 ;;
  *) echo "unknown arm: $ARM" >&2; exit 2 ;;
esac
