#!/usr/bin/env bash
# Build the 5-dataset combined training index with temperature-scaled
# sampling and a series-level train/val split.
#
# Analog of reference scripts/preprocessing/phase3_build_5dataset_index.sh,
# composed from this repo's own tools: combine_indices.py (merge per-dataset
# indices, tag dataset column), temperature_resample.py (T=2.0 quotas shared
# with dinox_tpu/zoo/merge.py), make_split_manifest.py (leakage-free series
# split). Point the *_IDX variables at your per-dataset index CSVs.
#
#   LIDC_IDX=... PANCREAS_IDX=... bash scripts/preprocessing/build_5dataset_index.sh
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
cd "$REPO_ROOT"

DATA_ROOT="${DATA_ROOT:-data/processed}"
OUT_DIR="${OUT_DIR:-data/mvp}"
TEMPERATURE="${TEMPERATURE:-2.0}"
VAL_FRACTION="${VAL_FRACTION:-0.10}"

LIDC_IDX="${LIDC_IDX:-$DATA_ROOT/lidc-idri/_index/index.csv}"
PANCREAS_IDX="${PANCREAS_IDX:-$DATA_ROOT/pancreas-ct/_index/index.csv}"
MSD_COLON_IDX="${MSD_COLON_IDX:-$DATA_ROOT/msd-colon/_index/index.csv}"
MSD_HEPATIC_IDX="${MSD_HEPATIC_IDX:-$DATA_ROOT/msd-hepatic-vessel/_index/index.csv}"
CQ500_IDX="${CQ500_IDX:-$DATA_ROOT/cq500/_index/index.csv}"

echo "=== checking per-dataset indices ==="
for f in "$LIDC_IDX" "$PANCREAS_IDX" "$MSD_COLON_IDX" "$MSD_HEPATIC_IDX" "$CQ500_IDX"; do
    [ -f "$f" ] || { echo "ERROR: missing index: $f" >&2; exit 1; }
    echo "  ok: $f ($(($(wc -l < "$f") - 1)) rows)"
done
mkdir -p "$OUT_DIR"

echo "=== combining 5 datasets ==="
python scripts/preprocessing/combine_indices.py \
    --out "$OUT_DIR/combined_5dataset.csv" \
    "lidc-idri=$LIDC_IDX" \
    "pancreas-ct=$PANCREAS_IDX" \
    "msd-colon=$MSD_COLON_IDX" \
    "msd-hepatic-vessel=$MSD_HEPATIC_IDX" \
    "cq500=$CQ500_IDX"

echo "=== temperature-scaled resample (T=$TEMPERATURE) ==="
python scripts/preprocessing/temperature_resample.py \
    --index "$OUT_DIR/combined_5dataset.csv" \
    --out "$OUT_DIR/combined_5dataset_t2.csv" \
    --temperature "$TEMPERATURE" --seed 42

echo "=== series-level train/val split (val $VAL_FRACTION) ==="
python scripts/preprocessing/make_split_manifest.py \
    --index "$OUT_DIR/combined_5dataset_t2.csv" \
    --out "$OUT_DIR/split_manifest_5dataset.json" \
    --val-fraction "$VAL_FRACTION" --seed 42

cat <<EOF

=== 5-dataset index ready ===
index:          $OUT_DIR/combined_5dataset_t2.csv
split manifest: $OUT_DIR/split_manifest_5dataset.json

launch training:
  python scripts/pretrain.py --config vit-small --scale-aware \\
    --index-csv $OUT_DIR/combined_5dataset_t2.csv \\
    --split-manifest $OUT_DIR/split_manifest_5dataset.json \\
    --batch-size 64 --accumulation-steps 2 --max-steps 50000 \\
    --ckpt-every 2500 --z-stride 3 --diverse-batches \\
    --run-dir data/runs/5dataset
EOF
