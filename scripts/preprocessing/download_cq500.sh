#!/usr/bin/env bash
# Download + preprocess the CQ500 head-CT dataset (Kaggle mirror) into the
# standard HU16-PNG tree + spacing-bearing index.
#
# Analog of reference scripts/preprocessing/download_cq500.sh, composed from
# this repo's own tools: preprocess_dicom.py (DICOM -> HU16 PNG + index) and
# an inline spacing audit. Steps are idempotent — each is skipped when its
# output already exists.
#
# Prerequisites: kaggle CLI with ~/.kaggle/kaggle.json credentials.
# Dataset: kaggle.com/datasets/crawford/qureai-headct (CC-BY-SA-4.0, ~26.6 GB)
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
cd "$REPO_ROOT"

RAW_DIR="${RAW_DIR:-data/cq500/raw}"
OUT_DIR="${OUT_DIR:-data/processed/cq500}"
DATASET=cq500
INDEX="$OUT_DIR/_index/index.csv"

echo "=== CQ500 download & preprocess ==="

# -- 1. download ------------------------------------------------------
if [ -d "$RAW_DIR" ] && find "$RAW_DIR" -iname "*.dcm" -print -quit | grep -q .; then
    echo "step1: SKIP — DICOMs already present in $RAW_DIR"
else
    if [ ! -f "$HOME/.kaggle/kaggle.json" ]; then
        cat >&2 <<'EOF'
ERROR: Kaggle credentials not found at ~/.kaggle/kaggle.json.
  1. kaggle.com/settings -> API -> Create New Token
  2. mkdir -p ~/.kaggle && mv kaggle.json ~/.kaggle/ && chmod 600 ~/.kaggle/kaggle.json
Or download manually from kaggle.com/datasets/crawford/qureai-headct
and extract into $RAW_DIR, then re-run.
EOF
        exit 1
    fi
    mkdir -p "$RAW_DIR"
    echo "step1: downloading (~26.6 GB) ..."
    kaggle datasets download crawford/qureai-headct --path "$RAW_DIR" --unzip
    # the mirror sometimes nests per-study zips
    find "$RAW_DIR" -name "*.zip" -exec sh -c 'unzip -q -o "$1" -d "$(dirname "$1")"' _ {} \;
fi
echo "step1: $(find "$RAW_DIR" -type f | wc -l) raw files"

# -- 2. preprocess DICOM -> HU16 PNG + index --------------------------
if [ -f "$INDEX" ]; then
    echo "step2: SKIP — index exists ($(($(wc -l < "$INDEX") - 1)) rows); delete to reprocess"
else
    echo "step2: DICOM -> HU16 PNG ..."
    PYTHONUNBUFFERED=1 python scripts/preprocessing/preprocess_dicom.py \
        --src "$RAW_DIR" --out "$OUT_DIR" --dataset "$DATASET"
    [ -f "$INDEX" ] || { echo "ERROR: preprocessing produced no index at $INDEX" >&2; exit 1; }
fi

# -- 3. spacing audit --------------------------------------------------
echo "step3: spacing audit"
python - "$INDEX" <<'EOF'
import sys
from dinox_tpu.data.index import load_index_rows
rows = load_index_rows(sys.argv[1], require_spacing=True)
series = {r.series_dir for r in rows}
default = sum(1 for r in rows
              if (r.spacing_x, r.spacing_y, r.spacing_z) == (1.0, 1.0, 1.0))
sx = [r.spacing_x for r in rows]; sz = [r.spacing_z for r in rows]
print(f"  slices={len(rows)} series={len(series)}")
print(f"  spacing_x [{min(sx):.3f}, {max(sx):.3f}]  spacing_z [{min(sz):.3f}, {max(sz):.3f}]")
if default:
    print(f"  WARNING: {default}/{len(rows)} slices carry default (1,1,1) spacing")
else:
    print("  all slices carry real spacing metadata")
EOF

echo "=== CQ500 ready; next: bash scripts/preprocessing/build_5dataset_index.sh ==="
