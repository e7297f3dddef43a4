#!/usr/bin/env bash
# Prepare MVP training data on a remote instance — analog of the reference's
# remote prep pipeline (reference: scripts/prep_remote_data.sh): download raw
# DICOM from TCIA, preprocess to 16-bit HU PNG, build the combined index +
# series-level train/val split, and pack one tarball that training hosts can
# pull at datacenter speed (optionally pushed to a HF dataset repo).
#
# Run on any Linux box with fast internet. Resume-safe: the TCIA downloader
# skips fetched series and the preprocessor skips existing PNGs.
#
# Usage:
#   bash scripts/prep_remote_data.sh <workdir> [hf_repo_id]
#   # e.g. bash scripts/prep_remote_data.sh /data/mvp myorg/dinox-mvp-data
#
# Output structure (inside the tar):
#   processed/{lidc-idri,pancreas-ct}/...   16-bit HU PNG slice trees
#   processed/combined-mvp/index.csv        combined index with spacing
#   processed/combined-mvp/split_manifest.json
set -euo pipefail

[ $# -ge 1 ] || { echo "usage: $0 <workdir> [hf_repo_id]" >&2; exit 2; }
WORK=$1; HF_REPO="${2:-}"
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"/{raw,processed}

# 1. Raw DICOM from TCIA (MVP corpus: 100 LIDC series + Pancreas-CT).
python "$HERE/preprocessing/tcia_download.py" fetch \
  --collection LIDC-IDRI --max-series "${LIDC_SERIES:-100}" \
  --out "$WORK/raw/lidc-idri"
python "$HERE/preprocessing/tcia_download.py" fetch \
  --collection Pancreas-CT --max-series "${PANCREAS_SERIES:-80}" \
  --out "$WORK/raw/pancreas-ct"

# 2+3. Preprocess -> HU16 PNG, combined index, split manifest, manifests.
python "$HERE/preprocessing/prepare_data.py" \
  --out "$WORK/processed" \
  --dicom lidc-idri="$WORK/raw/lidc-idri" \
  --dicom pancreas-ct="$WORK/raw/pancreas-ct"

# 4. One tarball for training hosts.
TAR="$WORK/dinox-mvp-data.tar.gz"
tar -C "$WORK" -czf "$TAR" processed
echo "packed: $TAR ($(du -h "$TAR" | cut -f1))"

# 5. Optional HF dataset upload (needs HF_TOKEN).
if [ -n "$HF_REPO" ]; then
  huggingface-cli upload --repo-type dataset "$HF_REPO" "$TAR" \
    "$(basename "$TAR")"
  echo "uploaded to hf dataset $HF_REPO"
fi
