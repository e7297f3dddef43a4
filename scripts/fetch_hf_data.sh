#!/usr/bin/env bash
# Pull a preprocessed HU16-PNG dataset from a HuggingFace dataset repo.
#
# Analog of reference scripts/fetch_hf_data.sh: downloads split tar parts
# (tar.gz.part_*) plus the standalone index.csv / split_manifest.json,
# reassembles, extracts under data/processed/, and drops a completion
# marker so re-runs are no-ops. Requires `hf` (huggingface-hub CLI) and,
# for gated repos, HF_TOKEN.
#
#   export HF_TOKEN=hf_...
#   HF_REPO=someorg/ct-hu16-processed bash scripts/fetch_hf_data.sh
set -euo pipefail

HF_REPO="${HF_REPO:?set HF_REPO to the HF dataset repo id (org/name)}"
TAR_BASE="${TAR_BASE:-processed.tar.gz}"

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO_ROOT"
CACHE_DIR=".cache/hf-data"
MARKER="data/processed/.fetch_complete.${HF_REPO//\//_}"

if [ -f "$MARKER" ]; then
    echo "skip=true reason=already_fetched marker=$MARKER"
    echo "remove the marker (and data/processed/) to force a re-download"
    exit 0
fi

command -v hf >/dev/null 2>&1 || {
    echo "ERROR: huggingface-hub CLI ('hf') not found; pip install huggingface-hub" >&2
    exit 1
}

mkdir -p "$CACHE_DIR" data/processed

echo "listing $HF_REPO ..."
PARTS=$(hf download "$HF_REPO" --repo-type dataset --local-dir "$CACHE_DIR" \
        --include "${TAR_BASE}.part_*" --token "${HF_TOKEN:-}" 2>/dev/null \
        && ls "$CACHE_DIR" | grep "^${TAR_BASE}\.part_" | sort) || true
if [ -z "$PARTS" ]; then
    # single-file fallback (small repos publish one tarball)
    hf download "$HF_REPO" "$TAR_BASE" --repo-type dataset \
        --local-dir "$CACHE_DIR" --token "${HF_TOKEN:-}"
else
    echo "reassembling $(echo "$PARTS" | wc -l) parts ..."
    (cd "$CACHE_DIR" && cat ${TAR_BASE}.part_* > "$TAR_BASE")
fi

# index + split manifest are also published standalone; best-effort
for META in index.csv split_manifest.json; do
    hf download "$HF_REPO" "$META" --repo-type dataset \
        --local-dir "$CACHE_DIR" --token "${HF_TOKEN:-}" 2>/dev/null || true
done

echo "extracting ..."
tar -xzf "$CACHE_DIR/$TAR_BASE" -C "$REPO_ROOT"
for META in index.csv split_manifest.json; do
    [ -f "$CACHE_DIR/$META" ] && cp "$CACHE_DIR/$META" "data/processed/$META"
done
rm -f "$CACHE_DIR/${TAR_BASE}"*
touch "$MARKER"

echo "ok=true"
[ -f data/processed/index.csv ] && echo "index rows: $(($(wc -l < data/processed/index.csv) - 1))"
