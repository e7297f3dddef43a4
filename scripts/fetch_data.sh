#!/usr/bin/env bash
# Data acquisition helper (analog of reference scripts/fetch_hf_data.sh /
# download_cq500.sh / prep_remote_data.sh): fetches preprocessed slice trees
# or raw archives onto a training host. Requires network access.
set -euo pipefail

usage() {
  cat <<USAGE
usage: $0 <command> [args]
  hf <repo_id> <dest>        snapshot a HF dataset repo (huggingface-cli)
  cq500 <dest>               fetch the CQ500 mirror archives (kaggle CLI)
  tcia <collection> <dest>   fetch a TCIA collection (python downloader)
USAGE
  exit 2
}

[ $# -ge 1 ] || usage
cmd=$1; shift
case "$cmd" in
  hf)
    [ $# -eq 2 ] || usage
    huggingface-cli download --repo-type dataset "$1" --local-dir "$2"
    ;;
  cq500)
    [ $# -eq 1 ] || usage
    command -v kaggle >/dev/null || { echo "kaggle CLI required" >&2; exit 1; }
    kaggle datasets download -d crawford/qureai-headct -p "$1" --unzip
    ;;
  tcia)
    [ $# -eq 2 ] || usage
    python "$(dirname "$0")/preprocessing/tcia_download.py" fetch \
      --collection "$1" --out "$2"
    ;;
  *) usage ;;
esac
