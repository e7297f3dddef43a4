#!/usr/bin/env bash
# Round-5 chip queue B (after queue A; ONE TPU process at a time).
# VERDICT r4 #2 (flagship end-to-end release artifact), #1's chip leg (MoE
# retrained + evaluated THROUGH the hub path), and #5's chip leg (host-fed
# run with the decoded-slice cache).
# Usage: bash scripts/round5_queue_b.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=docs/round5/queue_b.log
mkdir -p docs/round5 data/runs data/release docs/release
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

ORGAN=data/synth_organ_twin
TRAIN512=data/synth_v2_train512

run_resumable() {
  local run_dir=$1 tmo=$2 tries=$3; shift 3
  local rc=1
  for i in $(seq 1 "$tries"); do
    local resume=()
    [ -d "$run_dir/ckpt" ] && resume=(--resume "$run_dir")
    note "attempt $i/$tries (resume=${resume[*]:-no})"
    timeout "$tmo" python scripts/pretrain.py "$@" --run-dir "$run_dir" \
      "${resume[@]}" >> "$LOG" 2>&1
    rc=$?
    note "attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 30
  done
  return "$rc"
}

stage_patch_probe() {
  # Mechanism localization for the signature-strength curve: CLS vs
  # mean-patch dataset probe on each arm (queue A must have finished).
  for tag_set in "033 data/synth_v2_eval_sig033" "100 data/synth_v2_eval_big" \
                 "200 data/synth_v2_eval_sig200"; do
    set -- $tag_set
    local tag=$1 evalset=$2
    note "=== patch-vs-CLS probe sig_${tag}"
    timeout 2400 python scripts/round5_patch_probe.py \
      --checkpoint "data/runs/sig_${tag}" \
      --index-csv "$evalset/index.csv" \
      --split-manifest "$evalset/split_manifest.json" \
      --out "docs/round5/sig_${tag}_patch_probe.json" \
      > "docs/round5/sig_${tag}_patch_probe.log" 2>&1
    note "patch probe sig_${tag} rc=$?"
  done
}

stage_flagship() {
  note "=== flagship: MVP two-organ scale-aware 5K (release backbone)"
  run_resumable data/runs/mvp_flagship 4200 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 4 --max-steps 5000 \
    --log-json --ckpt-every 2500 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "mvp_flagship rc=$?"
}

stage_flagship_eval() {
  note "=== flagship evals (same-domain two-organ set)"
  timeout 1800 python scripts/evaluate_panorgan.py --checkpoint data/runs/mvp_flagship \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --out docs/round5/mvp_flagship_eval.json \
    > docs/round5/mvp_flagship_eval.log 2>&1
  note "flagship panorgan rc=$?"
  timeout 1800 python scripts/view_retrieval_eval.py --checkpoint data/runs/mvp_flagship \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --n 216 --out docs/round5/mvp_flagship_retrieval.json \
    > docs/round5/mvp_flagship_retrieval.log 2>&1
  note "flagship retrieval rc=$?"
}

stage_flagship_lora() {
  note "=== flagship LoRA adapter (organ classification downstream)"
  python - <<'PY' >> "$LOG" 2>&1
# organa-vs-organb classification CSVs from the organ-twin index, split at
# series granularity (no slice leakage; reference split discipline).
import csv, json
from pathlib import Path
rows = list(csv.DictReader(open("data/synth_organ_twin/index.csv")))
val_series = set(json.loads(Path("data/synth_organ_twin/split_manifest.json")
                            .read_text())["val"]["series_dir"])
for name, pred in (("train", lambda r: r["series_dir"] not in val_series),
                   ("val", lambda r: r["series_dir"] in val_series)):
    out = Path(f"data/synth_organ_twin/finetune_{name}.csv")
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_path", "label", "spacing_x", "spacing_y", "spacing_z"])
        n = 0
        for r in rows:
            if pred(r):
                w.writerow([r["png_path"], int(r["dataset"] == "organa"),
                            r["spacing_x"], r["spacing_y"], r["spacing_z"]])
                n += 1
    print(f"{out}: {n} rows")
PY
  timeout 3600 python scripts/finetune_lora.py \
    --backbone data/runs/mvp_flagship \
    --train-csv $ORGAN/finetune_train.csv --val-csv $ORGAN/finetune_val.csv \
    --task classification --num-classes 2 \
    --rank 8 --epochs 6 --batch-size 32 --es-metric auroc --es-patience 3 \
    --warmup-steps 50 --seed 42 --out data/runs/mvp_flagship_lora \
    >> "$LOG" 2>&1
  note "flagship lora rc=$?"
}

stage_flagship_release() {
  note "=== flagship release staging + weightless snapshot"
  timeout 1800 python scripts/publish_release.py \
    --backbone data/runs/mvp_flagship \
    --model-name dinox-tpu-vits-mvp-scale-aware \
    --eval-json docs/round5/mvp_flagship_eval.json \
    --retrieval-json docs/round5/mvp_flagship_retrieval.json \
    --adapter data/runs/mvp_flagship_lora \
    --staging-dir data/release/mvp_flagship \
    --snapshot-dir docs/release/mvp_flagship >> "$LOG" 2>&1
  note "flagship release rc=$?"
}

stage_moe2k() {
  note "=== MoE 2K retrain (hub-path artifact)"
  run_resumable data/runs/moe_2k 3000 2 \
    --config vit-small --scale-aware \
    --synthetic-device-batches 24 --synthetic-datasets 2 \
    --batch-size 64 --accumulation-steps 2 --max-steps 2000 \
    --moe-experts 4 \
    --log-json --ckpt-every 1000 --ckpt-keep-last 1 --ckpt-timeout 900 \
    --monitor-every 0
  note "moe_2k rc=$?"
}

stage_moe_hub() {
  note "=== MoE hub export + eval THROUGH the hub path + release snapshot"
  timeout 1800 python - <<'PY' >> "$LOG" 2>&1
from dinox_tpu.train.run_export import load_backbone_from_run
from dinox_tpu.zoo.hub import export_hub_checkpoint, load_model
from dinox_tpu.zoo.encode import encode
import numpy as np

model = load_backbone_from_run("data/runs/moe_2k")
assert model.cfg.moe_experts == 4, model.cfg
out = export_hub_checkpoint(model, "data/release/moe_2k_hub",
                            use_safetensors=True)
m2 = load_model(out)
img = np.random.default_rng(0).uniform(-800, 300, (512, 512)).astype(np.float32)
e = np.asarray(encode(m2, img, pixel_spacing=(0.7, 0.7), slice_thickness=1.2))
assert e.shape == (1, 384) and np.isfinite(e).all(), e.shape
print("moe hub export + load_model + encode OK", e.shape)
PY
  note "moe hub export rc=$?"
  timeout 2400 python scripts/view_retrieval_eval.py \
    --checkpoint data/release/moe_2k_hub \
    --index-csv $ORGAN/index.csv --split-manifest $ORGAN/split_manifest.json \
    --n 216 --out docs/round5/moe_2k_hub_view_retrieval.json \
    > docs/round5/moe_2k_hub_view_retrieval.log 2>&1
  note "moe hub retrieval rc=$?"
  timeout 1800 python scripts/publish_release.py \
    --backbone data/release/moe_2k_hub \
    --model-name dinox-tpu-vits-moe4 \
    --retrieval-json docs/round5/moe_2k_hub_view_retrieval.json \
    --staging-dir data/release/moe_vits \
    --snapshot-dir docs/release/moe_vits >> "$LOG" 2>&1
  note "moe release rc=$?"
}

stage_hostfed_cached() {
  note "=== host-fed 500 steps WITH decoded-slice cache (data_wait split)"
  run_resumable data/runs/hostfed_cached_500 5400 2 \
    --config vit-small --scale-aware \
    --index-csv $TRAIN512/index.csv --split-manifest $TRAIN512/split_manifest.json \
    --batch-size 64 --max-steps 500 --canvas 512 \
    --num-workers 4 --device-prefetch 2 --decoded-cache auto \
    --log-json --ckpt-every 500 --ckpt-timeout 900 --monitor-every 0
  note "hostfed_cached rc=$?"
}

STAGES=${*:-"patch_probe flagship flagship_eval flagship_lora flagship_release moe2k moe_hub hostfed_cached"}
for s in $STAGES; do "stage_$s"; done
note "queue_b done"
