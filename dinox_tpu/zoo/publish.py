"""End-to-end publish pipeline: run/checkpoint -> staging dir -> HF Hub.

Behavior parity with reference zoo/publish.py: stages safetensors + pth +
config.json + README.md (model card) + scrubbed training_config.json +
eval_results.json, then uploads via HfApi; ``dry_run=True`` stops after
staging and returns the staging path (the testable no-network mode,
zoo/publish.py:156-158).
"""

from __future__ import annotations

import json
import logging
import shutil
import tempfile
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from dinox_tpu.zoo.card import _scrub_path, generate_model_card
from dinox_tpu.zoo.hub import LoadedModel, export_hub_checkpoint

log = logging.getLogger(__name__)

_SCRUB_KEYS = ("index_csv", "run_dir", "split_manifest", "data_root", "workdir")
_DROP_KEYS = ("hardware",)


def _scrub_config(config: dict[str, Any]) -> dict[str, Any]:
    """Remove local paths and hardware details before publishing
    (reference zoo/publish.py:24-42)."""
    out: dict[str, Any] = {}
    for k, v in config.items():
        if k in _DROP_KEYS:
            continue
        if isinstance(v, dict):
            out[k] = _scrub_config(v)
        elif k in _SCRUB_KEYS and isinstance(v, str):
            out[k] = _scrub_path(v)
        else:
            out[k] = v
    return out


def stage_release(
    model: LoadedModel,
    staging_dir: str | Path,
    *,
    model_name: str,
    training_config: Optional[dict[str, Any]] = None,
    eval_results: Optional[dict[str, Any]] = None,
    lineage: Optional[dict[str, Any]] = None,
) -> Path:
    """Assemble the full release directory (both weight formats + card).

    The staging dir is owned by the publisher and rebuilt from scratch:
    re-staging a different model into the same dir must not ship leftovers
    from the previous run (e.g. a dense backbone.pth surviving an MoE
    re-stage, or a stale adapter/)."""
    out = Path(staging_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    export_hub_checkpoint(model, out, use_safetensors=True)
    if model.cfg.moe_experts == 0:
        export_hub_checkpoint(model, out)  # torch-loadable .pth (dense only)
    else:
        log.info("MoE family: staging JAX-native safetensors only "
                 "(torch interop is dense-only)")
    card_cfg = {
        "name": model.cfg.name,
        "dim": model.cfg.dim,
        "depth": model.cfg.depth,
        "heads": model.cfg.heads,
        "patch": model.cfg.patch,
        "img_size": model.cfg.img_size,
        "mlp_ratio": model.cfg.mlp_ratio,
        "scale_aware": model.cfg.scale_aware,
        # Actual leaf count of the shipped backbone params — NOT the
        # reference's rough formula (ModelConfig.params_millions), which
        # over-counts the MLP ~4x and would mislabel a 22M ViT-S as 70M
        # on the public card.
        "params_millions": round(sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree_util.tree_leaves(model.params)) / 1e6, 1),
    }
    if model.cfg.moe_experts > 0:
        card_cfg.update({
            "moe_experts": model.cfg.moe_experts,
            "moe_every": model.cfg.moe_every,
            "weights_format": "jax",
        })
    (out / "README.md").write_text(
        generate_model_card(
            card_cfg,
            training_config=_scrub_config(training_config) if training_config else None,
            eval_results=eval_results,
            lineage=lineage,
            model_name=model_name,
        )
    )
    if training_config is not None:
        (out / "training_config.json").write_text(
            json.dumps(_scrub_config(training_config), indent=2, default=str)
        )
    if eval_results is not None:
        (out / "eval_results.json").write_text(json.dumps(eval_results, indent=2))
    return out


def publish_to_hub(
    model: LoadedModel,
    repo_id: str,
    *,
    model_name: Optional[str] = None,
    training_config: Optional[dict[str, Any]] = None,
    eval_results: Optional[dict[str, Any]] = None,
    lineage: Optional[dict[str, Any]] = None,
    private: bool = False,
    dry_run: bool = False,
    staging_dir: Optional[str | Path] = None,
) -> Path | str:
    """Stage a release and upload it to the HuggingFace Hub.

    Returns the staging path on ``dry_run``, else the repo URL.
    """
    staging = Path(staging_dir) if staging_dir else Path(tempfile.mkdtemp(prefix="dinox_pub_"))
    stage_release(
        model,
        staging,
        model_name=model_name or repo_id.split("/")[-1],
        training_config=training_config,
        eval_results=eval_results,
        lineage=lineage,
    )
    if dry_run:
        log.info("dry run: staged release at %s", staging)
        return staging

    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=str(staging), repo_id=repo_id)
    if staging_dir is None:
        shutil.rmtree(staging, ignore_errors=True)
    url = f"https://huggingface.co/{repo_id}"
    log.info("published -> %s", url)
    return url
