"""Bridge from training runs (orbax) to the zoo model format.

Extracts the student backbone from a run directory's latest checkpoint as a
LoadedModel — the JAX-native analog of ``load_from_training_checkpoint``'s
student/backbone extraction (reference zoo/hub.py:74-149), and the input to
``export_hub_checkpoint`` / ``publish_to_hub``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.train.checkpoint import CheckpointManager
from dinox_tpu.train.state import TrainConfig, create_train_state
from dinox_tpu.zoo.hub import LoadedModel


def train_config_from_run(run_dir: str | Path) -> TrainConfig:
    cfg_json = json.loads((Path(run_dir) / "config.json").read_text())
    model_cfg = ModelConfig.from_dict(cfg_json["model"])
    known = {f for f in TrainConfig.__dataclass_fields__}
    kw = {k: v for k, v in cfg_json.items() if k in known and k != "model"}
    return TrainConfig(model=model_cfg, **kw)


def load_state_from_run(run_dir: str | Path, step: Optional[int] = None):
    """(TrainState, TrainConfig, meta) from a run directory."""
    cfg = train_config_from_run(run_dir)
    template = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(run_dir, keep_last=1)
    try:
        state, meta = mgr.restore(template, step=step)
    finally:
        mgr.close()
    return state, cfg, meta


def load_backbone_from_run(
    run_dir: str | Path, step: Optional[int] = None, source: str = "student"
) -> LoadedModel:
    """Student (or teacher) backbone from a run checkpoint as a LoadedModel."""
    state, cfg, _ = load_state_from_run(run_dir, step=step)
    tree = getattr(state, source)
    mcfg = cfg.model.replace(img_size=cfg.img_size)
    return LoadedModel(mcfg, tree["backbone"])
