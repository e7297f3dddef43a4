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


def load_state_from_run(
    run_dir: str | Path, step: Optional[int] = None, host: bool = False
):
    """(TrainState, TrainConfig, meta) from a run directory.

    ``host=True`` restores into host (CPU) memory from an abstract template —
    no init compute, nothing staged to the accelerator. Essential when only a
    slice of the state is wanted on device: the full ViT-Giant TrainState
    (student + teacher + optimizer moments, ~14 GB f32) does not fit next to
    eval activations on one 16 GB chip, which OOMed the round-4 retrieval
    eval (docs/round4/vitg_2k_view_retrieval.log)."""
    cfg = train_config_from_run(run_dir)

    def build():
        state = create_train_state(cfg, jax.random.key(0))
        if cfg.pipeline_parallel > 1:
            # PP runs checkpoint the stage-stacked {"rest", "blocks"} layout
            # (train/pp_step.py); mirror it so the tree matches on restore.
            from dinox_tpu.parallel.pipeline import split_model_params
            from dinox_tpu.train.state import make_optimizer

            student = split_model_params(state.student, cfg.pipeline_parallel)
            state = state.replace(
                student=student,
                teacher=split_model_params(state.teacher, cfg.pipeline_parallel),
                opt_state=make_optimizer(cfg).init(student),
            )
        return state

    if host:
        # numpy-leaf template: orbax restores each leaf as np.ndarray in host
        # memory, with no jax backend involved — works on axon-only chip
        # hosts where no cpu backend is registered (jax.devices("cpu") and
        # ShapeDtypeStruct shardings are both unavailable there), and ignores
        # the device shardings recorded in the checkpoint.
        import numpy as np

        abstract = jax.eval_shape(build)
        template = jax.tree_util.tree_map(
            lambda a: np.zeros(a.shape, a.dtype), abstract
        )
    else:
        template = build()
    mgr = CheckpointManager(run_dir, keep_last=1)
    try:
        state, meta = mgr.restore(template, step=step)
    finally:
        mgr.close()
    if cfg.pipeline_parallel > 1:
        # Hand callers the standard layout: eval/export/monitor code is
        # uniform, PP is a training-time detail.
        from dinox_tpu.parallel.pipeline import merge_model_params

        state = state.replace(
            student=merge_model_params(state.student),
            teacher=merge_model_params(state.teacher),
        )
    return state, cfg, meta


def load_backbone_from_run(
    run_dir: str | Path, step: Optional[int] = None, source: str = "student"
) -> LoadedModel:
    """Student (or teacher) backbone from a run checkpoint as a LoadedModel.

    Restores on host and stages ONLY the backbone subtree to the default
    device, so teacher + optimizer state never occupy HBM (the reference's
    ``load_from_training_checkpoint`` similarly extracts just the student
    backbone, zoo/hub.py:74-149)."""
    state, cfg, _ = load_state_from_run(run_dir, step=step, host=True)
    tree = getattr(state, source)["backbone"]
    del state
    tree = jax.device_put(tree, jax.devices()[0])
    mcfg = cfg.model.replace(img_size=cfg.img_size)
    return LoadedModel(mcfg, tree)
