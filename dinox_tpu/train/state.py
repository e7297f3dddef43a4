"""Train state pytree and optimizer construction.

The whole training step state — student/teacher params, AdamW state, DINO
center, step counter — is one pytree, checkpointed atomically by Orbax
(the analog of the reference's single-file torch payload,
scripts/phase5_big_run.py:1104-1125).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dinox_tpu.models.config import MODEL_CONFIGS, ModelConfig
from dinox_tpu.models.vit import init_model
from dinox_tpu.ops.augment import AugConfig
from dinox_tpu.train.schedule import get_lr


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults = reference TrainingConfig,
    scripts/phase5_big_run.py:236-306)."""

    model: ModelConfig = MODEL_CONFIGS["vit-small"]
    img_size: int = 224
    batch_size: int = 64  # global, per micro-batch
    accumulation_steps: int = 1
    lr: float = 1e-4
    min_lr: float = 1e-6
    warmup_steps: int = 2500
    weight_decay: float = 0.04
    max_steps: Optional[int] = None
    # DINO
    ema: float = 0.996
    teacher_temp: float = 0.04
    student_temp: float = 0.1
    center_momentum: float = 0.9
    loss_type: str = "dino"  # dino | simclr | mae
    # Gram anchoring is required for medical imaging (collapse otherwise);
    # kept always-on like the reference (gram_enabled "DO NOT CHANGE").
    gram_weight: float = 1.0
    koleo_weight: float = 0.0
    # MAE (used when loss_type == "mae")
    mae_mask_ratio: float = 0.75
    # Augmentation
    crop_scale_min: float = 0.3
    crop_scale_max: float = 1.0
    # Reproducibility
    train_seed: int = 0
    # Adam first-moment dtype. "bfloat16" halves the largest optimizer buffer
    # — needed to fit ViT-Giant (1.0B params: 4 f32 copies alone fill a 16 GB
    # v5e) on one chip; f32 elsewhere keeps the update numerically standard.
    mu_dtype: str = "float32"

    @property
    def effective_batch_size(self) -> int:
        return self.batch_size * self.accumulation_steps

    @property
    def aug(self) -> AugConfig:
        return AugConfig(
            img_size=self.img_size,
            crop_scale_min=self.crop_scale_min,
            crop_scale_max=self.crop_scale_max,
        )

    def replace(self, **kw: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def lr_at(self, step: int) -> float:
        return get_lr(step, self.max_steps, self.warmup_steps, self.lr, self.min_lr)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    student: Any
    teacher: Any
    opt_state: Any
    center: jnp.ndarray


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with the warmup+cosine schedule evaluated at the OPTIMIZER step
    count (torch-default betas/eps; weight decay as in the reference)."""

    def sched(count: jnp.ndarray) -> jnp.ndarray:
        from dinox_tpu.train.schedule import get_lr_jnp

        return get_lr_jnp(count, cfg.max_steps, cfg.warmup_steps, cfg.lr, cfg.min_lr)

    return optax.adamw(
        learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay, mu_dtype=jnp.dtype(cfg.mu_dtype),
    )


def create_train_state(cfg: TrainConfig, rng: jax.Array) -> TrainState:
    """Initialize student, copy to teacher (reference: teacher starts from
    student weights, requires_grad False — phase5_big_run.py:1594-1619).

    For ``loss_type == "mae"`` the "student" tree is the MaeModel
    ({encoder, decoder}); the teacher copy is unused but kept so the state
    shape is uniform across objectives."""
    mcfg = cfg.model.replace(img_size=cfg.img_size)
    if cfg.loss_type == "mae":
        from dinox_tpu.models.mae import init_mae

        student = init_mae(mcfg, rng)
    else:
        student = init_model(mcfg, rng)
    teacher = jax.tree_util.tree_map(jnp.copy, student)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        student=student,
        teacher=teacher,
        opt_state=tx.init(student),
        center=jnp.zeros((1, mcfg.out_dim), jnp.float32),
    )
