"""Pipeline-parallel training step (dp × pp mesh).

Same semantics as `train/step.py` — on-device two-view augmentation, student
and teacher forwards, DINO + Gram + KoLeo, AdamW, teacher EMA — but the
transformer depth is sharded over the mesh's ``pipe`` axis and the block
stack runs as the GPipe rotation in `parallel/pipeline.py`. Embed (patch +
CLS + pos + scale token) and finalize (final LN + head) run as ordinary
GSPMD regions around the manual pipeline region, so the losses operate on
the full global batch exactly as in the non-PP step.

Scope: DINO/SimCLR objectives, accumulation_steps == 1 (PP microbatching
already plays accumulation's memory role), no LoRA, attention via XLA SDPA
inside the manual region (the Pallas kernel is the tensor-parallel path;
``pipe`` and ``model`` axes are mutually exclusive for now).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from dinox_tpu.models.vit import DinoStudentTeacher, TransformerBlock
from dinox_tpu.ops.augment import augment_views
from dinox_tpu.parallel.mesh import DATA_AXIS
from dinox_tpu.parallel.pipeline import (
    PIPE_AXIS,
    pipeline_run_blocks,
    pp_state_shardings,
    split_model_params,
)
from dinox_tpu.train.losses import dino_loss, gram_anchoring_loss, koleo_loss, simclr_loss
from dinox_tpu.train.schedule import get_lr_jnp
from dinox_tpu.train.state import TrainConfig, TrainState, create_train_state, make_optimizer


def create_pp_train_state(cfg: TrainConfig, rng: jax.Array, mesh: Mesh) -> TrainState:
    """TrainState whose student/teacher are {"rest", "blocks"} PP trees,
    block leaves (S, blocks_per_stage, ...) sharded over ``pipe``."""
    n_stages = mesh.shape[PIPE_AXIS]
    base = create_train_state(cfg, rng)
    student = split_model_params(base.student, n_stages)
    teacher = split_model_params(base.teacher, n_stages)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=base.step,
        student=student,
        teacher=teacher,
        opt_state=tx.init(student),
        center=base.center,
    )
    return jax.device_put(state, pp_state_shardings(mesh, state))


def make_pp_loss(cfg: TrainConfig, mesh: Mesh):
    """The per-batch loss over the pipelined forward:
    ``loss_fn(student_pp, teacher_pp, center, batch, spacing, key) ->
    (loss, (new_center, metrics))`` — exposed so tests can compare its
    gradients against the sequential `train.step._micro_loss` directly."""
    if cfg.accumulation_steps != 1:
        raise ValueError("pipeline step folds accumulation into microbatches; "
                         "set accumulation_steps=1")
    if cfg.loss_type not in ("dino", "simclr"):
        raise ValueError(f"pipeline step supports dino/simclr, not {cfg.loss_type}")
    if cfg.model.lora_rank:
        raise ValueError("LoRA fine-tunes are single-stage; PP is for pretrain")

    mcfg = cfg.model.replace(img_size=cfg.img_size)
    S = mesh.shape[PIPE_AXIS]
    n_micro = cfg.pp_microbatches or S
    model = DinoStudentTeacher(mcfg, mesh=None)
    blk = TransformerBlock(
        mcfg.dim, mcfg.heads, mcfg.mlp_ratio,
        attn_impl="xla", dtype=jnp.dtype(mcfg.dtype), lora=(),
        fused_mlp=False, fused_attn=False, gelu_approx=mcfg.gelu_approx,
        mesh=None,
    )

    def block_fn(p, y):
        return blk.apply({"params": p}, y, True)

    if mcfg.use_grad_checkpoint:
        block_fn = jax.checkpoint(block_fn, prevent_cse=False)

    def fwd(pp_params, batch, sp):
        tokens = model.apply(
            {"params": pp_params["rest"]}, batch, sp,
            method=DinoStudentTeacher.embed,
        )
        tokens = pipeline_run_blocks(
            block_fn, pp_params["blocks"], tokens, mesh, n_micro)
        return model.apply(
            {"params": pp_params["rest"]}, tokens,
            method=DinoStudentTeacher.finalize,
        )

    zero = jnp.zeros((), jnp.float32)

    def micro_loss(student_pp, teacher_pp, center, batch, spacing, key):
        metrics: dict[str, jnp.ndarray] = {}
        sp2 = (jnp.concatenate([spacing, spacing], axis=0)
               if mcfg.scale_aware else None)
        if sp2 is not None and cfg.spacing_jitter > 0:
            jkey = jax.random.fold_in(key, 0x5BA)
            sp2 = sp2 * jnp.exp(cfg.spacing_jitter * jax.random.normal(jkey, sp2.shape))
        s_out, s_feats = fwd(student_pp, batch, sp2)
        if cfg.loss_type == "simclr":
            b = s_out.shape[0] // 2
            loss = simclr_loss(s_out[:b], s_out[b:], cfg.student_temp)
            metrics.update(
                loss_simclr=loss, loss_dino=zero, loss_gram=zero,
                loss_koleo=zero, loss_mae=zero,
                teacher_entropy=zero, student_entropy=zero,
            )
            new_center = center
        else:
            t_out, t_feats = fwd(teacher_pp, batch, sp2)
            d = dino_loss(
                s_out, t_out, center,
                student_temp=cfg.student_temp,
                teacher_temp=cfg.teacher_temp,
                center_momentum=cfg.center_momentum,
            )
            g = gram_anchoring_loss(s_feats, t_feats)
            k = koleo_loss(s_out) if cfg.koleo_weight > 0 else zero
            loss = d.loss + cfg.gram_weight * g + cfg.koleo_weight * k
            new_center = d.new_center
            metrics.update(
                loss_dino=d.loss, loss_gram=g, loss_koleo=k,
                loss_simclr=zero, loss_mae=zero,
                teacher_entropy=d.teacher_entropy,
                student_entropy=d.student_entropy,
            )
        cls = s_feats[:, 0].astype(jnp.float32)
        metrics["embed_std"] = jnp.mean(jnp.std(cls, axis=0))
        metrics["loss"] = loss
        return loss, (new_center, metrics)

    return micro_loss


def build_pp_train_step(
    cfg: TrainConfig,
    mesh: Mesh,
    donate: bool = True,
    augment_fn: Callable = augment_views,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], tuple[TrainState, dict[str, Any]]]:
    """Compile the full optimizer step over a (data, pipe) mesh.

    Signature matches `build_train_step`: ``step_fn(state, pixels, spacing)``
    with pixels (1, B, H, W, 3) uint16 — accumulation is folded into the
    pipeline's microbatches.
    """
    micro_loss = make_pp_loss(cfg, mesh)
    tx = make_optimizer(cfg)
    aug_cfg = cfg.aug
    base_key = jax.random.key(cfg.train_seed)

    def constrain(x, spec):
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh, spec))

    def step_fn(state: TrainState, pixels: jnp.ndarray, spacing: jnp.ndarray):
        pixels = constrain(pixels, P(None, DATA_AXIS))
        spacing = constrain(spacing, P(None, DATA_AXIS))
        step_key = jax.random.fold_in(base_key, state.step)
        k0 = jax.random.fold_in(step_key, 0)

        views = augment_fn(pixels[0], k0, aug_cfg)
        batch = constrain(views.reshape((-1,) + views.shape[2:]), P(DATA_AXIS))

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
        (_, (center, metrics)), grads = grad_fn(
            state.student, state.teacher, state.center, batch, spacing[0],
            jax.random.fold_in(k0, 0x3AE),
        )
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        if cfg.loss_type == "dino":
            teacher = jax.tree_util.tree_map(
                lambda t, s: t * cfg.ema + s * (1.0 - cfg.ema),
                state.teacher, student,
            )
        else:
            teacher = state.teacher

        new_state = TrainState(
            step=state.step + 1, student=student, teacher=teacher,
            opt_state=opt_state, center=center,
        )
        new_state = jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, new_state,
            pp_state_shardings(mesh, new_state),
        )
        metrics["lr"] = get_lr_jnp(
            state.step, cfg.max_steps, cfg.warmup_steps, cfg.lr, cfg.min_lr)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
