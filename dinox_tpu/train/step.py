"""The jitted training step: augmentation -> forward -> losses -> update.

One compiled XLA program per optimizer step contains everything the
reference's Python hot loop does per iteration (scripts/phase5_big_run.py:
1686-1802): on-device two-view augmentation, student forward over the
concatenated (2B, ...) batch, teacher forward under stop_gradient, DINO CE
with center EMA, Gram anchoring, KoLeo, gradient accumulation (lax.scan over
micro-batches), AdamW with warmup+cosine LR, global grad-norm, and the
teacher EMA update — plus the metric set the reference logs (entropies,
embedding std for collapse detection).

Parallelism: inputs carry a leading (accum, global_batch) layout; the global
batch dim is sharded over the mesh's `data` axis via sharding constraints,
params stay replicated, and XLA emits the gradient allreduce over ICI.
Counting is per OPTIMIZER step (the reference's micro-batch counting footgun
is deliberately not reproduced, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from dinox_tpu.models.vit import DinoStudentTeacher
from dinox_tpu.ops.augment import augment_views
from dinox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, state_shardings
from dinox_tpu.train.losses import dino_loss, gram_anchoring_loss, koleo_loss, simclr_loss
from dinox_tpu.train.schedule import get_lr_jnp
from dinox_tpu.train.state import TrainConfig, TrainState, make_optimizer


def _micro_loss(
    student_params,
    teacher_params,
    center,
    batch,
    spacing,
    key,
    cfg: TrainConfig,
    model,
):
    """Loss over one already-augmented (2B, S, S, 3) micro-batch."""
    zero = jnp.zeros((), jnp.float32)
    metrics: dict[str, jnp.ndarray] = {}

    if cfg.loss_type == "mae":
        from dinox_tpu.models.mae import MaeModel, mae_loss

        pred, mask = model.apply({"params": student_params}, batch, key, train=True)
        loss = mae_loss(pred, batch, mask, cfg.model.patch)
        metrics.update(
            loss_mae=loss, loss_dino=zero, loss_gram=zero, loss_koleo=zero,
            loss_simclr=zero, teacher_entropy=zero, student_entropy=zero,
            embed_std=jnp.std(pred.astype(jnp.float32)),
        )
        metrics["loss"] = loss
        return loss, (center, metrics)

    sp2 = jnp.concatenate([spacing, spacing], axis=0) if cfg.model.scale_aware else None
    if sp2 is not None and cfg.spacing_jitter > 0:
        # Per-VIEW multiplicative jitter: the two views of one slice see
        # different spacing values, so cross-view consistency damps the
        # embedding's local spacing sensitivity (counterfactual calibration,
        # TrainConfig.spacing_jitter).
        jkey = jax.random.fold_in(key, 0x5BA)
        sp2 = sp2 * jnp.exp(cfg.spacing_jitter * jax.random.normal(jkey, sp2.shape))

    if cfg.model.moe_experts > 0:
        # MoE blocks sow their Switch load-balance aux; collect it from the
        # student only (the teacher's routing is not trained).
        (s_out, s_feats), svars = model.apply(
            {"params": student_params}, batch, sp2, train=True,
            method=DinoStudentTeacher.forward_features,
            mutable=["intermediates"],
        )
        aux_leaves = jax.tree_util.tree_leaves(svars["intermediates"])
        moe_aux = sum(aux_leaves) / max(1, len(aux_leaves))
    else:
        s_out, s_feats = model.apply(
            {"params": student_params}, batch, sp2, train=True,
            method=DinoStudentTeacher.forward_features,
        )
        moe_aux = zero

    if cfg.loss_type == "simclr":
        b = s_out.shape[0] // 2
        loss = simclr_loss(s_out[:b], s_out[b:], cfg.student_temp)
        metrics.update(
            loss_simclr=loss, loss_dino=zero, loss_gram=zero, loss_koleo=zero,
            loss_mae=zero, teacher_entropy=zero, student_entropy=zero,
        )
        new_center = center
    else:
        t_out, t_feats = model.apply(
            {"params": teacher_params}, batch, sp2,
            method=DinoStudentTeacher.forward_features,
        )
        d = dino_loss(
            s_out, t_out, center,
            student_temp=cfg.student_temp,
            teacher_temp=cfg.teacher_temp,
            center_momentum=cfg.center_momentum,
        )
        loss = d.loss
        g = gram_anchoring_loss(s_feats, t_feats)
        loss = loss + cfg.gram_weight * g
        k = koleo_loss(s_out) if cfg.koleo_weight > 0 else zero
        loss = loss + cfg.koleo_weight * k
        new_center = d.new_center
        metrics.update(
            loss_dino=d.loss, loss_gram=g, loss_koleo=k, loss_simclr=zero,
            loss_mae=zero,
            teacher_entropy=d.teacher_entropy, student_entropy=d.student_entropy,
        )
    if cfg.model.moe_experts > 0:
        loss = loss + cfg.moe_aux_weight * moe_aux
        metrics["loss_moe_aux"] = moe_aux

    # Collapse telemetry: per-dim std of the CLS embedding over the batch
    # (the reference's "Embed-L0 std" health stat, phase5_big_run.py:1892-1976).
    cls = s_feats[:, 0].astype(jnp.float32)
    metrics["embed_std"] = jnp.mean(jnp.std(cls, axis=0))
    metrics["loss"] = loss
    return loss, (new_center, metrics)


def build_train_step(
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    augment_fn: Callable = augment_views,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], tuple[TrainState, dict[str, Any]]]:
    """Compile the full optimizer step.

    Returned signature: ``step_fn(state, pixels, spacing) -> (state, metrics)``
    with pixels (accum, B, H, W, 3) uint16 and spacing (accum, B, 3) float32.

    *augment_fn(pixels, key, aug_cfg) -> (n_views, B, S, S, 3)* defaults to the
    medical HU pipeline; the CIFAR baseline passes its RGB TwoCrops analog.
    """
    mcfg = cfg.model.replace(img_size=cfg.img_size)
    # The mesh reaches the model so Attention can shard_map the Pallas kernel
    # across (data, model) axes; on a single device it changes nothing.
    if cfg.loss_type == "mae":
        from dinox_tpu.models.mae import MaeModel

        model = MaeModel(mcfg, mask_ratio=cfg.mae_mask_ratio, mesh=mesh)
    else:
        model = DinoStudentTeacher(mcfg, mesh=mesh)
    tx = make_optimizer(cfg)
    aug_cfg = cfg.aug
    base_key = jax.random.key(cfg.train_seed)

    def constrain(x, spec):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, jax.sharding.NamedSharding(mesh, spec))

    def step_fn(state: TrainState, pixels: jnp.ndarray, spacing: jnp.ndarray):
        pixels = constrain(pixels, P(None, DATA_AXIS))
        spacing = constrain(spacing, P(None, DATA_AXIS))
        step_key = jax.random.fold_in(base_key, state.step)
        accum = pixels.shape[0]
        micro_keys = jax.vmap(lambda a: jax.random.fold_in(step_key, a))(jnp.arange(accum))

        grad_fn = jax.value_and_grad(_micro_loss, has_aux=True)

        def run_micro(center, px, sp, k):
            views = augment_fn(px, k, aug_cfg)  # (2, B, S, S, 3)
            batch = constrain(
                views.reshape((-1,) + views.shape[2:]), P(DATA_AXIS)
            )
            (_, (new_center, metrics)), grads = grad_fn(
                state.student, state.teacher, center, batch, sp,
                jax.random.fold_in(k, 0x3AE), cfg, model
            )
            return grads, new_center, metrics

        if accum == 1:
            # No scan: skips a full zero-init + add over the grad pytree.
            grads, center, metrics = run_micro(
                state.center, pixels[0], spacing[0], micro_keys[0]
            )
        else:
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.student)

            def micro(carry, inp):
                grads_acc, center = carry
                px, sp, k = inp
                grads, new_center, metrics = run_micro(center, px, sp, k)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, new_center), metrics

            (grads, center), metrics_seq = jax.lax.scan(
                micro, (zero_grads, state.center), (pixels, spacing, micro_keys)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            metrics = jax.tree_util.tree_map(jnp.mean, metrics_seq)
        metrics["grad_norm"] = optax.global_norm(grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)

        # Teacher EMA from the *updated* student (phase5_big_run.py:1799-1802);
        # SimCLR runs student-only, teacher stays frozen (matching reference).
        if cfg.loss_type == "dino":
            teacher = jax.tree_util.tree_map(
                lambda t, s: t * cfg.ema + s * (1.0 - cfg.ema), state.teacher, student
            )
        else:
            teacher = state.teacher

        new_state = TrainState(
            step=state.step + 1,
            student=student,
            teacher=teacher,
            opt_state=opt_state,
            center=center,
        )
        if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
            # Pin the tensor-parallel layout on the outputs so param shards
            # stay put across steps instead of drifting to whatever GSPMD
            # propagation picks.
            new_state = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, new_state,
                state_shardings(mesh, new_state),
            )
        metrics["lr"] = get_lr_jnp(
            state.step, cfg.max_steps, cfg.warmup_steps, cfg.lr, cfg.min_lr
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
