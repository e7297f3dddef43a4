"""Mixture-of-Experts MLP + expert parallelism (models/moe.py):
routing math on constructed cases, capacity overflow, load-balance aux,
dense-dispatch equivalence to a per-token gather, integration into the
TransformerBlock / train step, and EP sharding on the (data, model, expert)
mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.moe import MoeMlp
from dinox_tpu.parallel.mesh import EXPERT_AXIS, make_mesh, state_shardings
from dinox_tpu.train.state import TrainConfig, create_train_state
from dinox_tpu.train.step import build_train_step

MOE_MODEL = ModelConfig(
    name="moe-tiny", img_size=32, patch=16, dim=32, depth=2, heads=2,
    out_dim=64, num_registers=2, attn_impl="xla", dtype="float32",
    moe_experts=4, moe_every=2, moe_capacity_factor=2.0,
)


def _init_moe(dim=16, E=4, B=2, N=10, cap=4.0, seed=0):
    m = MoeMlp(dim, E, mlp_ratio=2.0, capacity_factor=cap)
    x = jax.random.normal(jax.random.key(seed), (B, N, dim))
    params = m.init(jax.random.key(1), x)["params"]
    return m, params, x


def test_moe_output_shape_and_aux():
    m, params, x = _init_moe()
    y, inter = m.apply({"params": params}, x, mutable=["intermediates"])
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    (aux,) = inter["intermediates"]["moe_aux"]
    # Switch aux: == 1.0 for a perfectly uniform router, >= 1.0 otherwise.
    assert float(aux) >= 0.99


def test_moe_matches_per_token_gather():
    """The dense-dispatch einsums equal the obvious per-token computation:
    y_t = gate_t * FFN_{expert(t)}(x_t) for tokens within capacity."""
    m, params, x = _init_moe(cap=8.0)  # capacity ample: nothing dropped
    y = m.apply({"params": params}, x)

    xt = x.reshape(-1, x.shape[-1])
    logits = xt @ np.asarray(params["router"]["kernel"]) + np.asarray(
        params["router"]["bias"])
    probs = jax.nn.softmax(logits, axis=-1)
    expert = np.argmax(np.asarray(probs), axis=-1)
    gate = np.take_along_axis(np.asarray(probs), expert[:, None], axis=1)[:, 0]
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    ref = np.stack([
        gate[t] * (
            (jax.nn.gelu(xt[t] @ w1[e] + b1[e][0], approximate=True)
             @ w2[e] + b2[e][0])
        )
        for t, e in enumerate(expert)
    ]).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_moe_capacity_overflow_drops_tokens():
    """With capacity 1 token/expert, overflow tokens produce EXACTLY zero
    (the residual carries them through unchanged — Switch semantics)."""
    dim, E = 8, 2
    m = MoeMlp(dim, E, mlp_ratio=1.0, capacity_factor=0.01)  # cap = 1
    x = jax.random.normal(jax.random.key(0), (1, 6, dim))
    params = m.init(jax.random.key(1), x)["params"]
    y = np.asarray(m.apply({"params": params}, x))[0]
    zero_rows = (np.abs(y).max(axis=-1) == 0.0).sum()
    # 6 tokens, 2 experts x 1 slot => at least 4 dropped
    assert zero_rows >= 4


def test_moe_block_in_train_step_learns():
    """Full DINO train step with MoE blocks: runs, finite, logs the aux
    metric, and the aux loss participates (loss changes with its weight)."""
    cfg = TrainConfig(
        model=MOE_MODEL, img_size=32, batch_size=8, lr=1e-3, warmup_steps=2,
        max_steps=20, train_seed=0, moe_aux_weight=0.01,
    )
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 8, 48, 48, 3)), jnp.uint16)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 3)), jnp.float32)

    state = create_train_state(cfg, jax.random.key(0))
    state, m = build_train_step(cfg, donate=False)(state, px, sp)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss_moe_aux"]) >= 0.99
    assert int(state.step) == 1

    # router params exist and receive gradients (they moved)
    r0 = create_train_state(cfg, jax.random.key(0)).student
    k = "blocks_1"
    moved = np.abs(
        np.asarray(state.student["backbone"][k]["moe"]["router"]["kernel"])
        - np.asarray(r0["backbone"][k]["moe"]["router"]["kernel"])).max()
    assert moved > 0


def test_expert_parallel_step_matches_single_device():
    """(data=2, model=1, expert=4) mesh: expert-stacked params shard over
    `expert` (GSPMD inserts the dispatch/combine all-to-alls) and the loss
    matches the unsharded step."""
    cfg = TrainConfig(
        model=MOE_MODEL, img_size=32, batch_size=8, lr=1e-3, warmup_steps=2,
        max_steps=20, train_seed=0,
    )
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 8, 48, 48, 3)), jnp.uint16)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 3)), jnp.float32)

    state = create_train_state(cfg, jax.random.key(0))
    _, m_ref = build_train_step(cfg, donate=False)(state, px, sp)

    mesh = make_mesh(model_parallel=1, expert_parallel=4)
    assert mesh.shape == {"data": 2, "model": 1, "expert": 4}
    sharded = jax.device_put(state, state_shardings(mesh, state))
    w1 = sharded.student["backbone"]["blocks_1"]["moe"]["w1"]
    assert w1.addressable_shards[0].data.shape[0] == w1.shape[0] // 4
    router = sharded.student["backbone"]["blocks_1"]["moe"]["router"]["kernel"]
    assert router.addressable_shards[0].data.shape == router.shape  # replicated

    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    step_fn = build_train_step(cfg, mesh=mesh, donate=False)
    state1, m = step_fn(sharded, jax.device_put(px, sh), jax.device_put(sp, sh))
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
    assert float(m["loss_moe_aux"]) == pytest.approx(
        float(m_ref["loss_moe_aux"]), rel=1e-4)
    w1u = state1.student["backbone"]["blocks_1"]["moe"]["w1"]
    assert w1u.addressable_shards[0].data.shape[0] == w1u.shape[0] // 4


def test_moe_config_roundtrip_and_dense_default():
    assert ModelConfig.from_dict(MOE_MODEL.to_dict()).moe_experts == 4
    dense = ModelConfig.from_dict({"dim": 32, "depth": 2, "heads": 2})
    assert dense.moe_experts == 0  # old checkpoints stay dense


def test_tensor_and_expert_parallel_compose():
    """(data=2, model=2, expert=2) mesh: attention qkv/proj shard over
    `model` (Megatron), MoE expert stacks over `expert`, and the step's loss
    matches the unsharded run — the two layouts coexist in one program."""
    cfg = TrainConfig(
        model=MOE_MODEL.replace(moe_experts=2), img_size=32, batch_size=8,
        lr=1e-3, warmup_steps=2, max_steps=20, train_seed=0,
    )
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 8, 48, 48, 3)), jnp.uint16)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 3)), jnp.float32)

    state = create_train_state(cfg, jax.random.key(0))
    _, m_ref = build_train_step(cfg, donate=False)(state, px, sp)

    mesh = make_mesh(model_parallel=2, expert_parallel=2)
    assert mesh.shape == {"data": 2, "model": 2, "expert": 2}
    sharded = jax.device_put(state, state_shardings(mesh, state))
    qkv = sharded.student["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2
    w1 = sharded.student["backbone"]["blocks_1"]["moe"]["w1"]
    assert w1.addressable_shards[0].data.shape[0] == w1.shape[0] // 2

    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
    step_fn = build_train_step(cfg, mesh=mesh, donate=False)
    _, m = step_fn(sharded, jax.device_put(px, sh), jax.device_put(sp, sh))
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
