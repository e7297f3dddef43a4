"""Pipeline parallelism (parallel/pipeline.py + train/pp_step.py):
param-layout round-trip, pipelined forward parity with the sequential block
stack, and a full dp x pp optimizer step matching the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import PatchViT, TransformerBlock, init_backbone, init_model
from dinox_tpu.parallel.pipeline import (
    make_pp_mesh,
    merge_backbone_params,
    merge_model_params,
    pipeline_run_blocks,
    split_backbone_params,
    split_model_params,
)
from dinox_tpu.train.state import TrainConfig, create_train_state

MODEL = ModelConfig(
    name="pp-tiny", img_size=32, patch=16, dim=32, depth=4, heads=2,
    out_dim=64, num_registers=2, scale_aware=True, attn_impl="xla",
    dtype="float32",
)


def trees_close(a, b, atol=1e-5, rtol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


def test_split_merge_roundtrip():
    params = init_backbone(MODEL, jax.random.key(0))
    rest, stacked = split_backbone_params(params, n_stages=2)
    assert "blocks_0" not in rest and "patch_embed" in rest
    lead = jax.tree_util.tree_leaves(stacked)[0].shape[:2]
    assert lead == (2, 2)  # (stages, blocks_per_stage)
    merged = merge_backbone_params(rest, stacked)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
    trees_close(merged, params, atol=0)


def test_split_rejects_indivisible_depth():
    params = init_backbone(MODEL, jax.random.key(0))
    with pytest.raises(ValueError):
        split_backbone_params(params, n_stages=3)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 4), (4, 8)])
def test_pipelined_forward_matches_sequential(pp, n_micro):
    """The GPipe rotation over a (data, pipe) mesh reproduces the sequential
    run_blocks output for real TransformerBlocks."""
    assert len(jax.devices()) == 8
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=pp)
    params = init_backbone(MODEL, jax.random.key(1))
    rest, stacked = split_backbone_params(params, n_stages=pp)

    model = PatchViT(MODEL)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 32, 32, 3)), jnp.float32)
    sp = jnp.ones((16, 3), jnp.float32)
    tokens = model.apply({"params": rest}, x, sp, method=PatchViT.embed)

    blk = TransformerBlock(
        MODEL.dim, MODEL.heads, MODEL.mlp_ratio, attn_impl="xla",
        dtype=jnp.float32, lora=(), fused_mlp=False, fused_attn=False,
        gelu_approx=MODEL.gelu_approx, mesh=None,
    )
    piped = pipeline_run_blocks(
        lambda p, y: blk.apply({"params": p}, y, True),
        stacked, tokens, mesh, n_microbatches=n_micro,
    )
    seq = model.apply({"params": params}, tokens, True, method=PatchViT.run_blocks)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(seq), atol=1e-5)


def test_pipeline_rejects_too_few_microbatches():
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=4)
    params = init_backbone(MODEL, jax.random.key(1))
    _, stacked = split_backbone_params(params, n_stages=4)
    with pytest.raises(ValueError):
        pipeline_run_blocks(
            lambda p, y: y, stacked, jnp.zeros((8, 5, 32)), mesh,
            n_microbatches=2,
        )


def test_pp_train_step_matches_single_device():
    """One full optimizer step on a (data=2, pipe=4) mesh == the plain
    single-device step: same loss/metrics/center. Post-Adam params are not
    compared elementwise — components with ~0 gradient get their first-step
    update sign amplified from f32 reduction-order noise (update ≈ ±lr
    regardless of |g|); the gradient-level parity test below is the
    principled equivalent."""
    from dinox_tpu.train.pp_step import build_pp_train_step, create_pp_train_state
    from dinox_tpu.train.step import build_train_step

    cfg = TrainConfig(
        model=MODEL, img_size=32, batch_size=8, lr=1e-3, warmup_steps=2,
        max_steps=50, koleo_weight=0.1, train_seed=0, pipeline_parallel=4,
        pp_microbatches=8,
    )
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=4)

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 8, 48, 48, 3)), jnp.uint16)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 3)), jnp.float32)

    ref_state = create_train_state(cfg, jax.random.key(0))
    ref_state, ref_m = build_train_step(cfg, donate=False)(ref_state, px, sp)

    pp_state = create_pp_train_state(cfg, jax.random.key(0), mesh)
    pp_state, pp_m = build_pp_train_step(cfg, mesh, donate=False)(pp_state, px, sp)

    assert int(pp_state.step) == 1
    for k in ("loss", "loss_dino", "loss_gram", "loss_koleo", "embed_std",
              "grad_norm", "teacher_entropy"):
        assert float(pp_m[k]) == pytest.approx(
            float(ref_m[k]), rel=1e-5, abs=2e-4), k
    np.testing.assert_allclose(
        np.asarray(pp_state.center), np.asarray(ref_state.center), atol=1e-5)


def test_pp_gradients_match_sequential():
    """Gradients of the pipelined loss == gradients of the sequential
    `_micro_loss` on the same batch (the backward rotation — reversed
    ppermutes through the scan — is exact, including the psum-over-data for
    stage params replicated across the data axis)."""
    from dinox_tpu.models.vit import DinoStudentTeacher
    from dinox_tpu.train.pp_step import make_pp_loss
    from dinox_tpu.train.step import _micro_loss

    cfg = TrainConfig(
        model=MODEL, img_size=32, batch_size=8, lr=1e-3, warmup_steps=2,
        max_steps=50, koleo_weight=0.1, train_seed=0, pipeline_parallel=4,
        pp_microbatches=4,
    )
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=4)
    params = init_model(cfg.model.replace(img_size=32), jax.random.key(0))
    center = jnp.zeros((1, MODEL.out_dim), jnp.float32)
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (16, 3)), jnp.float32)
    key = jax.random.key(7)

    model = DinoStudentTeacher(cfg.model.replace(img_size=32), mesh=None)
    ref_grads = jax.grad(_micro_loss, has_aux=True)(
        params, params, center, batch, sp[:8], key, cfg, model)[0]

    pp = split_model_params(params, n_stages=4)
    loss_fn = make_pp_loss(cfg, mesh)
    pp_grads = jax.grad(loss_fn, has_aux=True)(
        pp, pp, center, batch, sp[:8], key)[0]

    # Per-leaf normalized L2: elementwise f32 comparison is brittle where
    # large per-token contributions cancel (the pipelined backward sums stage
    # cotangents in rotation order); relative ||pp-ref||/||ref|| < 1e-4 is
    # the honest parity measure.
    merged = merge_model_params(jax.device_get(pp_grads))
    ref = jax.device_get(ref_grads)
    for m, r in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(ref)):
        m, r = np.asarray(m, np.float64), np.asarray(r, np.float64)
        err = np.linalg.norm(m - r) / (np.linalg.norm(r) + 1e-12)
        assert err < 1e-4, (r.shape, err)


def test_pp_state_is_stage_sharded():
    from dinox_tpu.parallel.pipeline import PIPE_AXIS
    from dinox_tpu.train.pp_step import create_pp_train_state

    cfg = TrainConfig(model=MODEL, img_size=32, batch_size=8, max_steps=10,
                      pipeline_parallel=2)
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=2)
    state = create_pp_train_state(cfg, jax.random.key(0), mesh)
    leaf = jax.tree_util.tree_leaves(state.student["blocks"])[0]
    assert leaf.sharding.spec[0] == PIPE_AXIS
    rest_leaf = jax.tree_util.tree_leaves(state.student["rest"])[0]
    assert rest_leaf.sharding.spec == jax.sharding.PartitionSpec()


def test_split_model_params_roundtrip():
    params = init_model(MODEL, jax.random.key(2))
    pp = split_model_params(params, n_stages=2)
    assert set(pp) == {"rest", "blocks"}
    assert "head" in pp["rest"]
    merged = merge_model_params(pp)
    trees_close(merged, params, atol=0)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)


@pytest.mark.slow
def test_pretrain_cli_pipeline_parallel_smoke(tmp_path):
    """scripts/pretrain.py --pipeline-parallel 2 runs end-to-end on the
    8-virtual-device CPU mesh: steps complete, losses finite, checkpoint
    saved in the PP layout and restorable."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    run_dir = tmp_path / "run_pp"
    cmd = [
        sys.executable, str(repo / "scripts" / "pretrain.py"),
        "--config", "vit-tiny", "--synthetic-device-batches", "2",
        "--run-dir", str(run_dir), "--batch-size", "8",
        "--img-size", "56", "--canvas", "64", "--max-steps", "3",
        "--warmup-steps", "2", "--lr", "5e-4", "--seed", "3",
        "--scale-aware", "--log-json", "--no-tensorboard",
        "--ckpt-every", "2", "--attn-impl", "xla",
        "--pipeline-parallel", "2", "--pp-microbatches", "4",
    ]
    proc = subprocess.run(cmd, env=env, cwd=repo, capture_output=True,
                          text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [json.loads(ln) for ln in
             (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert [ln["step"] for ln in lines] == [1, 2, 3]
    assert all(np.isfinite(ln["loss"]) for ln in lines)
    assert (run_dir / "ckpt").exists()


def test_run_export_loads_pp_checkpoint(tmp_path):
    """A PP-layout run checkpoint loads through run_export in the STANDARD
    layout: load_backbone_from_run returns the merged student backbone, so
    eval/export/monitor tooling is PP-agnostic."""
    import json

    from dinox_tpu.train.checkpoint import CheckpointManager
    from dinox_tpu.train.pp_step import create_pp_train_state
    from dinox_tpu.train.run_export import load_backbone_from_run, load_state_from_run
    from dinox_tpu.train.trainer import config_dict

    cfg = TrainConfig(model=MODEL, img_size=32, batch_size=8, max_steps=10,
                      pipeline_parallel=2)
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=2)
    state = create_pp_train_state(cfg, jax.random.key(0), mesh)
    run = tmp_path / "run_pp"
    mgr = CheckpointManager(run, async_save=False)
    mgr.save(2, state)
    mgr.close()
    (run / "config.json").write_text(json.dumps(config_dict(cfg), default=str))

    loaded, lcfg, meta = load_state_from_run(run, host=True)
    assert meta["step"] == 2 and lcfg.pipeline_parallel == 2
    expect = merge_model_params(jax.device_get(state.student))
    trees_close(loaded.student, expect, atol=0)

    model = load_backbone_from_run(run)
    trees_close(model.params, expect["backbone"], atol=0)


def test_pp_step_with_remat_runs():
    """use_grad_checkpoint wraps the stage block_fn in jax.checkpoint inside
    the rotation — the PP + remat combination (the memory story for giant
    models) compiles and takes a finite step."""
    from dinox_tpu.train.pp_step import build_pp_train_step, create_pp_train_state

    cfg = TrainConfig(
        model=MODEL.replace(use_grad_checkpoint=True), img_size=32,
        batch_size=8, lr=1e-3, warmup_steps=2, max_steps=10,
        pipeline_parallel=2, pp_microbatches=4,
    )
    mesh = make_pp_mesh(jax.devices(), pipeline_parallel=2)
    state = create_pp_train_state(cfg, jax.random.key(0), mesh)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(30000, 36000, (1, 8, 48, 48, 3)), jnp.uint16)
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 3)), jnp.float32)
    state, m = build_pp_train_step(cfg, mesh, donate=False)(state, px, sp)
    assert np.isfinite(float(m["loss"])) and int(state.step) == 1
