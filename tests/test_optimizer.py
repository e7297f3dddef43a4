"""Factored second-moment Adam tests (train/state.py:_scale_by_adam_factored):
exactness on rank-1 gradient structure, tracking vs full Adam on random
gradients, state shapes/memory, end-to-end train-step use, and Orbax
checkpoint roundtrip of the factored state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dinox_tpu.train.checkpoint import CheckpointManager
from dinox_tpu.train.state import (
    _scale_by_adam_factored,
    create_train_state,
)
from dinox_tpu.train.step import build_train_step
from tests.test_train_step import TINY, fake_batch

B1, B2, EPS = 0.9, 0.999, 1e-8


def _full_adam():
    return optax.scale_by_adam(b1=B1, b2=B2, eps=EPS)


def _factored():
    return _scale_by_adam_factored(b1=B1, b2=B2, eps=EPS, mu_dtype=jnp.float32)


def test_factored_exact_on_rank1_grad_structure():
    """|g| = a_i * b_j (rank-1): the r*c/mean(r) reconstruction of nu is
    exact, so factored Adam's update equals full Adam's to float tolerance."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (16, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, (1, 24)).astype(np.float32))
    params = {"w": jnp.zeros((16, 24), jnp.float32)}

    full, fact = _full_adam(), _factored()
    s_full, s_fact = full.init(params), fact.init(params)
    for t in range(5):
        sign = 1.0 if t % 2 == 0 else -1.0
        g = {"w": sign * a * b}
        u_full, s_full = full.update(g, s_full)
        u_fact, s_fact = fact.update(g, s_fact)
        np.testing.assert_allclose(
            np.asarray(u_fact["w"]), np.asarray(u_full["w"]), rtol=2e-5, atol=2e-6
        )


def test_factored_tracks_full_adam_on_random_grads():
    """Random (non-rank-1) gradients: updates stay close in direction and
    magnitude to full Adam — the approximation bounds, not exactness."""
    rng = np.random.default_rng(1)
    params = {"w": jnp.zeros((32, 48), jnp.float32)}
    full, fact = _full_adam(), _factored()
    s_full, s_fact = full.init(params), fact.init(params)
    cosines = []
    for t in range(10):
        g = {"w": jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))}
        u_full, s_full = full.update(g, s_full)
        u_fact, s_fact = fact.update(g, s_fact)
        uf = np.asarray(u_full["w"]).ravel()
        ua = np.asarray(u_fact["w"]).ravel()
        cosines.append(float(np.dot(uf, ua)
                             / (np.linalg.norm(uf) * np.linalg.norm(ua))))
        ratio = float(np.linalg.norm(ua) / np.linalg.norm(uf))
        assert 0.9 < ratio < 1.1, f"update magnitude off at t={t}: {ratio:.3f}"
    # the nu EMA smooths toward the (near-rank-1) expected g^2 surface, so
    # the approximation *improves* with steps: ~0.81 at t=0 -> ~0.98 at t=9
    assert cosines[-1] > 0.95, f"update direction diverged: {cosines[-1]:.4f}"
    assert cosines[-1] > cosines[0] + 0.1


def test_factored_state_shapes():
    """>=2-D params get {r, c} factor EMAs over the trailing two axes
    (f32, ~n+m numbers); 1-D params keep a full f32 nu."""
    params = {
        "kernel": jnp.zeros((8, 12), jnp.float32),
        "bias": jnp.zeros((12,), jnp.float32),
        "patches": jnp.zeros((4, 8, 12), jnp.float32),
    }
    state = _factored().init(params)
    nu = state.nu
    assert set(nu["kernel"].keys()) == {"r", "c"}
    assert nu["kernel"]["r"].shape == (8,) and nu["kernel"]["r"].dtype == jnp.float32
    assert nu["kernel"]["c"].shape == (12,)
    assert nu["patches"]["r"].shape == (4, 8)
    assert nu["patches"]["c"].shape == (4, 12)
    assert nu["bias"].shape == (12,) and not isinstance(nu["bias"], dict)
    # memory: factored nu of the 3-D leaf is (4*8 + 4*12) floats vs 4*8*12
    full_elems = 4 * 8 * 12
    fact_elems = nu["patches"]["r"].size + nu["patches"]["c"].size
    assert fact_elems < full_elems / 4


def test_factored_train_step_runs_and_matches_full_early():
    """End-to-end: the DINO train step with factored_nu=True runs, counts
    steps, and tracks the full-nu run — step-1 loss is computed before any
    optimizer update lands, so it must be identical; later steps diverge only
    by the factorization's approximation error (bounded, not bit-equal)."""
    cfg_full = TINY
    cfg_fact = TINY.replace(factored_nu=True)
    losses = {}
    for name, cfg in (("full", cfg_full), ("fact", cfg_fact)):
        state = create_train_state(cfg, jax.random.key(0))
        step_fn = build_train_step(cfg, donate=False)
        hist = []
        for i in range(3):
            px, sp = fake_batch(cfg, seed=i)
            state, m = step_fn(state, px, sp)
            hist.append(float(m["loss"]))
        losses[name] = hist
        assert int(state.step) == 3
        assert np.isfinite(hist).all()
    assert losses["fact"][0] == pytest.approx(losses["full"][0], rel=1e-6)
    np.testing.assert_allclose(losses["fact"][1:], losses["full"][1:], rtol=0.15)


def test_factored_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a TrainState whose opt_state carries dict-shaped
    factored nu leaves, then resume-step parity with an uninterrupted run."""
    cfg = TINY.replace(factored_nu=True)
    state = create_train_state(cfg, jax.random.key(0))
    step_fn = build_train_step(cfg, donate=False)
    px, sp = fake_batch(cfg, seed=0)
    state, _ = step_fn(state, px, sp)

    mgr = CheckpointManager(tmp_path / "run", keep_last=2, async_save=False)
    mgr.save(1, state)
    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored, _ = mgr.restore(template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    px2, sp2 = fake_batch(cfg, seed=1)
    cont, m_cont = step_fn(state, px2, sp2)
    res, m_res = step_fn(restored, px2, sp2)
    assert float(m_cont["loss"]) == pytest.approx(float(m_res["loss"]), rel=1e-6)
