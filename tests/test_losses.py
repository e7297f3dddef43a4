"""Loss-function tests, including golden cross-checks against an independent
torch implementation of the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dinox_tpu.train.losses import (
    dino_loss,
    gram_anchoring_loss,
    gram_matrix,
    koleo_loss,
    simclr_loss,
)
from dinox_tpu.train.schedule import get_lr, get_lr_jnp


def torch_dino(student, teacher, center, s_temp, t_temp):
    """Independent torch re-statement of the reference DINO loss formula
    (phase5_big_run.py:692-717) used as a golden oracle."""
    t_prob = F.softmax((teacher - center) / t_temp, dim=-1)
    s_logp = F.log_softmax(student / s_temp, dim=-1)
    b = teacher.shape[0] // 2
    l1 = -(t_prob[:b] * s_logp[b:]).sum(-1).mean()
    l2 = -(t_prob[b:] * s_logp[:b]).sum(-1).mean()
    return ((l1 + l2) / 2).item()


def test_dino_loss_matches_torch_oracle():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(8, 32)).astype(np.float32)
    t = rng.normal(size=(8, 32)).astype(np.float32)
    c = rng.normal(size=(1, 32)).astype(np.float32) * 0.1
    out = dino_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(c),
                    student_temp=0.1, teacher_temp=0.04, center_momentum=0.9)
    want = torch_dino(torch.tensor(s), torch.tensor(t), torch.tensor(c), 0.1, 0.04)
    assert abs(float(out.loss) - want) < 1e-5
    # Center EMA: c*m + mean(t)*(1-m)
    want_center = c * 0.9 + t.mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(np.asarray(out.new_center), want_center, atol=1e-6)


def test_dino_loss_gradient_flows_only_via_student():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    c = jnp.zeros((1, 16))

    g_s = jax.grad(lambda x: dino_loss(x, t, c).loss)(s)
    g_t = jax.grad(lambda x: dino_loss(s, x, c).loss)(t)
    assert float(jnp.abs(g_s).sum()) > 0
    assert float(jnp.abs(g_t).sum()) == 0  # stop_gradient on teacher


def test_gram_loss_zero_for_identical_and_excludes_cls():
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    assert float(gram_anchoring_loss(f, f)) == 0.0
    # Changing ONLY the CLS token (index 0) must not change the loss.
    f2 = f.at[:, 0].set(99.0)
    g = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    assert abs(float(gram_anchoring_loss(f, g)) - float(gram_anchoring_loss(f2, g))) < 1e-7


def test_gram_matrix_against_torch():
    rng = np.random.default_rng(3)
    f = rng.normal(size=(2, 5, 8)).astype(np.float32)
    got = np.asarray(gram_matrix(jnp.asarray(f)))
    tf = F.normalize(torch.tensor(f), p=2, dim=-1)
    want = torch.bmm(tf, tf.transpose(1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_koleo_against_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    got = float(koleo_loss(jnp.asarray(x)))
    xt = F.normalize(torch.tensor(x), p=2, dim=-1)
    pd = torch.cdist(xt, xt, p=2) + torch.eye(16) * 1e9
    want = (-torch.log(pd.min(dim=1).values + 1e-8)).mean().item()
    assert abs(got - want) < 1e-4


def test_koleo_prefers_spread():
    tight = jnp.asarray(np.random.default_rng(5).normal(size=(8, 4)) * 0.01 + 1.0, jnp.float32)
    spread = jnp.asarray(np.random.default_rng(6).normal(size=(8, 4)), jnp.float32)
    assert float(koleo_loss(tight)) > float(koleo_loss(spread))


def test_simclr_against_torch():
    rng = np.random.default_rng(7)
    z1 = rng.normal(size=(6, 12)).astype(np.float32)
    z2 = rng.normal(size=(6, 12)).astype(np.float32)
    got = float(simclr_loss(jnp.asarray(z1), jnp.asarray(z2), 0.1))
    a = F.normalize(torch.tensor(z1), dim=1)
    b = F.normalize(torch.tensor(z2), dim=1)
    feats = torch.cat([a, b])
    sim = feats @ feats.T / 0.1
    sim.masked_fill_(torch.eye(12).bool(), -9e15)
    target = torch.cat([torch.arange(6, 12), torch.arange(0, 6)])
    want = F.cross_entropy(sim, target).item()
    assert abs(got - want) < 1e-4


def test_simclr_perfect_alignment_low_loss():
    z = jnp.asarray(np.random.default_rng(8).normal(size=(8, 16)), jnp.float32)
    aligned = float(simclr_loss(z, z, 0.1))
    random = float(
        simclr_loss(z, jnp.asarray(np.random.default_rng(9).normal(size=(8, 16)), jnp.float32))
    )
    assert aligned < random


# -- schedule ---------------------------------------------------------------


def test_lr_schedule_golden():
    # warmup: step 0 -> base/warmup, step warmup-1 -> base
    assert get_lr(0, 100, 10, 1.0, 0.0) == pytest.approx(0.1)
    assert get_lr(9, 100, 10, 1.0, 0.0) == pytest.approx(1.0)
    # cosine midpoint
    assert get_lr(55, 100, 10, 1.0, 0.0) == pytest.approx(0.5)
    # horizon clamp and None hold
    assert get_lr(100, 100, 10, 1.0, 1e-6) == 1e-6
    assert get_lr(10_000, None, 10, 1.0, 1e-6) == 1.0


def test_lr_schedule_jnp_matches_python():
    for total in (100, None):
        for step in (0, 5, 9, 10, 50, 99, 150):
            want = get_lr(step, total, 10, 3e-4, 1e-6)
            got = float(get_lr_jnp(jnp.asarray(step), total, 10, 3e-4, 1e-6))
            assert got == pytest.approx(want, rel=1e-5), (total, step)
