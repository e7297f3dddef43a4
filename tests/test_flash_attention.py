"""Pallas flash-attention kernel tests (interpret mode on CPU; the real
kernel is exercised on TPU by bench.py and the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np

from dinox_tpu.ops.flash_attention import _flash_fwd, _xla_sdpa, flash_attention


def make_qkv(b=2, h=3, n=37, d=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(b, h, n, d)), dtype) for _ in range(3))


def test_kernel_matches_xla_f32():
    q, k, v = make_qkv()
    got = np.asarray(_flash_fwd(q, k, v))
    want = np.asarray(_xla_sdpa(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_kernel_matches_xla_bf16():
    q, k, v = make_qkv(dtype=jnp.bfloat16)
    got = np.asarray(_flash_fwd(q, k, v).astype(jnp.float32))
    want = np.asarray(_xla_sdpa(q, k, v).astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_softmax_rows_normalized():
    """Output of attention over constant V must be exactly V (row-stochastic P)."""
    q, k, _ = make_qkv(n=9, d=8)
    v = jnp.ones_like(q)
    out = np.asarray(_flash_fwd(q, k, v))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_custom_vjp_matches_xla_grad():
    q, k, v = make_qkv(n=17, d=8)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_sdpa(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_long_seq_falls_back_to_xla():
    q, k, v = make_qkv(b=1, h=1, n=1500, d=8)
    out = flash_attention(q, k, v)  # must not attempt a 1500^2 VMEM block
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_sdpa(q, k, v)), atol=1e-5
    )


# -- packed-QKV layout-native kernel -----------------------------------------


def test_packed_matches_xla_fwd_and_grad():
    from dinox_tpu.ops.flash_attention import _xla_sdpa_packed, flash_attention_packed

    rng = np.random.default_rng(0)
    for b, n, dim, heads in [(4, 37, 96, 6), (2, 33, 176, 2)]:  # hd 16 and 88
        qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(flash_attention_packed(qkv, heads)),
            np.asarray(_xla_sdpa_packed(qkv, heads)), atol=1e-5,
        )
        g1 = jax.grad(lambda t: jnp.sum(jnp.sin(flash_attention_packed(t, heads))))(qkv)
        g2 = jax.grad(lambda t: jnp.sum(jnp.sin(_xla_sdpa_packed(t, heads))))(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_packed_split_bwd_matches_xla():
    """The large-dim backward (split dq and dk/dv kernels) is exercised
    directly since the dispatch threshold only picks it at giant dims."""
    from dinox_tpu.ops.flash_attention import _packed_bwd_split, _xla_sdpa_packed

    rng = np.random.default_rng(1)
    b, n, dim, heads = 2, 29, 96, 3
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)).astype(np.float32))
    out = _xla_sdpa_packed(qkv, heads)
    do = jnp.cos(out)
    want = jax.grad(lambda t: jnp.sum(jnp.sin(_xla_sdpa_packed(t, heads))))(qkv)
    got = _packed_bwd_split(qkv, do, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_packed_long_seq_falls_back_to_xla():
    from dinox_tpu.ops.flash_attention import _xla_sdpa_packed, flash_attention_packed

    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(1, 1500, 3 * 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(flash_attention_packed(qkv, 2)),
        np.asarray(_xla_sdpa_packed(qkv, 2)), atol=1e-5,
    )


def test_bwd_group_shrinks_under_scoped_stack_budget():
    """Many-head configs (MAE decoder: heads=16, dim=512, n=257) must shrink
    the backward group so the unrolled per-head f32 scratch stays under
    Mosaic's scoped-vmem stack limit (observed 18 MB blowup on chip at
    group=2), while ViT-S/L shapes keep their groups."""
    from dinox_tpu.ops.flash_attention import (
        _SCOPED_STACK_BUDGET,
        _shrink_group_for_stack,
        _xla_sdpa_packed,
        flash_attention_packed,
    )

    # decoder shape: group 2 -> 1
    assert _shrink_group_for_stack(2, heads=16, n=257) == 1
    assert 1 * 16 * 2 * 257 * 257 * 4 <= _SCOPED_STACK_BUDGET
    # ViT-S shape: group 2 stays
    assert _shrink_group_for_stack(2, heads=6, n=261) == 2

    # numerics at decoder dims (group 1 path)
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(2, 257, 3 * 512)).astype(np.float32) * 0.1)
    g1 = jax.grad(lambda t: jnp.sum(jnp.sin(flash_attention_packed(t, 16))))(qkv)
    g2 = jax.grad(lambda t: jnp.sum(jnp.sin(_xla_sdpa_packed(t, 16))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
