"""Fused transformer-MLP half-block Pallas kernel.

Computes ``y = x + fc2(gelu(fc1(LayerNorm(x))))`` in one pass over VMEM.
Unfused, XLA materializes the LN output (B,N,C), the fc1 output and the GELU
output (B,N,4C each) to HBM in both directions — for the ViT-S DINO step
that's most of the ~54 GB/step the round-2 trace attributed to the matmul
fusions (docs/PROFILING.md). Fused, the HBM traffic per call is one read of
x, one write of y, and the (tiny) weights.

The backward is a custom VJP in the same style: one kernel pass recomputes
LN/fc1/GELU on-chip, produces dx in row blocks, and accumulates dW1/db1/
dW2/db2/dgamma/dbeta across grid steps into constant-index output blocks —
safe because TPU Pallas grids execute sequentially.

Parity contract: exact (erf) GELU and LayerNorm eps 1e-5, matching
models/vit.py (reference zoo/arch.py:62-97). The flax Mlp module remains the
fallback; parameters are passed in (not owned), so checkpoint layout, LoRA
targeting, and the torch bijection are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — below bf16
    rounding). Mosaic has no erf lowering, so the kernel carries its own."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    # exact-erf GELU in f32 (torch nn.GELU default), erf via _erf_f32
    return 0.5 * x * (1.0 + _erf_f32(x * _SQRT_HALF))


def _dgelu_f32(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x)
    return (0.5 * (1.0 + _erf_f32(x * _SQRT_HALF))
            + x * jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI)


def _ln_f32(x, gamma, beta):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mu) * rstd
    return xhat * gamma + beta, xhat, rstd


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)
    ln, _, _ = _ln_f32(x, g_ref[...].astype(jnp.float32), b_ref[...].astype(jnp.float32))
    h = jax.lax.dot(ln.astype(x_ref.dtype), w1_ref[...],
                    preferred_element_type=jnp.float32) + b1_ref[...]
    a = _gelu_f32(h)
    y = jax.lax.dot(a.astype(x_ref.dtype), w2_ref[...],
                    preferred_element_type=jnp.float32) + b2_ref[...]
    y_ref[...] = (x + y).astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    ln, xhat, rstd = _ln_f32(x, gamma, b_ref[...].astype(jnp.float32))
    lnb = ln.astype(x_ref.dtype)
    h = jax.lax.dot(lnb, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
    a = _gelu_f32(h)
    ab = a.astype(x_ref.dtype)
    dy = dy_ref[...].astype(jnp.float32)
    dyb = dy.astype(x_ref.dtype)

    # fc2
    dw2_ref[...] += jax.lax.dot_general(
        ab, dyb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        dyb, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # gelu
    dh = da * _dgelu_f32(h)
    dhb = dh.astype(x_ref.dtype)
    # fc1
    dw1_ref[...] += jax.lax.dot_general(
        lnb, dhb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dhb, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # layernorm
    dg_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxh = dln * gamma
    dx_ln = rstd * (
        dxh
        - jnp.mean(dxh, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = (dy + dx_ln).astype(dx_ref.dtype)


def _row_block(m: int, c: int, hidden: int, itemsize: int) -> int:
    """Rows per grid step (inputs are padded up to a multiple). Resident
    VMEM: weights (bf16) + the f32 dW accumulators (~3x c*hidden*4 total)
    leave roughly 6 MB for the double-buffered row blocks and f32 h/a
    scratch."""
    for r in (512, 256, 128, 64):
        if r * (6 * c * itemsize + 3 * hidden * 4) <= 6 * 1024 * 1024:
            return min(r, max(8, m))
    return 8


def _pad_rows(a, r):
    m = a.shape[0]
    pad = (-m) % r
    if pad == 0:
        return a, m
    return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0), m


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _fwd(x2, gamma, beta, w1, b1, w2, b2):
    hidden = w1.shape[1]
    r = _row_block(x2.shape[0], x2.shape[1], hidden, x2.dtype.itemsize)
    x2, m_orig = _pad_rows(x2, r)
    m, c = x2.shape
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(m // r,),
        in_specs=[row, _const_spec((1, c)), _const_spec((1, c)),
                  _const_spec((c, hidden)), _const_spec((1, hidden)),
                  _const_spec((hidden, c)), _const_spec((1, c))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * hidden,
            bytes_accessed=2 * m * c * x2.dtype.itemsize,
            transcendentals=m * hidden,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x2, gamma, beta, w1, b1, w2, b2)
    return out[:m_orig]


def _bwd(x2, gamma, beta, w1, b1, w2, dy2):
    hidden = w1.shape[1]
    r = _row_block(x2.shape[0], x2.shape[1], hidden, x2.dtype.itemsize)
    x2, m_orig = _pad_rows(x2, r)
    dy2, _ = _pad_rows(dy2, r)
    m, c = x2.shape
    row = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = (
        jax.ShapeDtypeStruct((m, c), x2.dtype),      # dx
        jax.ShapeDtypeStruct((1, c), f32),           # dgamma
        jax.ShapeDtypeStruct((1, c), f32),           # dbeta
        jax.ShapeDtypeStruct((c, hidden), f32),      # dw1
        jax.ShapeDtypeStruct((1, hidden), f32),      # db1
        jax.ShapeDtypeStruct((hidden, c), f32),      # dw2
        jax.ShapeDtypeStruct((1, c), f32),           # db2
    )
    out_specs = (row, _const_spec((1, c)), _const_spec((1, c)),
                 _const_spec((c, hidden)), _const_spec((1, hidden)),
                 _const_spec((hidden, c)), _const_spec((1, c)))
    res = pl.pallas_call(
        _bwd_kernel,
        grid=(m // r,),
        in_specs=[row, _const_spec((1, c)), _const_spec((1, c)),
                  _const_spec((c, hidden)), _const_spec((1, hidden)),
                  _const_spec((hidden, c)), row],
        out_specs=out_specs,
        out_shape=outs,
        cost_estimate=pl.CostEstimate(
            flops=12 * m * c * hidden,
            bytes_accessed=3 * m * c * x2.dtype.itemsize,
            transcendentals=2 * m * hidden,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x2, gamma, beta, w1, b1, w2, dy2)
    return (res[0][:m_orig],) + tuple(res[1:])


@jax.custom_vjp
def fused_mlp_block(x, gamma, beta, w1, b1, w2, b2):
    """x (B, N, C) + LN/fc1/fc2 params -> x + fc2(gelu(fc1(LN(x))))."""
    b, n, c = x.shape
    y = _fwd(x.reshape(b * n, c),
             gamma.reshape(1, c), beta.reshape(1, c),
             w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
             w2.astype(x.dtype), b2.reshape(1, c).astype(jnp.float32))
    return y.reshape(b, n, c)


def _vjp_fwd(x, gamma, beta, w1, b1, w2, b2):
    return fused_mlp_block(x, gamma, beta, w1, b1, w2, b2), (x, gamma, beta, w1, b1, w2, b2)


def _vjp_bwd(res, dy):
    x, gamma, beta, w1, b1, w2, b2 = res
    b, n, c = x.shape
    dx2, dg, db, dw1, db1, dw2, db2 = _bwd(
        x.reshape(b * n, c),
        gamma.reshape(1, c), beta.reshape(1, c),
        w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(x.dtype),
        dy.reshape(b * n, c),
    )
    return (dx2.reshape(b, n, c),
            dg.reshape(c).astype(gamma.dtype), db.reshape(c).astype(beta.dtype),
            dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(c).astype(b2.dtype))


fused_mlp_block.defvjp(_vjp_fwd, _vjp_bwd)


def mlp_block_reference(x, gamma, beta, w1, b1, w2, b2):
    """XLA reference implementation (same math) for tests and fallback."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta).astype(x.dtype)
    h = (ln @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    a = 0.5 * h * (1.0 + jax.lax.erf(h * _SQRT_HALF))  # true erf for the oracle
    y = (a.astype(x.dtype) @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (xf + y).astype(x.dtype)
