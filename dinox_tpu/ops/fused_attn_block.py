"""Fused (LN1 -> QKV -> attention -> out-proj -> +residual) half-block kernel.

Round-3 lever #1 (docs/PROFILING.md "Remaining levers"): in the unfused
forward the residual stream makes four HBM round-trips per attention
half-block (LN read folded into the QKV dot, qkv written+read around the
attention kernel, attention output written+read around the out-projection).
This kernel computes the whole half-block per batch-group while the tokens
sit in VMEM: per group-step HBM traffic is x in, y out (+ qkv / attention
output saved for the backward in training mode) — the TPU conclusion of the
reference's fused-attention backend selection (reference
scripts/phase5_big_run.py:1081-1101).

Numerics match the unfused flax path: LayerNorm statistics in f32 with
flax's fast-variance form (E[x^2]-E[x]^2, clipped at 0), bf16 matmul inputs
with f32 MXU accumulation, softmax in f32, residual add in f32.

The backward is COMPOSED (custom_vjp): XLA matmuls for the two projections
and LN (whose backward was already at its shape ceiling in the round-2/3
traces) around the existing packed attention backward kernel
(ops/flash_attention._packed_bwd) — the fwd-side fusion is where the
round-3 trace showed recoverable HBM traffic; the bwd dgrad/wgrad fusions
were already compute-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinox_tpu.ops.flash_attention import MAX_SINGLE_BLOCK_SEQ, _packed_bwd

LN_EPS = 1e-5


def _ln_f32(x32: jnp.ndarray, gamma32: jnp.ndarray, beta32: jnp.ndarray):
    """flax-LayerNorm-exact normalization (f32 stats, fast variance)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) * gamma32 + beta32


def _fused_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, y_ref, qkv_ref, attn_ref, s_scr,
                  *, group: int, heads: int, hd: int, scale: float):
    dim = heads * hd
    for g in range(group):
        x32 = x_ref[g].astype(jnp.float32)
        ln = _ln_f32(x32, g_ref[:].astype(jnp.float32),
                     b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
        qkv_ref[g] = (jax.lax.dot_general(
            ln, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bqkv_ref[:].astype(jnp.float32)).astype(qkv_ref.dtype)
        for h in range(heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd]
            v = qkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
            s_scr[:] = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale).astype(q.dtype), k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s_scr[:], axis=-1, keepdims=True)
            e = jnp.exp(s_scr[:] - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
            attn_ref[g, :, h * hd:(h + 1) * hd] = (o / denom).astype(attn_ref.dtype)
        y = jax.lax.dot_general(
            attn_ref[g], wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bproj_ref[:].astype(jnp.float32)
        y_ref[g] = (x32 + y).astype(y_ref.dtype)


def _pick_group(b: int, n: int, dim: int, itemsize: int) -> int:
    """Largest group whose double-buffered row blocks (x, y, qkv, attn) plus
    the resident weights and (n, n) scratch stay within ~12 MB of VMEM.
    Returns 0 when even group=1 cannot fit (ViT-Giant: the bf16 qkv+proj
    weights alone are ~16 MB) — callers fall back to the composed path."""
    weights = (dim * 3 * dim + dim * dim) * itemsize + 6 * dim * 4
    scratch = n * n * 4
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        rows = 2 * g * n * (dim + dim + 3 * dim + dim) * itemsize
        if weights + scratch + rows <= 12 * 1024 * 1024:
            return g
    return 0


def _fits_fused(x) -> bool:
    b, n, dim = x.shape
    return (n <= MAX_SINGLE_BLOCK_SEQ
            and _pick_group(b, n, dim, x.dtype.itemsize) > 0)


def _call_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads: int):
    b, n, dim = x.shape
    td = 3 * dim
    hd = dim // heads
    group = _pick_group(b, n, dim, x.dtype.itemsize)
    kernel = functools.partial(_fused_kernel, group=group, heads=heads, hd=hd,
                               scale=1.0 / (hd ** 0.5))
    row = lambda i: (i, 0, 0)
    const1 = lambda i: (0,)
    const2 = lambda i: (0, 0)
    wqkv_c = wqkv.astype(x.dtype)
    wproj_c = wproj.astype(x.dtype)
    y, qkv, attn = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, n, dim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, td), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((td,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), const1, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((group, n, dim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, td), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, dim), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, dim), x.dtype),
            jax.ShapeDtypeStruct((b, n, td), x.dtype),
            jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dim * (3 * dim + dim) + 4 * b * heads * n * n * hd,
            bytes_accessed=b * n * (dim + dim + td + dim) * x.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, gamma, beta, wqkv_c, bqkv, wproj_c, bproj)
    return y, qkv, attn


def _xla_half_block(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads):
    """Unfused reference path (used beyond the kernel's seq budget and for
    the composed backward)."""
    from dinox_tpu.ops.flash_attention import flash_attention_packed

    x32 = x.astype(jnp.float32)
    ln = _ln_f32(x32, gamma.astype(jnp.float32),
                 beta.astype(jnp.float32)).astype(x.dtype)
    qkv = (jnp.dot(ln, wqkv.astype(x.dtype), preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(x.dtype)
    attn = flash_attention_packed(qkv, heads)
    y = (jnp.dot(attn, wproj.astype(x.dtype), preferred_element_type=jnp.float32)
         + bproj.astype(jnp.float32))
    return (x32 + y).astype(x.dtype), qkv, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_attn_block(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads: int):
    """y = x + proj(attention(qkv(LN(x)))) with one VMEM-resident pass.

    x: (B, N, dim) bf16; LN params f32 (dim,); wqkv (dim, 3*dim); wproj
    (dim, dim); biases f32. Returns (B, N, dim) in x.dtype. Falls back to
    the composed path beyond the sequence budget or when the weights +
    minimum blocks overflow VMEM (ViT-Giant dims).
    """
    if not _fits_fused(x):
        return _xla_half_block(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads)[0]
    return _call_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads)[0]


def _fwd_rule(x, gamma, beta, wqkv, bqkv, wproj, bproj, heads):
    if not _fits_fused(x):
        y, qkv, attn = _xla_half_block(x, gamma, beta, wqkv, bqkv, wproj,
                                       bproj, heads)
    else:
        y, qkv, attn = _call_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                                   heads)
    return y, (x, gamma, beta, wqkv, wproj, qkv, attn)


def _bwd_rule(heads, res, dy):
    x, gamma, beta, wqkv, wproj, qkv, attn = res
    b, n, dim = x.shape
    dyb = dy.astype(x.dtype)
    # out-projection
    d_attn = jnp.dot(dyb, wproj.astype(x.dtype).T,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    # wgrads keep bf16 operands with f32 MXU accumulation (the unfused
    # Dense path's numerics; f32xf32 would halve the MXU rate)
    flat_attn = attn.reshape(-1, dim)
    flat_dy = dy.reshape(-1, dim).astype(x.dtype)
    dwproj = jnp.dot(flat_attn.T, flat_dy, preferred_element_type=jnp.float32)
    dbproj = jnp.sum(dy.reshape(-1, dim).astype(jnp.float32), axis=0)
    # attention backward (packed kernel; XLA fallback beyond seq budget)
    if n > MAX_SINGLE_BLOCK_SEQ:
        from dinox_tpu.ops.flash_attention import _xla_sdpa_packed

        _, vjp = jax.vjp(lambda t: _xla_sdpa_packed(t, heads), qkv)
        (dqkv,) = vjp(d_attn)
    else:
        dqkv = _packed_bwd(qkv, d_attn, heads)
    # qkv projection; LN(x) recomputed (fused by XLA into the wgrad read)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mu) * rstd
    g32 = gamma.astype(jnp.float32)
    ln = (xhat * g32 + beta.astype(jnp.float32)).astype(x.dtype)
    flat_ln = ln.reshape(-1, dim)
    flat_dqkv = dqkv.reshape(-1, 3 * dim)
    dwqkv = jnp.dot(flat_ln.T, flat_dqkv, preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(flat_dqkv.astype(jnp.float32), axis=0)
    dln = jnp.dot(dqkv, wqkv.astype(x.dtype).T,
                  preferred_element_type=jnp.float32)
    # LayerNorm backward (f32)
    dgamma = jnp.sum(dln * xhat, axis=(0, 1))
    dbeta = jnp.sum(dln, axis=(0, 1))
    dxhat = dln * g32
    dx_ln = rstd * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx = (dy.astype(jnp.float32) + dx_ln).astype(x.dtype)
    return (dx, dgamma, dbeta, dwqkv, dbqkv, dwproj, dbproj)


fused_attn_block.defvjp(_fwd_rule, _bwd_rule)
