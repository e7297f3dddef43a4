"""Fused multi-head attention Pallas kernel for TPU.

The TPU analog of the reference's SDPA kernel dispatch (zoo/arch.py:51 +
--sdp-backend, scripts/phase5_big_run.py:1081-1101). ViT-on-CT sequences are
short (261 = CLS + 256 patches + 4 registers, SURVEY.md §5), so the whole
(N, D) per-(batch, head) problem fits in VMEM in one block: the kernel fuses
QK^T -> stable softmax -> PV with the logits kept in f32 registers and never
materialized to HBM — one HBM round-trip instead of four.

For sequences beyond the single-block budget the public entry point falls
back to XLA attention (same math), keeping the escape hatch the reference's
backend selector provided. The backward pass is a custom VJP that recomputes
attention with XLA ops (flash-style recompute; a dedicated backward kernel is
a later optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this sequence length the single-block kernel would overflow VMEM;
# fall back to XLA. 2048*2048*4B logits ≈ 16 MB is the hard ceiling; stay
# well under it.
MAX_SINGLE_BLOCK_SEQ = 1024


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch, head) tile: o = softmax(q k^T * scale) v, f32 accumulate."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_mha_kernel, scale=scale)
    grid = (b * h,)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=jax.default_backend() == "cpu",  # CPU: testable via interpreter
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _xla_sdpa(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (1.0 / (d ** 0.5)), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused MHA: (B, H, N, D) each -> (B, H, N, D)."""
    if q.shape[2] > MAX_SINGLE_BLOCK_SEQ:
        return _xla_sdpa(q, k, v)
    return _flash_fwd(q, k, v)


def _fwd_rule(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _bwd_rule(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_sdpa, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
