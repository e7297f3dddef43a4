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


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, group: int):
    """One grid step = `group` (batch*head) pairs, looped in-register.

    Grouping amortizes per-grid-step pipeline overhead: with 1 pair/step the
    kernel is launch-bound (~1.5k tiny matmuls per ViT-S layer stack); with
    G=8 the DMA of the next group overlaps a longer compute span.
    """

    def one(g, _):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        o_ref[g] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, group, one, None, unroll=True)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    bh = b * h
    group = 1
    for g in (8, 4, 2):
        if bh % g == 0:
            group = g
            break
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_mha_kernel, scale=scale, group=group)
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    spec = pl.BlockSpec((group, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
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


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                    *, scale: float, group: int):
    """Grouped flash-attention backward: recompute P in VMEM, then
    dV = P^T dO; dP = dO V^T; dS = P*(dP - rowsum(dP*P)); dQ = dS K * s;
    dK = dS^T Q * s. Five matmuls per pair, logits never touch HBM."""

    def one(g, _):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pb = p.astype(v.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = (ds * scale).astype(q.dtype)
        dq_ref[g] = jnp.dot(dsb, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            dsb, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        return _

    jax.lax.fori_loop(0, group, one, None, unroll=True)


def _flash_bwd(q, k, v, do):
    b, h, n, d = q.shape
    bh = b * h
    group = 1
    for g in (8, 4, 2):
        if bh % g == 0:
            group = g
            break
    kernel = functools.partial(_mha_bwd_kernel, scale=1.0 / (d ** 0.5), group=group)
    spec = pl.BlockSpec((group, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((bh, n, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=jax.default_backend() == "cpu",
    )(q.reshape(bh, n, d), k.reshape(bh, n, d), v.reshape(bh, n, d), do.reshape(bh, n, d))
    shape = (b, h, n, d)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


def _fwd_rule(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _bwd_rule(res, g):
    q, k, v = res
    if q.shape[2] > MAX_SINGLE_BLOCK_SEQ:
        _, vjp = jax.vjp(_xla_sdpa, q, k, v)
        return vjp(g)
    return _flash_bwd(q, k, v, g)


flash_attention.defvjp(_fwd_rule, _bwd_rule)


# -- packed-QKV layout-native kernel -----------------------------------------
#
# The (B, H, N, D) kernel above needs six XLA transposes per attention call
# (qkv -> q/k/v head-major, out -> token-major); a round-2 trace showed those
# "data formatting" ops moving 22 GB/step. This variant consumes the fused QKV
# projection output (B, N, 3*dim) AS PRODUCED and emits (B, N, dim) AS
# CONSUMED by the out-projection — zero HBM layout changes. Heads live in
# static 64/128-wide column slices of the 3*dim axis, so every BlockSpec stays
# <= 3-D (the 5-D packed layout Mosaic rejected in round 1, commit 6ed7b95).


def _packed_kernel(qkv_ref, o_ref, *, scale: float, group: int, heads: int, hd: int):
    dim = heads * hd
    # group/heads are static -> Python loops keep every slice static.
    for g in range(group):
        for h in range(heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd]
            v = qkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
            # scale folded into q (an (n,d) multiply, not (n,n)); softmax
            # normalization folded into the (n,d) output for the same reason.
            s = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale).astype(q.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[g, :, h * hd:(h + 1) * hd] = (o / denom).astype(o_ref.dtype)


def _packed_bwd_kernel(qkv_ref, do_ref, dqkv_ref,
                       *, scale: float, group: int, heads: int, hd: int):
    dim = heads * hd
    for g in range(group):
        for h in range(heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd]
            v = qkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
            do = do_ref[g, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = p.astype(v.dtype)
            dv = jax.lax.dot_general(
                pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(q.dtype)
            dqkv_ref[g, :, h * hd:(h + 1) * hd] = jnp.dot(
                dsb, k, preferred_element_type=jnp.float32
            ).astype(dqkv_ref.dtype)
            dqkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd] = jax.lax.dot_general(
                dsb, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)
            dqkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd] = dv.astype(dqkv_ref.dtype)


def _pick_group(b: int, per_item_bytes: int, budget: int) -> int:
    """Largest group whose double-buffered blocks fit the VMEM budget
    (the pipeline keeps 2x every in/out block resident)."""
    for g in (8, 4, 2, 1):
        if b % g == 0 and 2 * g * per_item_bytes <= budget:
            return g
    return 1


# Mosaic's scoped-vmem (kernel stack) limit is 16 MB; the backward kernels
# keep ~2 live (n, n) f32 scratch arrays per UNROLLED (group, head) step, so
# many-head configs (e.g. the MAE decoder: heads=16, dim=512 -> combined
# path) blow the stack even when the I/O blocks fit VMEM. Observed on chip:
# group=2 x heads=16 x 2 x 257^2 x 4B ~= 17 MB -> "Ran out of memory in
# memory space vmem ... scoped allocation".
_SCOPED_STACK_BUDGET = 12 * 1024 * 1024


def _shrink_group_for_stack(group: int, heads: int, n: int, live: int = 2) -> int:
    while group > 1 and group * heads * live * n * n * 4 > _SCOPED_STACK_BUDGET:
        group //= 2
    return group


def _packed_fwd(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    # fwd VMEM per item: qkv block + out block; the unrolled per-head f32
    # logits scratch needs real headroom (group 8 fit standalone but OOMed
    # inside the full train step at 20.4M/16M).
    group = _pick_group(b, (three_dim + dim) * n * qkv.dtype.itemsize,
                        budget=8 * 1024 * 1024)
    scale = 1.0 / (hd ** 0.5)
    kernel = functools.partial(
        _packed_kernel, scale=scale, group=group, heads=heads, hd=hd
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[pl.BlockSpec((group, n, three_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * hd,
            bytes_accessed=(three_dim + dim) * b * n * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() == "cpu",
    )(qkv)
    return out


def _packed_bwd_dq_kernel(qkv_ref, do_ref, dq_ref, *, scale, group, heads, hd):
    dim = heads * hd
    for g in range(group):
        for h in range(heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd]
            v = qkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
            do = do_ref[g, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(q.dtype)
            dq_ref[g, :, h * hd:(h + 1) * hd] = jnp.dot(
                dsb, k, preferred_element_type=jnp.float32
            ).astype(dq_ref.dtype)


def _packed_bwd_dkv_kernel(qkv_ref, do_ref, dk_ref, dv_ref, *, scale, group, heads, hd):
    dim = heads * hd
    for g in range(group):
        for h in range(heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, dim + h * hd:dim + (h + 1) * hd]
            v = qkv_ref[g, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
            do = do_ref[g, :, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = p.astype(v.dtype)
            dv_ref[g, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(q.dtype)
            dk_ref[g, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                dsb, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)


def _packed_bwd_split(qkv: jnp.ndarray, do: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Backward for dims whose single-kernel blocks overflow VMEM (ViT-Giant:
    10.3 MB double-buffered + f32 scratch > 16 MB): two kernels — dq, then
    dk+dv — each with a 1/3-size output block set. P is recomputed twice
    (~30% extra attention FLOPs) to buy the VMEM headroom; still no XLA-side
    transposes. One concatenate assembles dqkv."""
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    scale = 1.0 / (hd ** 0.5)
    per_item = (three_dim + 2 * dim) * n * qkv.dtype.itemsize
    group = _pick_group(b, per_item, budget=9 * 1024 * 1024)
    group = _shrink_group_for_stack(group, heads, n)
    spec_qkv = pl.BlockSpec((group, n, three_dim), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((group, n, dim), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((b, n, dim), qkv.dtype)
    interp = jax.default_backend() == "cpu"
    cost = pl.CostEstimate(
        flops=6 * b * heads * n * n * hd,
        bytes_accessed=(three_dim + 2 * dim) * b * n * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    dq = pl.pallas_call(
        functools.partial(_packed_bwd_dq_kernel, scale=scale, group=group,
                          heads=heads, hd=hd),
        grid=(b // group,), in_specs=[spec_qkv, spec_d], out_specs=spec_d,
        out_shape=shp, cost_estimate=cost, interpret=interp,
    )(qkv, do)
    dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_dkv_kernel, scale=scale, group=group,
                          heads=heads, hd=hd),
        grid=(b // group,), in_specs=[spec_qkv, spec_d], out_specs=(spec_d, spec_d),
        out_shape=(shp, shp), cost_estimate=cost, interpret=interp,
    )(qkv, do)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _packed_bwd(qkv: jnp.ndarray, do: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    # Whole-row blocks don't fit VMEM at giant dims even ungrouped
    # (ViT-G: 2*(2*4224+1408)*261*2B = 10.3 MB blocks + f32 scratch > 16 MB)
    # -> split into dq and dk/dv kernels.
    if 2 * (2 * three_dim + dim) * n * qkv.dtype.itemsize > 8 * 1024 * 1024:
        return _packed_bwd_split(qkv, do, heads)
    # bwd keeps more f32 scratch alive (s/p/dp per unrolled head) -> bigger margin
    group = _pick_group(b, (2 * three_dim + dim) * n * qkv.dtype.itemsize,
                        budget=9 * 1024 * 1024)
    group = _shrink_group_for_stack(group, heads, n)
    if group * heads * 2 * n * n * 4 > _SCOPED_STACK_BUDGET:
        # even ungrouped the unrolled heads overflow the kernel stack ->
        # the split kernels' smaller live sets are the remaining headroom
        return _packed_bwd_split(qkv, do, heads)
    kernel = functools.partial(
        _packed_bwd_kernel, scale=1.0 / (hd ** 0.5), group=group, heads=heads, hd=hd
    )
    spec_qkv = pl.BlockSpec((group, n, three_dim), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((group, n, dim), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[spec_qkv, spec_o],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((b, n, three_dim), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * n * n * hd,
            bytes_accessed=(2 * three_dim + dim) * b * n * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=jax.default_backend() == "cpu",
    )(qkv, do)


def _xla_sdpa_packed(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    q, k, v = (
        qkv[:, :, i * dim:(i + 1) * dim].reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    return _xla_sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def flash_attention_packed(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Layout-native fused MHA: qkv (B, N, 3*dim) [q|k|v] -> (B, N, dim)."""
    if qkv.shape[1] > MAX_SINGLE_BLOCK_SEQ:
        return _xla_sdpa_packed(qkv, heads)
    return _packed_fwd(qkv, heads)


def _packed_fwd_rule(qkv, heads):
    return flash_attention_packed(qkv, heads), qkv


def _packed_bwd_rule(heads, qkv, g):
    if qkv.shape[1] > MAX_SINGLE_BLOCK_SEQ:
        _, vjp = jax.vjp(lambda t: _xla_sdpa_packed(t, heads), qkv)
        return vjp(g)
    return (_packed_bwd(qkv, g, heads),)


flash_attention_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)


def flash_attention_packed_sharded(
    qkv: jnp.ndarray, heads: int, mesh
) -> jnp.ndarray:
    """Multi-device dispatch of the packed kernel via ``jax.shard_map``.

    Under GSPMD a bare ``pallas_call`` is an opaque custom call — the
    partitioner would all-gather its operands and run it replicated. This
    wrapper makes the parallelism explicit instead: the batch is split over
    the mesh's ``data`` axis and heads over the ``model`` axis, so each device
    runs the unmodified single-device kernel on its local (B/dp, N, 3*dim/tp)
    shard. Attention is embarrassingly parallel over both axes — no
    collectives inside.

    Head locality: the fused-QKV output (B, N, 3*dim) is column-sharded by
    GSPMD in contiguous thirds-of-everything chunks that straddle the q/k/v
    boundaries, so it is first reshaped to (B, N, 3, heads, hd) and sharded on
    the *heads* axis (one reshard, inserted by XLA at the shard_map boundary).
    The local (B_l, N, 3, h_local, hd) block then flattens — 3-major — back to
    exactly the packed [q_l | k_l | v_l] layout the kernel consumes, and the
    (B, N, dim) output comes back sharded on its last axis over ``model``,
    which is precisely the layout the row-parallel out-projection contracts
    (XLA adds the psum there, Megatron-style).
    """
    from dinox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from jax.sharding import PartitionSpec as P

    b, n, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    tp = mesh.shape.get(MODEL_AXIS, 1)
    dp = mesh.shape.get(DATA_AXIS, 1)
    if heads % tp:
        raise ValueError(f"heads={heads} not divisible by model axis size {tp}")
    if b % dp:
        raise ValueError(f"batch={b} not divisible by data axis size {dp}")
    h_local = heads // tp

    def local(x):  # (B_l, N, 3, h_local, hd)
        b_l = x.shape[0]
        packed = x.reshape(b_l, n, 3 * h_local * hd)
        return flash_attention_packed(packed, h_local)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(DATA_AXIS, None, None, MODEL_AXIS, None),
        out_specs=P(DATA_AXIS, None, MODEL_AXIS),
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # the body is per-shard with no collectives, so the check adds nothing.
        check_vma=False,
    )(qkv.reshape(b, n, 3, heads, hd))
    return out

