"""Analytic model-FLOPs accounting for MFU reporting.

MFU = (model FLOPs/s the training loop achieves) / (chip peak FLOPs/s).
Model FLOPs use the standard convention (matmul = 2*m*n*k; backward = 2x
forward; only the model's own matmuls counted): DINO training processes each
slice as TWO augmented views, each through student forward + backward and a
stop-gradient teacher forward, so

    flops_per_slice = 2 views * (3 + 1) * forward_flops_per_view

Counted per view: conv patch embed, per-block qkv/proj/mlp matmuls, the two
attention batched matmuls (QK^T, AV), and the DINO head on CLS. Excluded
(each <1% at ViT-S scale): LayerNorm/GELU/softmax elementwise work, the
scale-embed MLP, Gram-loss bmm, the on-device augmentation pipeline, and the
optimizer update. This mirrors how the per-op ceilings in docs/PROFILING.md
were measured, so headline MFU and the per-op analysis compose.
"""

from __future__ import annotations

from dinox_tpu.models.config import ModelConfig

# TPU v5e: one MXU chip, bf16 dense peak (public spec: 197 TFLOP/s bf16).
V5E_PEAK_FLOPS_BF16 = 197e12


def moe_flops_per_view_per_block(mcfg: ModelConfig) -> float:
    """Matmul FLOPs of ONE Switch-MoE MLP block on one view's tokens.

    Mirrors models/moe.py's dense-dispatch formulation exactly (grouped per
    image, so the per-view group is the N=seq_len tokens): router projection,
    the (N,E,C)x(N,D) dispatch einsum, the expert FFN over the (E,C,D)
    buffer, and the combine einsum. The dispatch/combine terms are REAL MXU
    work unique to the dense-dispatch design: grouped, they cost N/H of the
    expert FFN (~17% at ViT-S); UNgrouped, C grows with the global token
    count and they dwarf the FFN — the quantitative fact behind the round-4
    GShard grouping fix (128 -> 692 slices/s) that this model would have
    predicted."""
    d, n = mcfg.dim, mcfg.seq_len
    e = mcfg.moe_experts
    hidden = int(d * mcfg.mlp_ratio)
    cap = max(1, int(n / e * mcfg.moe_capacity_factor))
    router = 2.0 * n * d * e
    dispatch = 2.0 * n * e * cap * d          # btec,btd->becd (per group)
    expert_ffn = 2.0 * e * cap * d * hidden * 2  # fc1 + fc2 over (E, C, D)
    combine = 2.0 * n * e * cap * d           # btec,becd->btd
    return router + dispatch + expert_ffn + combine


def forward_flops_per_view(mcfg: ModelConfig) -> float:
    """Matmul FLOPs of one backbone+head forward on one (img_size)^2 view."""
    d, n, depth = mcfg.dim, mcfg.seq_len, mcfg.depth
    hidden = int(d * mcfg.mlp_ratio)
    patch_embed = 2.0 * mcfg.n_patches * (3 * mcfg.patch ** 2) * d
    qkv = 2.0 * n * d * (3 * d)
    attn_bmm = 2.0 * (2.0 * n * n * d)  # QK^T and AV
    proj = 2.0 * n * d * d
    mlp = 2.0 * n * d * hidden * 2  # fc1 + fc2
    head = 2.0 * (d * d + d * mcfg.out_dim)  # CLS token only
    if mcfg.moe_experts > 0:
        # every moe_every-th block routes through the MoE MLP instead of the
        # dense one (models/vit.py block construction)
        n_moe = sum(1 for i in range(depth)
                    if i % mcfg.moe_every == mcfg.moe_every - 1)
        moe = moe_flops_per_view_per_block(mcfg)
        return (patch_embed
                + (depth - n_moe) * (qkv + attn_bmm + proj + mlp)
                + n_moe * (qkv + attn_bmm + proj + moe)
                + head)
    return patch_embed + depth * (qkv + attn_bmm + proj + mlp) + head


def train_flops_per_slice(mcfg: ModelConfig) -> float:
    """Model FLOPs one training slice costs: 2 views x (student fwd + bwd
    (2x fwd) + teacher fwd)."""
    return 2.0 * (3.0 + 1.0) * forward_flops_per_view(mcfg)


def mfu(slices_per_s: float, mcfg: ModelConfig,
        peak_flops: float = V5E_PEAK_FLOPS_BF16) -> float:
    """Model-FLOPs utilization in [0, 1] for a measured training rate."""
    return slices_per_s * train_flops_per_slice(mcfg) / peak_flops
