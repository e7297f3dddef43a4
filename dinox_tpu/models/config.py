"""Model configuration and presets.

Capability parity with the reference's ``ModelConfig`` / ``MODEL_CONFIGS``
(reference: scripts/phase5_big_run.py:153-221) and the hub's ``DEFAULT_CONFIG``
(reference: zoo/hub.py:31-41), re-expressed for a JAX/TPU build: the config also
carries the compute dtype policy and the attention-kernel implementation choice
(the TPU analog of the reference's ``--sdp-backend`` flag,
scripts/phase5_big_run.py:1081-1101).
"""

from __future__ import annotations

import dataclasses
import warnings
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a PatchViT backbone + DINO head."""

    name: str = "vit-small"
    img_size: int = 224
    patch: int = 14
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0
    out_dim: int = 8192
    num_registers: int = 4
    scale_aware: bool = False
    use_grad_checkpoint: bool = False
    # TPU-specific knobs (no reference analog / analog noted):
    attn_impl: str = "pallas"  # "pallas" | "xla"  (analog of --sdp-backend)
    # Fused LN->fc1->GELU->fc2->residual Pallas kernel for the MLP half-block
    # (ops/fused_mlp.py). Identical params/checkpoints; ignored when LoRA is
    # active (adapters need the unfused Dense path).
    fused_mlp: bool = False
    # Fused LN->QKV->attention->proj->residual half-block Pallas kernel
    # (ops/fused_attn_block.py). Identical params/checkpoints; ignored with
    # LoRA, non-pallas attn_impl, or a multi-device mesh (TP shard_map path).
    fused_attn: bool = False
    # Megatron sequence parallelism (only meaningful with tensor parallelism,
    # i.e. a mesh with model>1): constrain the token axis onto the `model`
    # axis in the LN/residual regions so GSPMD lowers the attention/MLP
    # boundary all-reduces to reduce-scatter + all-gather and runs the
    # elementwise math 1/tp-sharded. Pure sharding annotation — identical
    # math and checkpoints; no-op off-mesh.
    sequence_parallel: bool = False
    # Mixture-of-Experts MLP (models/moe.py; no reference analog — the
    # reference family is dense-only). moe_experts > 0 replaces the dense
    # MLP with a Switch-style top-1 MoE in every `moe_every`-th block
    # (Switch convention: the later block of each pair). Expert parallelism
    # = an `expert` mesh axis (make_mesh(expert_parallel=...)); GSPMD
    # inserts the dispatch/combine all-to-alls.
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.25
    # MLP nonlinearity. Natively-trained models default to the tanh-approximate
    # GELU (flax's own default; quality-validated against the exact arm on the
    # two-organ MVP anchor — docs/EXPERIMENTS.md `mvp_gelu_tanh`, +23% step
    # speed). Reference-imported checkpoints auto-select the exact erf (torch
    # nn.GELU) via zoo/hub._cfg_from_dict, so torch parity is preserved
    # per-model. The field travels with every checkpoint's config.json.
    gelu_approx: bool = True
    # ScaleEmbedding LayerNorm gamma init (calibration knob): the trailing LN
    # pins the scale token's norm at sqrt(dim)*rms(gamma) as soon as fc2
    # leaves zero-init, regardless of the raw signal size — at gamma=1 that is
    # ~3x the patch-token norm and the spacing counterfactual magnitude tracks
    # the mix ratio (docs/round4/*_scale_diag.json). Initializing gamma small
    # starts the spacing pathway at a proportionate share of the residual
    # stream; weight decay (applied to all params, reference parity —
    # reference scripts/phase5_big_run.py:1621 uses ungrouped AdamW) keeps it
    # there unless the loss actively grows it. 1.0 = flax default, bit-exact
    # with all previous checkpoints.
    scale_gamma_init: float = 1.0
    dtype: str = "bfloat16"  # compute dtype; params always float32
    # LoRA (first-class; reference wraps HF peft instead — zoo/peft.py)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    lora_targets: tuple = ("qkv", "proj", "fc1", "fc2")

    def __post_init__(self) -> None:
        if self.dim % self.heads != 0:
            raise ValueError(f"dim ({self.dim}) must be divisible by heads ({self.heads})")
        if self.patch not in (8, 14, 16):
            warnings.warn(f"Unusual patch size: {self.patch}")
        if self.img_size % self.patch != 0:
            raise ValueError(f"img_size ({self.img_size}) must be divisible by patch ({self.patch})")

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch) ** 2

    @property
    def seq_len(self) -> int:
        """Total token count: CLS + patches + registers."""
        return 1 + self.n_patches + self.num_registers

    @property
    def params_millions(self) -> float:
        """Rough parameter estimate, matching the reference formula
        (scripts/phase5_big_run.py:171-181)."""
        patch_embed = 3 * self.patch * self.patch * self.dim
        transformer = self.depth * (4 * self.dim * self.dim + 8 * self.dim * self.dim * self.mlp_ratio)
        head = self.dim * self.out_dim * 2
        return (patch_embed + transformer + head) / 1e6

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# Preset table mirrors reference scripts/phase5_big_run.py:184-221.
MODEL_CONFIGS: dict[str, ModelConfig] = {
    "vit-tiny": ModelConfig(name="vit-tiny", patch=14, dim=192, depth=12, heads=3, out_dim=4096),
    "vit-small": ModelConfig(name="vit-small", patch=14, dim=384, depth=12, heads=6, out_dim=8192),
    "vit-large": ModelConfig(name="vit-large", patch=14, dim=1024, depth=24, heads=16, out_dim=8192),
    "vit-giant": ModelConfig(name="vit-giant", patch=14, dim=1408, depth=40, heads=16, out_dim=8192),
}

# The hub default used when a checkpoint carries no config
# (reference: zoo/hub.py:31-41 — note patch=16, depth=6 there).
HUB_DEFAULT_CONFIG: dict[str, Any] = {
    "img_size": 224,
    "patch": 16,
    "dim": 384,
    "depth": 6,
    "heads": 6,
    "mlp_ratio": 4.0,
    "num_registers": 4,
    "scale_aware": False,
    "out_dim": 8192,
    # Checkpoints with no config are reference-format (torch) exports: keep
    # the exact erf GELU so imported models stay bit-compatible with torch.
    "gelu_approx": False,
}
