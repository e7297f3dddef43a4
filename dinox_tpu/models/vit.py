"""PatchViT with ScaleEmbedding — the canonical dinox_tpu architecture (flax).

Functionally equivalent to the reference architecture (reference: zoo/arch.py),
re-designed TPU-first:

* NHWC image layout (TPU conv-friendly); patch embedding is a strided Conv.
* Compute in bfloat16 on the MXU, parameters in float32.
* Attention dispatches to a fused Pallas flash-attention kernel on TPU
  (``attn_impl="pallas"``) with an XLA fallback (``attn_impl="xla"``) — the
  analog of the reference's SDPA backend selector (zoo/arch.py:51,
  scripts/phase5_big_run.py:1081-1101).
* Per-block rematerialization via ``flax.linen.remat`` replaces
  ``torch.utils.checkpoint`` (zoo/arch.py:231-235).

Semantics preserved exactly for checkpoint compatibility:

* timm-style naming (qkv/proj/fc1/fc2) so LoRA target-module matching and the
  torch<->JAX key bijection are deterministic (zoo/arch.py:6-8).
* Token order [CLS, patches..., registers]; positional embedding covers
  CLS+patches only; ScaleEmbedding is added to CLS+patch tokens *before*
  registers are appended (zoo/arch.py:214-229).
* ScaleEmbedding: 3 -> max(dim//4, 16) -> GELU -> dim -> LayerNorm, with the
  output Dense **zero-initialized** so a fresh ScaleEmbedding is a no-op
  (zoo/arch.py:119-130).
* Exact (erf) GELU everywhere, matching torch's nn.GELU default.
* LayerNorm eps 1e-5 (torch default).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.lora import LoraDense
from dinox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Dtype = jnp.dtype


def _is_multidevice(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and any(s > 1 for s in mesh.shape.values())


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU() is the exact erf formulation.
    return nn.gelu(x, approximate=False)


xavier_uniform = nn.initializers.xavier_uniform()
trunc02 = nn.initializers.truncated_normal(stddev=0.02)
trunc01 = nn.initializers.truncated_normal(stddev=0.1)


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Scaled dot-product attention in plain XLA.

    q, k, v: (B, H, N, D). Softmax is computed in float32 for stability
    (matches the numerically safe forms the reference needed on bf16,
    scripts/phase5_big_run.py:1843-1850); output is cast back to q.dtype.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """Attention dispatch: Pallas fused kernel on TPU, XLA elsewhere."""
    if impl == "pallas" and jax.default_backend() not in ("cpu",):
        from dinox_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    return sdpa_xla(q, k, v)


class Attention(nn.Module):
    """Multi-head self-attention with explicit fused QKV projection.

    Layers named ``qkv`` / ``proj`` for LoRA targeting and for the torch key
    bijection (reference: zoo/arch.py:28-54). LoRA factors live inside the
    LoraDense layers when enabled.
    """

    dim: int
    num_heads: int
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    lora: tuple = ()  # (rank, alpha, dropout, targets) or empty
    mesh: Optional[Mesh] = None  # multi-device: shard_map the Pallas kernel

    def _lora_for(self, name: str) -> dict:
        if not self.lora or name not in self.lora[3]:
            return {}
        return {"rank": self.lora[0], "alpha": self.lora[1], "dropout": self.lora[2]}

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = LoraDense(
            3 * self.dim, dtype=self.dtype,
            kernel_init=xavier_uniform, name="qkv", **self._lora_for("qkv"),
        )(x, deterministic=not train)
        if self.attn_impl == "pallas" and _is_multidevice(self.mesh):
            # Multi-device: a bare pallas_call is opaque to GSPMD (it would
            # all-gather and replicate), so the kernel is shard_map-ed —
            # batch over `data`, heads over `model`. Runs on the CPU mesh too
            # (interpret mode) so the TP path is testable without chips.
            from dinox_tpu.ops.flash_attention import flash_attention_packed_sharded

            out = flash_attention_packed_sharded(qkv, self.num_heads, self.mesh)
        elif self.attn_impl == "pallas" and jax.default_backend() != "cpu":
            # Layout-native path: the kernel consumes the fused-QKV output and
            # emits the out-projection input directly — no (B,H,N,D) HBM
            # transposes (a round-2 trace showed them costing 22 GB/step).
            from dinox_tpu.ops.flash_attention import flash_attention_packed

            out = flash_attention_packed(qkv, self.num_heads)
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
            q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
            out = sdpa(q, k, v, impl=self.attn_impl)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
        return LoraDense(
            self.dim, dtype=self.dtype,
            kernel_init=xavier_uniform, name="proj", **self._lora_for("proj"),
        )(out, deterministic=not train)


class Mlp(nn.Module):
    """Two-layer MLP; fc1/fc2 naming (reference: zoo/arch.py:62-76).

    ``gelu_approx`` selects tanh vs exact-erf GELU. Native models default to
    tanh (quality-validated; the exact erf is transcendental-heavy VPU work
    fused into the fc1 dot, see docs/PROFILING.md); reference-imported
    checkpoints run exact for torch parity (see ModelConfig.gelu_approx)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    lora: tuple = ()
    gelu_approx: bool = False

    def _lora_for(self, name: str) -> dict:
        if not self.lora or name not in self.lora[3]:
            return {}
        return {"rank": self.lora[0], "alpha": self.lora[1], "dropout": self.lora[2]}

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        hidden = int(self.dim * self.mlp_ratio)
        x = LoraDense(
            hidden, dtype=self.dtype,
            kernel_init=xavier_uniform, name="fc1", **self._lora_for("fc1"),
        )(x, deterministic=not train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        return LoraDense(
            self.dim, dtype=self.dtype,
            kernel_init=xavier_uniform, name="fc2", **self._lora_for("fc2"),
        )(x, deterministic=not train)


class _LnParams(nn.Module):
    """Declares LayerNorm params (scale/bias) at the SAME paths and inits as
    nn.LayerNorm, without computing — the fused-kernel path consumes them
    directly, so checkpoints are identical either way."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32),
        )


class _DenseParams(nn.Module):
    """LoraDense's kernel/bias params (same paths, same inits), no compute."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", xavier_uniform, (self.in_features, self.features),
                       jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, self.hidden, name="fc1")(),
            _DenseParams(self.hidden, self.dim, name="fc2")(),
        )


class _AttnParams(nn.Module):
    """qkv/proj params at the standard checkpoint paths, no compute (the
    fused half-block kernel consumes them directly)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, 3 * self.dim, name="qkv")(),
            _DenseParams(self.dim, self.dim, name="proj")(),
        )


class TransformerBlock(nn.Module):
    """Pre-norm transformer block (reference: zoo/arch.py:84-97)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    lora: tuple = ()
    fused_mlp: bool = False
    fused_attn: bool = False
    gelu_approx: bool = False
    sequence_parallel: bool = False
    moe_experts: int = 0  # >0: Switch-style MoE MLP in this block (models/moe.py)
    moe_capacity_factor: float = 1.25
    mesh: Optional[Mesh] = None

    def _sp(self, x: jnp.ndarray) -> jnp.ndarray:
        """Megatron sequence parallelism: in tensor-parallel mode the
        LN/residual regions are elementwise over tokens, so the token axis is
        constrained onto the `model` axis there. GSPMD then materializes the
        attention/MLP boundary collectives as reduce-scatter + all-gather
        instead of all-reduce and runs the LN/residual math 1/tp-sharded —
        same math, less replicated activation memory and elementwise time.
        A constraint only; no-op off-mesh."""
        if not (self.sequence_parallel and _is_multidevice(self.mesh)
                and self.mesh.shape.get(MODEL_AXIS, 1) > 1):
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(DATA_AXIS, MODEL_AXIS, None)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ln = partial(nn.LayerNorm, epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        x = self._sp(x)
        # Fused half-block kernel: LN1 -> QKV -> attention -> proj -> +res in
        # one VMEM-resident pass (ops/fused_attn_block.py). Same params /
        # checkpoint paths; excluded under LoRA (adapters need the Dense
        # path) and under a real mesh (the shard_map TP path applies).
        if (self.fused_attn and not self.lora and self.attn_impl == "pallas"
                and not _is_multidevice(self.mesh)):
            from dinox_tpu.ops.fused_attn_block import fused_attn_block

            g, b = _LnParams(self.dim, name="norm1")()
            (wqkv, bqkv), (wproj, bproj) = _AttnParams(self.dim, name="attn")()
            x = fused_attn_block(
                x.astype(self.dtype), g, b, wqkv, bqkv, wproj, bproj, self.heads
            )
        else:
            x = self._sp(x + Attention(
                self.dim, self.heads, attn_impl=self.attn_impl, dtype=self.dtype,
                lora=self.lora, mesh=self.mesh, name="attn",
            )(ln(name="norm1")(x), train=train))
        if self.moe_experts > 0:
            from dinox_tpu.models.moe import MoeMlp

            x = x + MoeMlp(
                self.dim, self.moe_experts, self.mlp_ratio,
                capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
                gelu_approx=self.gelu_approx, mesh=self.mesh, name="moe",
            )(ln(name="norm2")(x), train=train)
            return self._sp(x)
        # fused_mlp_block hard-wires the exact erf GELU; route tanh-GELU
        # configs to the unfused path (like the LoRA exclusion) rather than
        # silently computing a different nonlinearity than configured.
        if self.fused_mlp and not self.lora and not self.gelu_approx:
            from dinox_tpu.ops.fused_mlp import fused_mlp_block

            g, b = _LnParams(self.dim, name="norm2")()
            (w1, b1), (w2, b2) = _MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp"
            )()
            return fused_mlp_block(x, g, b, w1, b1, w2, b2)
        x = x + Mlp(self.dim, self.mlp_ratio, dtype=self.dtype, lora=self.lora,
                    gelu_approx=self.gelu_approx, name="mlp")(
            ln(name="norm2")(x), train=train
        )
        return self._sp(x)


class ScaleEmbedding(nn.Module):
    """Physical spacing (sx, sy, slice_thickness in mm) -> (B, 1, dim).

    Zero-initialized output Dense: fresh module produces exactly zeros, so
    scale awareness can be added to an existing checkpoint without perturbing
    it (reference: zoo/arch.py:105-140).
    """

    dim: int
    dtype: Dtype = jnp.float32
    gamma_init: float = 1.0  # LN scale init (see ModelConfig.scale_gamma_init)

    @nn.compact
    def __call__(self, spacing: jnp.ndarray) -> jnp.ndarray:
        hidden = max(self.dim // 4, 16)
        x = nn.Dense(
            hidden, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="fc1",
        )(spacing.astype(self.dtype))
        x = _gelu(x)
        x = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name="fc2",
        )(x)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            scale_init=nn.initializers.constant(self.gamma_init), name="norm",
        )(x)
        return x[:, None, :]


class PatchViT(nn.Module):
    """Patch ViT with optional ScaleEmbedding (reference: zoo/arch.py:148-238).

    Input: NHWC float images (B, H, W, 3). Returns all tokens (B, N, dim) in
    float32 after the final LayerNorm; token order [CLS, patches, registers].
    """

    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    def setup(self) -> None:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self._dtype = dtype
        # Strided conv patch embedding == unfold+matmul; XLA maps it to the MXU.
        self.patch_embed = nn.Conv(
            cfg.dim,
            kernel_size=(cfg.patch, cfg.patch),
            strides=(cfg.patch, cfg.patch),
            padding="VALID",
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc02,
        )
        self.cls_token = self.param("cls_token", trunc02, (1, 1, cfg.dim), jnp.float32)
        self.pos_embed = self.param(
            "pos_embed", trunc01, (1, 1 + cfg.n_patches, cfg.dim), jnp.float32
        )
        if cfg.num_registers > 0:
            self.registers = self.param(
                "registers", trunc02, (1, cfg.num_registers, cfg.dim), jnp.float32
            )
        if cfg.scale_aware:
            self.scale_embed = ScaleEmbedding(
                cfg.dim, dtype=dtype, gamma_init=cfg.scale_gamma_init)
        lora = (
            (cfg.lora_rank, cfg.lora_alpha, cfg.lora_dropout, tuple(cfg.lora_targets))
            if cfg.lora_rank > 0
            else ()
        )
        self.blocks = [
            TransformerBlock(
                cfg.dim, cfg.heads, cfg.mlp_ratio,
                attn_impl=cfg.attn_impl, dtype=dtype, lora=lora,
                fused_mlp=cfg.fused_mlp, fused_attn=cfg.fused_attn,
                gelu_approx=cfg.gelu_approx,
                sequence_parallel=cfg.sequence_parallel,
                moe_experts=(cfg.moe_experts if cfg.moe_experts > 0
                             and i % cfg.moe_every == cfg.moe_every - 1 else 0),
                moe_capacity_factor=cfg.moe_capacity_factor,
                mesh=self.mesh,
            )
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)

    # -- reusable sub-ops (shared with the MAE wrapper) ---------------------

    def patch_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, n_patches, dim); row-major == torch flatten(2)."""
        x = self.patch_embed(x.astype(self._dtype))
        return x.reshape(x.shape[0], -1, self.cfg.dim)

    def run_blocks(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.cfg.use_grad_checkpoint and train:
            for blk in self.blocks:
                x = nn.remat(lambda m, y, t: m(y, t), prevent_cse=False, static_argnums=(2,))(
                    blk, x, train
                )
            return x
        for blk in self.blocks:
            x = blk(x, train)
        return x

    def run_final_norm(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.norm(x.astype(jnp.float32))

    def embed(
        self, x: jnp.ndarray, spacing: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Everything before the block stack: patch embed + CLS + positional
        + scale token + registers -> (B, N, dim). Split out so the pipeline-
        parallel path (parallel/pipeline.py) can run embed / blocks / finalize
        as separate program regions."""
        cfg = self.cfg
        dtype = self._dtype
        B = x.shape[0]
        x = self.patch_tokens(x)
        x = jnp.concatenate(
            [jnp.broadcast_to(self.cls_token.astype(dtype), (B, 1, cfg.dim)), x], axis=1
        )
        x = x + self.pos_embed.astype(dtype)
        if cfg.scale_aware and spacing is not None:
            x = x + self.scale_embed(spacing)
        if cfg.num_registers > 0:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(self.registers.astype(dtype), (B, cfg.num_registers, cfg.dim))],
                axis=1,
            )
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        spacing: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        x = self.embed(x, spacing)
        x = self.run_blocks(x, train=train)
        return self.run_final_norm(x)


class DinoHead(nn.Module):
    """DINO projection head: dim -> dim -> GELU -> out_dim (zoo/arch.py:249-256)."""

    dim: int
    out_dim: int = 8192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="fc1",
        )(x)
        x = _gelu(x)
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="fc2",
        )(x)
        return x.astype(jnp.float32)


class DinoStudentTeacher(nn.Module):
    """Backbone + projection head on the CLS token (reference: zoo/arch.py:246-261).

    In JAX the student and teacher are the *same* module applied to two
    parameter pytrees; the teacher tree is updated by EMA outside the module.
    """

    cfg: ModelConfig
    mesh: Optional[Mesh] = None

    def setup(self) -> None:
        self.backbone = PatchViT(self.cfg, mesh=self.mesh, name="backbone")
        self.head = DinoHead(
            self.cfg.dim, self.cfg.out_dim, dtype=jnp.dtype(self.cfg.dtype), name="head"
        )

    def __call__(
        self,
        x: jnp.ndarray,
        spacing: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        feats = self.backbone(x, spacing, train=train)
        return self.head(feats[:, 0])

    def forward_features(
        self,
        x: jnp.ndarray,
        spacing: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (head_output (B, out_dim), all_tokens (B, N, dim))."""
        feats = self.backbone(x, spacing, train=train)
        return self.head(feats[:, 0]), feats

    # Pipeline-parallel seams (parallel/pipeline.py): embed and finalize run
    # as ordinary GSPMD regions on either side of the shard_mapped block
    # rotation. Their params live in the PP state's "rest" tree.
    def embed(
        self, x: jnp.ndarray, spacing: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.backbone.embed(x, spacing)

    def finalize(self, tokens: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        feats = self.backbone.run_final_norm(tokens)
        return self.head(feats[:, 0]), feats


def init_model(
    cfg: ModelConfig, rng: jax.Array, batch: int = 2
) -> dict:
    """Initialize a DinoStudentTeacher parameter tree."""
    model = DinoStudentTeacher(cfg)
    x = jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
    spacing = jnp.ones((batch, 3), jnp.float32) if cfg.scale_aware else None
    return model.init(rng, x, spacing)["params"]


def init_backbone(cfg: ModelConfig, rng: jax.Array, batch: int = 2) -> dict:
    """Initialize a bare PatchViT parameter tree."""
    model = PatchViT(cfg)
    x = jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
    spacing = jnp.ones((batch, 3), jnp.float32) if cfg.scale_aware else None
    return model.init(rng, x, spacing)["params"]
