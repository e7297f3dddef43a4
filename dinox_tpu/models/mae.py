"""Masked-autoencoder alternative objective (``--loss-type mae``).

Functional parity with the reference MAE implementation
(scripts/phase5_big_run.py:816-1023): 75% random patch masking, the PatchViT
as encoder over visible patches + CLS, a lightweight decoder (dim 512, depth
8, heads 16) with fixed 2-D sin-cos positional embeddings and a learned mask
token, per-patch-pixel MSE on masked patches only.

JAX re-design: masking uses counter-based PRNG keys (argsort of uniform
noise, identical scheme), gathers are batched take_along_axis, and the fixed
decoder positional table is a compile-time constant instead of a frozen
parameter.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dinox_tpu.models.config import ModelConfig
from dinox_tpu.models.vit import Dtype, PatchViT, TransformerBlock, xavier_uniform


def sincos_2d(embed_dim: int, grid_size: int, cls_token: bool = True) -> np.ndarray:
    """Fixed 2-D sin-cos table, (1, grid^2 [+1], embed_dim); the classic MAE
    construction (reference :906-941)."""
    assert embed_dim % 4 == 0

    def one_dim(dim: int, pos: np.ndarray) -> np.ndarray:
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float32) / (dim / 2))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw, gh = np.meshgrid(
        np.arange(grid_size, dtype=np.float32), np.arange(grid_size, dtype=np.float32)
    )
    emb = np.concatenate([one_dim(embed_dim // 2, gh), one_dim(embed_dim // 2, gw)], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim), np.float32), emb], axis=0)
    return emb[None]


def patchify(imgs: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC images -> (B, L, patch*patch*3) with (p, q, c) pixel ordering
    (matches the reference's 'nhwpqc' patchify, :938-949)."""
    b, hh, ww, c = imgs.shape
    h, w = hh // patch, ww // patch
    x = imgs.reshape(b, h, patch, w, patch, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * w, patch * patch * c)


def random_masking(
    x: jnp.ndarray, mask_ratio: float, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample random keep-subset. Returns (x_visible, mask, ids_restore);
    mask is 1 on removed patches (reference :976-999)."""
    b, length, d = x.shape
    len_keep = int(length * (1.0 - mask_ratio))
    noise = jax.random.uniform(key, (b, length))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_vis = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((b, length), x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_vis, mask, ids_restore


class MaeDecoder(nn.Module):
    embed_dim: int
    patch: int
    num_patches: int
    decoder_dim: int = 512
    decoder_depth: int = 8
    decoder_heads: int = 16
    mlp_ratio: float = 4.0
    attn_impl: str = "xla"
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, latent: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        b = latent.shape[0]
        x = nn.Dense(
            self.decoder_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="decoder_embed",
        )(latent)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_dim), jnp.float32
        ).astype(self.dtype)
        n_masked = ids_restore.shape[1] + 1 - x.shape[1]
        body = jnp.concatenate(
            [x[:, 1:], jnp.broadcast_to(mask_token, (b, n_masked, self.decoder_dim))], axis=1
        )
        body = jnp.take_along_axis(body, ids_restore[:, :, None], axis=1)  # unshuffle
        x = jnp.concatenate([x[:, :1], body], axis=1)

        grid = int(self.num_patches ** 0.5)
        pos = jnp.asarray(sincos_2d(self.decoder_dim, grid, cls_token=True), self.dtype)
        x = x + pos

        for i in range(self.decoder_depth):
            x = TransformerBlock(
                self.decoder_dim, self.decoder_heads, self.mlp_ratio,
                attn_impl=self.attn_impl, dtype=self.dtype, mesh=self.mesh,
                name=f"blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="decoder_norm")(x.astype(jnp.float32))
        x = nn.Dense(
            self.patch * self.patch * 3, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="decoder_pred",
        )(x)
        return x[:, 1:]  # drop CLS


class MaeModel(nn.Module):
    """Encoder (PatchViT internals re-used on visible tokens) + MaeDecoder."""

    cfg: ModelConfig
    decoder_dim: int = 512
    mask_ratio: float = 0.75
    mesh: Optional[Mesh] = None

    def setup(self) -> None:
        self.encoder = PatchViT(self.cfg, mesh=self.mesh, name="encoder")
        self.decoder = MaeDecoder(
            self.cfg.dim, self.cfg.patch, self.cfg.n_patches,
            decoder_dim=self.decoder_dim, attn_impl=self.cfg.attn_impl,
            dtype=jnp.dtype(self.cfg.dtype), mesh=self.mesh, name="decoder",
        )

    def __call__(
        self, imgs: jnp.ndarray, key: jax.Array, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """imgs (B, H, W, 3) -> (pred (B, L, p*p*3), mask (B, L))."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        enc = self.encoder
        b = imgs.shape[0]

        # Patch embed + positional (pre-mask), re-using the encoder's params.
        x = enc.patch_tokens(imgs)
        pos = enc.pos_embed.astype(dtype)
        x = x + pos[:, 1:]

        x_vis, mask, ids_restore = random_masking(x, self.mask_ratio, key)

        cls = (enc.cls_token.astype(dtype) + pos[:, :1])
        x_vis = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.dim)), x_vis], axis=1)
        x_vis = enc.run_blocks(x_vis, train=train)
        latent = enc.run_final_norm(x_vis)

        pred = self.decoder(latent.astype(dtype), ids_restore)
        return pred, mask


def mae_loss(pred: jnp.ndarray, imgs: jnp.ndarray, mask: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Per-patch MSE averaged over masked patches only (reference :951-965)."""
    target = patchify(imgs.astype(jnp.float32), patch)
    per_patch = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=-1)
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def init_mae(cfg: ModelConfig, rng: jax.Array, batch: int = 2) -> dict:
    model = MaeModel(cfg)
    x = jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
    return model.init(rng, x, jax.random.key(0))["params"]
