"""Mixture-of-Experts MLP with expert parallelism (Switch-style top-1).

No reference analog — the reference's model family is dense ViT only
(SURVEY.md §2.5 lists expert parallelism as "nothing to trace"). This is the
``ep`` leg of the multi-chip design (dp/tp/pp/sp/ep), built the TPU way:

* **Dense dispatch** (GShard/Switch): routing is expressed as one-hot
  einsums onto a fixed-capacity (E, C, D) buffer — no gather/scatter, no
  dynamic shapes, everything lands on the MXU and jit-compiles once.
* **Expert parallelism via GSPMD**: expert-stacked parameters (E, ...) and
  the dispatched (E, C, D) activations carry sharding constraints on an
  ``expert`` mesh axis; XLA inserts the token all-to-alls at the dispatch /
  combine boundaries. No hand-written collectives.
* **Load-balance auxiliary loss** (Switch eq. 4): ``E * sum_e f_e * p_e``
  where f is the fraction of tokens routed to expert e and p the mean router
  probability; sown as an intermediate and added to the training loss with
  weight ``TrainConfig.moe_aux_weight``.

Capacity: routing is grouped per image (GShard groups) and each expert
processes at most ``C = ceil(N/E * capacity)`` tokens per group; overflow
tokens are dropped (their MLP output is zero — the residual stream carries
them through unchanged, the standard Switch behavior).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dinox_tpu.parallel.mesh import EXPERT_AXIS

Dtype = jnp.dtype


def _expert_sharding(mesh: Optional[Mesh], ndim: int, axis: int = 0):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * ndim
    spec[axis] = EXPERT_AXIS
    return NamedSharding(mesh, P(*spec))


def _constrain_expert(x: jnp.ndarray, mesh: Optional[Mesh], axis: int = 0):
    if mesh is None or mesh.shape.get(EXPERT_AXIS, 1) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, _expert_sharding(mesh, x.ndim, axis))


class MoeMlp(nn.Module):
    """Drop-in replacement for the dense MLP half-block body.

    Input/output (B, N, D); routing per token; expert FFN = fc1 -> GELU ->
    fc2 with expert-stacked kernels (E, D, H) / (E, H, D).
    """

    dim: int
    n_experts: int
    mlp_ratio: float = 4.0
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32
    gelu_approx: bool = True
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        B, N, D = x.shape
        E = self.n_experts
        hidden = int(self.dim * self.mlp_ratio)
        # GShard grouping: route WITHIN each image's N tokens (group = image)
        # so the dispatch/combine einsums cost B*N*E*C*D with the per-group
        # capacity C = ceil(N/E * factor) — without grouping C grows with the
        # global token count and the dispatch einsum dwarfs the expert FLOPs
        # (measured 128 vs 885 slices/s on ViT-S bs96). Groups ride the data
        # axis; experts the expert axis.
        cap = max(1, int(N / E * self.capacity_factor))

        # Router in f32 (tiny, numerically sensitive).
        logits = nn.Dense(
            E, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.truncated_normal(0.02), name="router",
        )(x.astype(jnp.float32))                           # (B, N, E)
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)                # (B, N)
        gate = jnp.take_along_axis(probs, expert[..., None], axis=-1)[..., 0]

        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (B, N, E)
        # Switch load-balance aux over ALL tokens:
        # E * sum_e fraction_e * mean_prob_e.
        aux = E * jnp.sum(jnp.mean(onehot, axis=(0, 1)) * jnp.mean(probs, axis=(0, 1)))
        self.sow("intermediates", "moe_aux", aux)

        # Position of each token within its expert's per-group buffer.
        pos = jnp.einsum("bte,bte->bt", jnp.cumsum(onehot, axis=1) - 1.0, onehot)
        keep = pos < cap                                    # overflow dropped
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                dtype=jnp.float32) * keep[..., None]
        # dispatch (B, N, E, C): 1 where group-b token t fills slot (e, c)
        dispatch = onehot[..., None] * pos_oh[:, :, None, :]
        xe = jnp.einsum("btec,btd->becd", dispatch.astype(self.dtype),
                        x.astype(self.dtype))              # (B, E, C, D)
        xe = _constrain_expert(xe, self.mesh, axis=1)

        init = nn.initializers.xavier_uniform(in_axis=1, out_axis=2, batch_axis=(0,))
        w1 = self.param("w1", init, (E, D, hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, 1, hidden), jnp.float32)
        w2 = self.param("w2", init, (E, hidden, D), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, 1, D), jnp.float32)
        h = jnp.einsum("becd,edh->bech", xe, w1.astype(self.dtype)) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=self.gelu_approx)
        ye = jnp.einsum("bech,ehd->becd", h, w2.astype(self.dtype)) + b2.astype(self.dtype)
        ye = _constrain_expert(ye, self.mesh, axis=1)

        # combine: weight each token's expert output by its gate; dropped
        # tokens receive zeros.
        combine = (dispatch * gate[..., None, None]).astype(self.dtype)
        y = jnp.einsum("btec,becd->btd", combine, ye)
        return y.astype(x.dtype)
