"""Self-supervised losses: DINO (center+sharpen, cross-view), Gram anchoring,
KoLeo, SimCLR/NT-Xent.

Functional JAX ports of the reference loss semantics
(scripts/phase5_big_run.py:679-813), written for global-batch correctness
under pjit: every batch reduction (center mean, KoLeo nearest-neighbor,
NT-Xent negatives) is over the *global* array, so XLA inserts the collectives
when the batch dimension is sharded over the `data` mesh axis — matching the
reference's single-device effective-batch statistics (SURVEY.md §7).

All softmax/log-softmax run in float32 with fused log-domain forms — the
numerically safe pattern the reference adopted after hitting 0 * -inf = NaN
in bf16 entropy logging (scripts/phase5_big_run.py:1843-1850).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DinoLossOut(NamedTuple):
    loss: jnp.ndarray
    new_center: jnp.ndarray
    teacher_entropy: jnp.ndarray
    student_entropy: jnp.ndarray


def dino_loss(
    student_out: jnp.ndarray,
    teacher_out: jnp.ndarray,
    center: jnp.ndarray,
    *,
    student_temp: float = 0.1,
    teacher_temp: float = 0.04,
    center_momentum: float = 0.999,
) -> DinoLossOut:
    """Cross-view DINO cross-entropy with teacher centering/sharpening.

    Inputs are the concatenated two-view head outputs ``[view1; view2]`` of
    shape (2B, K). The teacher distribution is centered by the running
    ``center`` and sharpened at ``teacher_temp``; the loss is the symmetric
    cross-view CE ``(H(t1, s2) + H(t2, s1)) / 2`` and the center is EMA-updated
    from the global teacher batch mean (reference: phase5_big_run.py:692-720).

    Returns the loss, the updated center, and both entropies (for logging).
    """
    student_out = student_out.astype(jnp.float32)
    teacher_out = jax.lax.stop_gradient(teacher_out.astype(jnp.float32))

    t_logits = (teacher_out - center) / teacher_temp
    t_logprob = jax.nn.log_softmax(t_logits, axis=-1)
    t_prob = jnp.exp(t_logprob)
    s_logprob = jax.nn.log_softmax(student_out / student_temp, axis=-1)

    b = teacher_out.shape[0] // 2
    t1, t2 = t_prob[:b], t_prob[b:]
    s1, s2 = s_logprob[:b], s_logprob[b:]
    ce_12 = -jnp.mean(jnp.sum(t1 * s2, axis=-1))
    ce_21 = -jnp.mean(jnp.sum(t2 * s1, axis=-1))
    loss = (ce_12 + ce_21) / 2.0

    batch_center = jnp.mean(teacher_out, axis=0, keepdims=True)
    new_center = center * center_momentum + batch_center * (1.0 - center_momentum)

    # Fused p*log(p) entropies (safe: p==0 contributes exactly 0).
    t_entropy = -jnp.mean(jnp.sum(t_prob * t_logprob, axis=-1))
    s_prob = jnp.exp(s_logprob)
    s_entropy = -jnp.mean(jnp.sum(s_prob * s_logprob, axis=-1))
    return DinoLossOut(loss, new_center, t_entropy, s_entropy)


def gram_matrix(tokens: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) L2-normalized token Gram matrices (B, N, N)."""
    t = tokens.astype(jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum(
        "bnd,bmd->bnm", t, t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def gram_anchoring_loss(student_feats: jnp.ndarray, teacher_feats: jnp.ndarray) -> jnp.ndarray:
    """MSE between student/teacher Gram matrices of the non-CLS tokens.

    Note: the CLS token (index 0) is excluded but register tokens (appended at
    the end) are *included* — exactly mirroring the reference's ``feats[:, 1:]``
    (phase5_big_run.py:731-739).
    """
    g_s = gram_matrix(student_feats[:, 1:])
    g_t = gram_matrix(jax.lax.stop_gradient(teacher_feats[:, 1:]))
    return jnp.mean((g_s - g_t) ** 2)


def koleo_loss(features: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Kozachenko-Leonenko entropy regularizer: -mean log(NN distance) over
    the L2-normalized feature batch (reference: phase5_big_run.py:742-773).

    Computed from the cosine Gram (d^2 = 2 - 2 cos) instead of an explicit
    cdist — one matmul on the MXU, no (B, B, D) intermediate.
    """
    x = features.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    sim = jnp.matmul(x, x.T, precision=jax.lax.Precision.HIGHEST)
    sq = jnp.clip(2.0 - 2.0 * sim, 0.0, None)
    b = x.shape[0]
    sq = sq + jnp.eye(b, dtype=sq.dtype) * 1e18  # mask self-distance
    nn_dist = jnp.sqrt(jnp.min(sq, axis=1))
    return -jnp.mean(jnp.log(nn_dist + eps))


def simclr_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """NT-Xent over the 2B-sample batch; positives are the cross-view pairs
    (reference: phase5_big_run.py:776-813)."""
    z1 = z1.astype(jnp.float32)
    z2 = z2.astype(jnp.float32)
    z1 = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-12)
    z2 = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=-1, keepdims=True), 1e-12)
    feats = jnp.concatenate([z1, z2], axis=0)
    b = z1.shape[0]
    logits = jnp.matmul(feats, feats.T, precision=jax.lax.Precision.HIGHEST) / temperature
    logits = jnp.where(jnp.eye(2 * b, dtype=bool), -9e15, logits)
    targets = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(0, b)])
    logprob = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprob, targets[:, None], axis=-1))
