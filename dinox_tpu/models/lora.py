"""LoRA-capable Dense layer.

LoRA is first-class in the architecture (SURVEY.md §7: "LoRA as a pytree of
A/B factors targeting qkv/proj/fc1/fc2") rather than a wrapper library: when
``rank > 0`` the layer owns ``lora_A`` (in, r) and ``lora_B`` (r, out)
parameters alongside its frozen ``kernel``/``bias`` and computes

    y = x @ W + b + (alpha / r) * dropout(x) @ A @ B

matching HF peft's LoRA math (B zero-init so a fresh adapter is a no-op;
A kaiming-uniform as in peft). The on-disk peft adapter format conversion
lives in dinox_tpu.zoo.peft.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_uniform_(a=sqrt(5)) on a (r, in) weight == uniform with
# bound sqrt(1/fan_in); in flax: variance_scaling(1/3, fan_in, uniform).
lora_a_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class LoraDense(nn.Module):
    features: int
    rank: int = 0
    alpha: float = 16.0
    dropout: float = 0.0
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        y = x @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        if self.rank > 0:
            a = self.param("lora_A", lora_a_init, (in_features, self.rank), jnp.float32)
            b = self.param("lora_B", nn.initializers.zeros, (self.rank, self.features), jnp.float32)
            h = x
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            scale = self.alpha / self.rank
            y = y + scale * (h @ a.astype(self.dtype)) @ b.astype(self.dtype)
        return y
