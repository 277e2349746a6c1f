"""Shared building-block layers (reference: models/vit_components.py).

All modules take a `dtype` (compute dtype, bf16 in production) with fp32
parameters; norms and softmax statistics stay fp32.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torch nn.Linear/ConvNd default init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Keeping the same scale preserves the
# reference's training dynamics.
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.GELU default (erf form, not tanh approximation)."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer MLP: Dense → GELU → Dropout → Dense → Dropout
    (reference: hybrid_vit_backbone.py:75-81)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class AdaLNModulation(nn.Module):
    """cond → 6 modulation tensors (shift/scale/gate for self-attn and MLP),
    zero-initialized so blocks start as identity
    (reference: vit_components.py:122-149)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray):
        params = nn.Dense(
            self.embed_dim * 6,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(cond)
        params = params[:, None, :]  # (B, 1, 6E) — broadcast over tokens
        return jnp.split(params, 6, axis=-1)


class SinusoidalTimeEmbedding(nn.Module):
    """Standard diffusion timestep embedding (vit_components.py:152-174)."""

    embed_dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.embed_dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def layer_norm(dtype: Dtype = jnp.float32) -> nn.LayerNorm:
    """torch nn.LayerNorm semantics (eps 1e-5, affine)."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype)


def group_norm(num_groups: int, dtype: Dtype = jnp.float32) -> nn.GroupNorm:
    """torch nn.GroupNorm semantics (eps 1e-5). Channels-last input."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, dtype=dtype)
