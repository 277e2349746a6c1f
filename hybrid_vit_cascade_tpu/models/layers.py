"""Shared building-block layers (reference: models/vit_components.py).

All modules take a `dtype` (compute dtype, bf16 in production) with fp32
parameters; norms and softmax statistics stay fp32.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.Linear/ConvNd default init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Keeping the same scale preserves the
# reference's training dynamics.
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.GELU default (erf form, not tanh approximation). Half
    precision uses the polynomial-erf fast path (ops/activations.py —
    1-bf16-ulp-identical, runs at the HBM floor instead of VPU-bound)."""
    from ..ops.activations import gelu_erf

    return gelu_erf(x)


class FastDropout(nn.Module):
    """nn.Dropout with the mask bits drawn from the TPU hardware generator.

    flax's nn.Dropout generates bits with threefry2x32 — pure VPU work that
    costs ~22 ms/step on the stage-3 ViT (measured, scripts/
    probe_vit_dropout.py: the MLP's 33M-element hidden mask × depth 8).
    Re-wrapping each site's already-folded threefry key as an 'unsafe_rbg'
    key routes bit generation to the TPU's RngBitGenerator instruction.
    The distribution is identical (Bernoulli(rate), inverted scaling —
    torch nn.Dropout semantics, vit_components.py:48); only the
    pseudorandom stream differs, and no parity contract exists on the bits
    (the reference uses torch's global RNG stream). Keys stay reproducible:
    same seed → same folded key → same mask."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        data = jax.random.key_data(rng).reshape(-1)[:2]  # (2,) uint32
        k = jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl="unsafe_rbg")
        keep_prob = 1.0 - self.rate
        keep = jax.random.bernoulli(k, keep_prob, x.shape)
        return jnp.where(keep, x / jnp.asarray(keep_prob, x.dtype),
                         jnp.zeros((), x.dtype))


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
        x = FastDropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.out_dim, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = FastDropout(self.dropout)(x, deterministic=not train)
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
