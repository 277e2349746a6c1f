"""X-ray CNN encoders (three reference variants).

  * XrayConditioningModule — BN/ReLU/MaxPool stem, multi-view averaged in the
    batch dimension, global context + time conditioning
    (models/diagnostic_losses.py:68-138).
  * MultiScaleXrayEncoder — per-stage feature-pyramid branches
    (model_progressive.py:16-83).
  * SimpleXrayEncoder — views-as-channels GN/GELU stem for the H200 CNN family
    (model_direct128_h200.py:19-42).
  * XRayEncoderB200 — 128-channel GN/ReLU stem (model_direct256_b200.py:68-90).

All operate channels-last; xray input is the reference layout (B, V, 1, H, W).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pool import max_pool_nd
from .layers import Dtype, gelu_exact, group_norm, torch_default_init


def xrays_to_nhwc(xrays: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 1, H, W) → (B, V, H, W, 1)."""
    return jnp.moveaxis(xrays, 2, -1)


def _gn(groups: int, channels: int) -> int:
    """Largest valid group count ≤ `groups` (reference hardcodes counts for
    the 512-wide config; scaled-down test configs need divisibility)."""
    g = min(groups, channels)
    while channels % g != 0:
        g -= 1
    return g


class XrayConditioningModule(nn.Module):
    """2D CNN conditioning encoder with BatchNorm (diagnostic_losses.py:68-138).

    Returns (xray_context (B, cond_dim), time_xray_cond (B, cond_dim),
    features_2d (B, H/8, W/8, embed_dim))."""

    embed_dim: int = 256
    num_views: int = 1
    time_embed_dim: int = 256
    cond_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, t_embed: jnp.ndarray, train: bool = False):
        B, V = xrays.shape[0], xrays.shape[1]
        x = xrays_to_nhwc(xrays).astype(self.dtype)
        x = x.reshape(B * V, *x.shape[2:])  # views folded into batch (:123)

        def bn():
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        x = nn.Conv(64, (7, 7), strides=2, padding=3, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = nn.relu(bn()(x))
        x = max_pool_nd(x, 3, spatial_axes=(-3, -2), stride=2, padding=1)
        x = nn.Conv(128, (3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = nn.relu(bn()(x))
        x = max_pool_nd(x, 2, spatial_axes=(-3, -2), stride=2)
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(x)
        x = nn.relu(bn()(x))

        features = x.reshape(B, V, *x.shape[1:]).mean(axis=1)  # average views (:126)

        xray_context = features.mean(axis=(1, 2))  # GAP over H', W'
        xray_context = nn.Dense(self.cond_dim, kernel_init=torch_default_init, dtype=self.dtype, name="to_cond")(
            xray_context
        )

        t = nn.Dense(self.time_embed_dim * 2, kernel_init=torch_default_init, dtype=self.dtype)(
            t_embed.astype(self.dtype)
        )
        t = nn.silu(t)
        t = nn.Dense(self.cond_dim, kernel_init=torch_default_init, dtype=self.dtype)(t)
        time_xray_cond = t + xray_context

        return xray_context, time_xray_cond, features


class MultiScaleXrayEncoder(nn.Module):
    """Shared encoder + per-stage conv-downsample branches
    (model_progressive.py:16-83). Stage 1 gets ÷4 features, stage 2 ÷2,
    stage 3 the full encoder map."""

    base_dim: int = 512
    num_views: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, stage: int = 1, train: bool = False):
        B = xrays.shape[0]
        dummy_t = jnp.zeros((B, 256), self.dtype)
        xray_context, time_xray_cond, feats = XrayConditioningModule(
            embed_dim=self.base_dim,
            num_views=self.num_views,
            time_embed_dim=256,
            cond_dim=1024,
            dtype=self.dtype,
            name="xray_encoder",
        )(xrays, dummy_t, train=train)

        def down_block(h, name):
            h = nn.Conv(
                self.base_dim, (3, 3), strides=2, padding=1, kernel_init=torch_default_init,
                dtype=self.dtype, name=f"{name}_conv",
            )(h)
            h = group_norm(32, dtype=self.dtype)(h)
            return gelu_exact(h)

        if stage == 1:
            feats = down_block(feats, "to_stage1_a")
            feats = down_block(feats, "to_stage1_b")
        elif stage == 2:
            feats = down_block(feats, "to_stage2")
        return feats, time_xray_cond, xray_context


class SimpleXrayEncoder(nn.Module):
    """Bi-planar views as 2 input channels → feature_dim at ÷16 spatial
    (model_direct128_h200.py:19-42)."""

    feature_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.moveaxis(xrays[:, :, 0], 1, -1).astype(self.dtype)  # (B, H, W, V)
        plan = [(64, 7, 2, 3, 16), (128, 3, 2, 1, 32), (256, 3, 2, 1, 64), (self.feature_dim, 3, 2, 1, 64)]
        for ch, k, s, p, g in plan:
            x = nn.Conv(ch, (k, k), strides=s, padding=p, kernel_init=torch_default_init, dtype=self.dtype)(x)
            x = group_norm(_gn(g, ch), dtype=self.dtype)(x)
            x = gelu_exact(x)
        return x  # (B, H/16, W/16, feature_dim)


class XRayEncoderB200(nn.Module):
    """Memory-squeezed 128-channel encoder (model_direct256_b200.py:68-90)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.moveaxis(xrays[:, :, 0], 1, -1).astype(self.dtype)  # (B, H, W, 2)
        plan = [(32, 7, 2, 3, 8), (64, 3, 2, 1, 8), (96, 3, 2, 1, 16), (128, 3, 2, 1, 16)]
        for ch, k, s, p, g in plan:
            x = nn.Conv(ch, (k, k), strides=s, padding=p, kernel_init=torch_default_init, dtype=self.dtype)(x)
            x = group_norm(g, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x  # (B, H/16, W/16, 128)
