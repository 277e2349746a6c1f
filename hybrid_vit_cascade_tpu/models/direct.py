"""Direct regression model (reference: direct_regression/model_direct.py).

X-rays → shared conditioning encoder → HybridViT3D over a learnable initial
volume, cross-attending to the flattened X-ray feature map. No diffusion.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .encoders import XrayConditioningModule
from .layers import Dtype
from .vit3d import HybridViT3D


class DirectCTRegression(nn.Module):
    """xrays (B, 2, 1, 512, 512) → volume (B, 1, D, H, W)
    (model_direct.py:15-85; config: config_direct.json)."""

    volume_size: Tuple[int, int, int] = (64, 64, 64)
    voxel_dim: int = 256
    vit_depth: int = 4
    num_heads: int = 4
    xray_feature_dim: int = 512
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    store_attention: bool = False  # capture cross-attn maps for diagnostics

    @nn.compact
    def __call__(self, xrays: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = xrays.shape[0]
        D, H, W = self.volume_size

        dummy_t = jnp.zeros((B, 256), self.dtype)  # encoder expects a timestep (:69)
        _, time_xray_cond, feats = XrayConditioningModule(
            embed_dim=self.xray_feature_dim,
            num_views=2,
            time_embed_dim=256,
            cond_dim=1024,
            dtype=self.dtype,
            name="xray_encoder",
        )(xrays, dummy_t, train=train)

        initial_volume = self.param(
            "initial_volume", nn.initializers.normal(stddev=0.01), (1, D, H, W, 1), jnp.float32
        )
        x = jnp.broadcast_to(initial_volume, (B, D, H, W, 1)).astype(self.dtype)

        context = feats.reshape(B, -1, self.xray_feature_dim)  # (B, H'*W', C)
        volume = HybridViT3D(
            volume_size=self.volume_size,
            in_channels=1,
            voxel_dim=self.voxel_dim,
            depth=self.vit_depth,
            num_heads=self.num_heads,
            context_dim=self.xray_feature_dim,
            cond_dim=1024,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            store_attention=self.store_attention,
            name="vit_backbone",
        )(x, context, time_xray_cond, train=train)

        return jnp.moveaxis(volume, -1, 1)  # (B, 1, D, H, W)
