"""2D→3D depth lifting with anatomical priors
(reference: models/cascaded_depth_lifting.py). Used by the diffusion family.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_trilinear
from .layers import Dtype, group_norm, torch_default_init


class ResolutionDepthPriors:
    """Anatomical HU-depth bands per resolution
    (cascaded_depth_lifting.py:13-58)."""

    PRIORS: Dict[int, Dict[str, Tuple[int, int]]] = {
        64: {"anterior": (0, 16), "mid": (16, 48), "posterior": (48, 64)},
        128: {"anterior": (0, 32), "mid": (32, 96), "posterior": (96, 128)},
        256: {"anterior": (0, 64), "mid": (64, 192), "posterior": (192, 256)},
        512: {"anterior": (0, 128), "mid": (128, 384), "posterior": (384, 512)},
        604: {"anterior": (0, 151), "mid": (151, 453), "posterior": (453, 604)},
    }

    @staticmethod
    def get_priors(depth_size: int) -> Dict[str, Tuple[int, int]]:
        if depth_size in ResolutionDepthPriors.PRIORS:
            return ResolutionDepthPriors.PRIORS[depth_size]
        ratio = depth_size / 604.0
        return {
            "anterior": (0, int(151 * ratio)),
            "mid": (int(151 * ratio), int(453 * ratio)),
            "posterior": (int(453 * ratio), depth_size),
        }


class CascadedDepthWeightNetwork(nn.Module):
    """Per-pixel softmax depth distribution modulated by a learned prior mask
    (cascaded_depth_lifting.py:61-118). Input (B, H, W, C) → (B, H, W, D)."""

    max_depth: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xray_features: jnp.ndarray) -> jnp.ndarray:
        c = xray_features.shape[-1]
        h = xray_features.astype(self.dtype)
        h = nn.Conv(c // 2, (3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
        h = group_norm(8, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(c // 4, (3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype)(h)
        h = group_norm(8, dtype=self.dtype)(h)
        h = nn.silu(h)
        depth_logits = nn.Conv(self.max_depth, (1, 1), kernel_init=torch_default_init, dtype=self.dtype)(h)

        prior_mask = nn.Conv(
            self.max_depth, (1, 1), kernel_init=torch_default_init, dtype=self.dtype, name="prior_modulation"
        )(xray_features.astype(self.dtype))
        prior_mask = nn.sigmoid(prior_mask)

        weights = nn.softmax(depth_logits.astype(jnp.float32), axis=-1) * prior_mask.astype(jnp.float32)
        weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-8)
        return weights.astype(self.dtype)  # (B, H, W, D)


class CascadedDepthLifting(nn.Module):
    """Lift 2D X-ray features to a 3D volume via depth distributions, fusing a
    previous-stage volume by concat + Conv3d when cascading
    (cascaded_depth_lifting.py:121-218).

    __call__(xray_features (B, H, W, C), target_depth, prev (B, D', H', W', C))
    → (B, D, H, W, C) channels-last."""

    feature_dim: int = 512
    depth_sizes: Sequence[int] = (64, 128, 256)
    use_prev_stage: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xray_features: jnp.ndarray,
        target_depth: int,
        prev_stage_volume: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, H, W, C = xray_features.shape
        weights = CascadedDepthWeightNetwork(
            max_depth=target_depth, dtype=self.dtype, name=f"depth_{target_depth}"
        )(xray_features)  # (B, H, W, D)

        # (B, H, W, 1, C) * (B, H, W, D, 1) → (B, H, W, D, C) → (B, D, H, W, C)
        vol = xray_features[:, :, :, None, :] * weights[..., None]
        vol = jnp.moveaxis(vol, 3, 1)

        if prev_stage_volume is not None and self.use_prev_stage and target_depth > min(self.depth_sizes):
            prev = jnp.moveaxis(prev_stage_volume, -1, 1)  # (B, C, D', H', W')
            prev = resize_trilinear(prev, (target_depth, H, W), align_corners=True)
            prev = jnp.moveaxis(prev, 1, -1)
            h = jnp.concatenate([vol, prev.astype(vol.dtype)], axis=-1)
            h = nn.Conv(
                self.feature_dim, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype,
                name=f"fusion_{target_depth}_a",
            )(h)
            h = group_norm(8, dtype=self.dtype)(h)
            h = nn.silu(h)
            vol = nn.Conv(
                self.feature_dim, (3, 3, 3), padding=1, kernel_init=torch_default_init, dtype=self.dtype,
                name=f"fusion_{target_depth}_b",
            )(h)
        return vol
