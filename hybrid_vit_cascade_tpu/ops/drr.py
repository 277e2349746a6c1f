"""Differentiable DRR (digitally reconstructed radiograph) projections.

Two variants exist in the reference and both are reproduced:

  * Beer–Lambert renderer (models/diagnostic_losses.py:22-65):
    attenuation = exp(-0.3 * (volume + 1)), summed along the ray axis; the
    lateral (90°) view sums over W and transposes to (B, H, D); output is
    clamped >= 1e-6.
  * Mean-intensity projection (loss_multiscale.py:249-271): plain mean along
    D (AP) or W (lateral), then bilinear resize to the X-ray resolution with
    align_corners=False.

Both are single fused exp+reduce expressions — XLA fuses them into one HBM
pass, which is already the bandwidth speed-of-light for this op.
Volumes are (..., D, H, W); leading axes are batch-like.
"""

from __future__ import annotations

import jax.numpy as jnp

from .resize import resize_bilinear

MU = 0.3  # effective attenuation coefficient for [-1, 1] normalized volumes


def drr_beer_lambert(volume: jnp.ndarray, view: str = "ap", mu: float = MU) -> jnp.ndarray:
    """Beer–Lambert DRR of a (..., D, H, W) volume.

    view='ap' sums over D giving (..., H, W); view='lateral' sums over W and
    transposes the two trailing axes giving (..., H, D).
    """
    attenuation = jnp.exp(-mu * (volume.astype(jnp.float32) + 1.0))
    if view == "lateral":
        drr = attenuation.sum(axis=-1)  # (..., D, H)
        drr = jnp.swapaxes(drr, -1, -2)  # (..., H, D)
    elif view == "ap":
        drr = attenuation.sum(axis=-3)  # (..., H, W)
    else:
        raise ValueError(f"unknown view {view!r}")
    return jnp.maximum(drr, 1e-6)


def drr_mean_projection(volume: jnp.ndarray, view: str = "ap", img_size: int | None = 512) -> jnp.ndarray:
    """Mean-intensity projection of a (..., D, H, W) volume.

    view='ap' averages over D → (..., H, W); view='lateral' averages over W
    → (..., D, H). If img_size is given, bilinearly resizes the projection to
    (img_size, img_size) with align_corners=False (matching the stage-3 DRR
    reprojection loss).
    """
    vol = volume.astype(jnp.float32)
    if view == "ap":
        drr = vol.mean(axis=-3)
    elif view == "lateral":
        drr = vol.mean(axis=-1)
    else:
        raise ValueError(f"unknown view {view!r}")
    if img_size is not None and drr.shape[-2:] != (img_size, img_size):
        drr = resize_bilinear(drr, (img_size, img_size), align_corners=False)
    return drr
