"""3D SSIM with the reference's exact windowed-statistics formulation.

The reference computes SSIM from six stride-1 zero-padded avg_pool3d maps
(μ_p, μ_t, E[p²], E[t²], E[pt]) with window 11 (clamped to the volume size),
C1 = 0.01², C2 = 0.03² (loss_multiscale.py:18-51, 503-525;
model_direct.py:88-107). We compute the same statistics with separable 1-D
window sums (see ops.pool.box_filter_same) in fp32 — numerically identical,
~40x less window work, and a single fused XLA elementwise epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pool import box_filter_same

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def ssim3d_map(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Per-voxel SSIM map of two (..., D, H, W) volumes (fp32)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    spatial = (-3, -2, -1)
    w = min(window_size, *[pred.shape[a] for a in spatial])
    if w % 2 == 0:  # the torch code would also shrink; reference windows are odd
        w -= 1

    mu_p = box_filter_same(pred, w, spatial)
    mu_t = box_filter_same(target, w, spatial)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t

    sigma_p = box_filter_same(pred * pred, w, spatial) - mu_pp
    sigma_t = box_filter_same(target * target, w, spatial) - mu_tt
    sigma_pt = box_filter_same(pred * target, w, spatial) - mu_pt

    return ((2.0 * mu_pt + C1) * (2.0 * sigma_pt + C2)) / (
        (mu_pp + mu_tt + C1) * (sigma_p + sigma_t + C2)
    )


def ssim3d(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM (scalar, fp32). Loss form is `1 - ssim3d(...)`."""
    return ssim3d_map(pred, target, window_size).mean()
